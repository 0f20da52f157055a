"""Flat export sinks (S5/S6 analogues).

The reference dumps a nested envelope to JSON (main.py:125-127) and
flattens ordered sections to CSV (main.py:392-441); its Excel writers
(S7-S9) rely only on the ``ordered_items`` ordering contract. Here the
flatten is a ``flat_map``-shaped batch explode that preserves that
contract explicitly: every flat row carries (doc_id, offset) and
within a doc_id the offsets are the span order.
"""
from __future__ import annotations

import pyarrow as pa

from ..docproc import decode_item_text, decode_unmatched_text
from ..functions.labels import get_label
from ..schema import spans_column_views

FLAT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("kind", pa.string()),
    ("section", pa.string()),
    ("standard_name", pa.string()),
    ("cn_label", pa.string()),
    ("original_name", pa.string()),
    ("current_period", pa.string()),
    ("previous_period", pa.string()),
    ("note", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("statement_type", pa.string()),
    ("valid", pa.bool_()),
])

_ITEM_KINDS = {"item", "subtotal", "total"}


def flatten_batch(batch: pa.Table) -> pa.Table:
    """Explode output docs into one flat row per span."""
    doc_ids, offs, kinds, texts, refs, span_offs = spans_column_views(batch)
    valid_col = batch.column("valid").to_pylist()
    st_col = batch.column("statement_type").to_pylist()
    cols: dict[str, list] = {n: [] for n in FLAT_SCHEMA.names}
    for i in range(len(doc_ids)):
        lo, hi = int(offs[i]), int(offs[i + 1])
        st = st_col[i]
        for j in range(lo, hi):
            kind = kinds[j]
            section = standard = label = orig = cur = prev = note = ""
            text = texts[j]
            if kind in _ITEM_KINDS:
                dec = decode_item_text(text)
                if dec is not None:
                    section, standard, orig, cur, prev, note = dec
                    label = get_label(standard, st)
                    text = ""
            elif kind == "unmatched":
                dec = decode_unmatched_text(text)
                if dec is not None:
                    text, orig, cur, prev, note = dec
            cols["doc_id"].append(doc_ids[i])
            cols["offset"].append(span_offs[j])
            cols["kind"].append(kind)
            cols["section"].append(section)
            cols["standard_name"].append(standard)
            cols["cn_label"].append(label)
            cols["original_name"].append(orig)
            cols["current_period"].append(cur)
            cols["previous_period"].append(prev)
            cols["note"].append(note)
            cols["text"].append(text)
            cols["media_ref"].append(refs[j])
            cols["statement_type"].append(st)
            cols["valid"].append(valid_col[i])
    return pa.Table.from_pydict(cols, schema=FLAT_SCHEMA)


def flatten_output(out_ds):
    """Output Dataset → flat per-span Dataset (ordering recoverable by
    (doc_id, offset))."""
    return out_ds.map_batches(flatten_batch, batch_format="pyarrow")


def write_flat_csv(out_ds, path: str) -> None:
    """CSV export of the flattened spans (S6)."""
    flatten_output(out_ds).write_csv(path)


def write_output_json(out_ds, path: str) -> None:
    """JSON-lines export of the full output envelope (S5)."""
    out_ds.write_json(path)
