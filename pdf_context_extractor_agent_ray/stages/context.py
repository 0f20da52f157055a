"""Context-window assembly around detected tables + density-based
boilerplate stripping (the generic main-content-extraction operators
of the north star, expressed over the span model).

- ``table_contexts``: for every table in a document, the K text lines
  immediately before/after it on the same page — the "context window"
  a downstream table-understanding model consumes alongside the table.
- ``strip_boilerplate``: drop text spans that a density heuristic marks
  as boilerplate (short, punctuation-light, stopword-light lines that
  repeat across documents — the text-domain analogue of DOM link-density
  stripping). Table/media/page-break spans always pass through.
"""
from __future__ import annotations

import pyarrow as pa

from ..patterns import CELL_SEP
from ..schema import DOCUMENT_SCHEMA, build_spans_array, spans_column_views

CONTEXT_LINES = 3

# trim EXACTLY this class on both the engine and the SQL-oracle side:
# Python str.strip() is Unicode-aware (U+3000, NBSP, ...) while DuckDB
# trim() takes an explicit character list — the CLAUDE.md parity rule
ASCII_WS = " \t\r\n\f\v"

TABLE_CONTEXT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("table_ref", pa.string()),
    ("n_rows", pa.int32()),
    ("context_before", pa.string()),   # last K text lines above the table
    ("context_after", pa.string()),    # first K text lines below it
    ("table_head", pa.string()),       # first row (header) for routing
])

# boilerplate density heuristic thresholds
MIN_CONTENT_CHARS = 6
# ratio threshold 0.7 compared in exact integer arithmetic (n*10 > len*7)
MAX_DIGIT_PUNCT_PCT10 = 7

# the non-informative character class — keep the literal set and the
# SQL oracle's regex class (__ray_entry__ boilerplate_stats) in
# lockstep: an EXPLICIT codepoint set (no Unicode isdigit()) so Python
# and DuckDB/RE2 agree exactly. Includes the fullwidth digits ０-９ and
# the ideographic space U+3000 common in this Chinese financial-document
# domain (ADVICE r3), while the line TRIM stays ASCII_WS on both sides.
DIGIT_PUNCT_CHARS = frozenset(
    "0123456789０１２３４５６７８９ 　.,:;：，。%-—()（）")


def _is_boilerplate(text: str) -> bool:
    s = text.strip(ASCII_WS)
    if len(s) < MIN_CONTENT_CHARS:
        return True
    non_informative = sum(1 for ch in s if ch in DIGIT_PUNCT_CHARS)
    return non_informative * 10 > len(s) * MAX_DIGIT_PUNCT_PCT10


def table_contexts(docs_ds, k_lines: int = CONTEXT_LINES):
    """Per-table context windows (one output row per detected table)."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, offs, kinds, texts, refs, _o = spans_column_views(batch)
        out = {n: [] for n in TABLE_CONTEXT_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(offs[i]), int(offs[i + 1])
            j = lo
            while j < hi:
                if kinds[j] != "table_row":
                    j += 1
                    continue
                ref = refs[j]
                start = j
                while j < hi and kinds[j] == "table_row" and refs[j] == ref:
                    j += 1
                end = j
                before: list[str] = []
                b = start - 1
                while b >= lo and kinds[b] != "page_break" and len(before) < k_lines:
                    if kinds[b] == "text" and texts[b].strip(ASCII_WS):
                        before.append(texts[b].strip(ASCII_WS))
                    b -= 1
                after: list[str] = []
                a = end
                while a < hi and kinds[a] != "page_break" and len(after) < k_lines:
                    if kinds[a] == "text" and texts[a].strip(ASCII_WS):
                        after.append(texts[a].strip(ASCII_WS))
                    a += 1
                out["doc_id"].append(doc_ids[i])
                out["table_ref"].append(ref)
                out["n_rows"].append(end - start)
                out["context_before"].append("\n".join(reversed(before)))
                out["context_after"].append("\n".join(after))
                out["table_head"].append(" ".join(texts[start].split(CELL_SEP)))
        return pa.Table.from_pydict(out, schema=TABLE_CONTEXT_SCHEMA)

    return docs_ds.map_batches(fn, batch_format="pyarrow")


BOILERPLATE_STATS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("n_text_kept", pa.int64()),
    ("n_text_dropped", pa.int64()),
    ("kept_chars", pa.int64()),   # character count of surviving text spans
])


def boilerplate_stats(docs_ds):
    """Per-doc main-content yield of the density heuristic: how many
    text spans ``strip_boilerplate`` keeps/drops and the surviving
    character mass — the report a corpus-cleaning run ships. One
    vectorizable span pass, no shuffle; SQL-oracle twin in
    ``__ray_entry__`` (pytest pins agreement with the actual
    ``strip_boilerplate`` rebuild)."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, offs, kinds, texts, _refs, _o = spans_column_views(batch)
        out = {n: [] for n in BOILERPLATE_STATS_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(offs[i]), int(offs[i + 1])
            kept = dropped = chars = 0
            for j in range(lo, hi):
                if kinds[j] != "text":
                    continue
                if _is_boilerplate(texts[j]):
                    dropped += 1
                else:
                    kept += 1
                    chars += len(texts[j])
            out["doc_id"].append(doc_ids[i])
            out["n_text_kept"].append(kept)
            out["n_text_dropped"].append(dropped)
            out["kept_chars"].append(chars)
        return pa.Table.from_pydict(out, schema=BOILERPLATE_STATS_SCHEMA)

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def strip_boilerplate(docs_ds):
    """Documents with boilerplate text spans removed (density heuristic);
    ordering and all non-text spans preserved.

    Parity note: the heuristic trims ``ASCII_WS`` only (not Unicode
    ``str.strip()``) and counts the explicit ``DIGIT_PUNCT_CHARS``
    codepoint set (not ``str.isdigit``) so the DuckDB/RE2 oracle can
    reproduce it byte-for-byte; fullwidth digits and U+3000 are covered
    by explicit members of the set, in lockstep with the SQL class."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, offs, kinds, texts, refs, span_offs = spans_column_views(batch)
        fk, ft, fr, fo = [], [], [], []
        bounds = [0]
        for i in range(len(doc_ids)):
            lo, hi = int(offs[i]), int(offs[i + 1])
            for j in range(lo, hi):
                if kinds[j] == "text" and _is_boilerplate(texts[j]):
                    continue
                fk.append(kinds[j])
                ft.append(texts[j])
                fr.append(refs[j])
                fo.append(span_offs[j])
            bounds.append(len(fk))
        spans = build_spans_array(fk, ft, fr, fo, bounds)
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.string()), spans], schema=DOCUMENT_SCHEMA)

    return docs_ds.map_batches(fn, batch_format="pyarrow")
