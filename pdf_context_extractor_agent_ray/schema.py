"""Arrow schemas + zero-copy batch <-> per-document span access.

Input table (per BASELINE.json input_hint):
  doc_id: string
  spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Output table:
  doc_id, spans (same struct), valid: bool, confidence: float32,
  errors: list<string>

The batch helpers below avoid per-row ``to_pylist`` overhead: the list
array's flat child arrays are converted to Python lists ONCE per batch
and documents are sliced out of them by list offsets — the per-batch
hot path the Ray stages rely on.
"""
from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCUMENT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

OUTPUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
    ("valid", pa.bool_()),
    ("confidence", pa.float32()),
    ("statement_type", pa.string()),   # '' when no statement detected
    ("errors", pa.list_(pa.string())),
])


def spans_column_views(batch: pa.Table | pa.RecordBatch):
    """Return (doc_ids, list_offsets, kinds, texts, media_refs, offsets)
    where the last four are flat Python lists over ALL docs in the batch
    and ``list_offsets[i]:list_offsets[i+1]`` slices doc i's spans.

    One pass over Arrow memory per batch; no per-row object churn.
    """
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray):
        la = col
    else:  # pragma: no cover - chunked edge
        la = col.chunk(0)
    # Normalize the backing slice: a sliced ListArray's `values` still
    # spans the WHOLE parent block, so converting it wholesale does
    # O(parent) work per call. Trim to this batch's window and re-base
    # the offsets to zero.
    list_offsets = la.offsets.to_numpy(zero_copy_only=False)
    values = la.values
    first, last = int(list_offsets[0]), int(list_offsets[-1])
    if first != 0 or last != len(values):
        values = values.slice(first, last - first)
        list_offsets = list_offsets - first
    kinds = values.field("kind").to_pylist()
    texts = values.field("text").to_pylist()
    refs = values.field("media_ref").to_pylist()
    offs = values.field("offset").to_pylist()
    doc_col = batch.column("doc_id")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_ids = doc_col.to_pylist()
    return doc_ids, list_offsets, kinds, texts, refs, offs


def build_spans_array(flat_kinds: list[str], flat_texts: list[str],
                      flat_refs: list[str], flat_offsets: list[int],
                      list_offsets: list[int]) -> pa.ListArray:
    """Assemble a spans list-array from flat per-span lists + per-doc
    boundaries (list_offsets has len = n_docs + 1)."""
    struct = pa.StructArray.from_arrays(
        [pa.array(flat_kinds, pa.string()),
         pa.array(flat_texts, pa.string()),
         pa.array(flat_refs, pa.string()),
         pa.array(flat_offsets, pa.int32())],
        fields=list(SPAN_STRUCT),
    )
    return pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)


def docs_to_table(docs: list[dict]) -> pa.Table:
    """Build an input table from [{'doc_id', 'spans': [(k,t,r,o), ...]}]."""
    flat_k: list[str] = []
    flat_t: list[str] = []
    flat_r: list[str] = []
    flat_o: list[int] = []
    offsets = [0]
    ids = []
    for d in docs:
        ids.append(d["doc_id"])
        for (k, t, r, o) in d["spans"]:
            flat_k.append(k)
            flat_t.append(t)
            flat_r.append(r)
            flat_o.append(o)
        offsets.append(len(flat_k))
    spans = build_spans_array(flat_k, flat_t, flat_r, flat_o, offsets)
    return pa.Table.from_arrays([pa.array(ids, pa.string()), spans],
                                schema=DOCUMENT_SCHEMA)
