"""Skew handling: size-aware splitting of pathological documents.

A document is one row, so a 10^5-span doc inside a 64-doc batch can
blow the block budget (SURVEY.md §7.4.3). The mitigation mirrors the
reference's own evidence that oversized work units fail (its 10-page
LLM batch times out, docs/DEVELOPMENT.md:434-436): cut heavy docs into
page-aligned chunks, ship the chunks, and re-assemble per doc_id
before extraction (extraction is an ordered per-doc fold and must see
the whole document).

Scale design: ONLY the heavy tail pays the shuffle. Small docs take
the direct path (no exchange); oversized docs explode to chunk rows,
``groupby(doc_id)`` brings chunks together (hash-partitioned on
doc_id — the pipeline's single partitioning key), and the re-merged
docs union back into the stream.
"""
from __future__ import annotations

import pyarrow as pa

from ..schema import DOCUMENT_SCHEMA, build_spans_array, spans_column_views

DEFAULT_MAX_SPANS = 2048

CHUNK_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("chunk_idx", pa.int32()),
    ("spans", DOCUMENT_SCHEMA.field("spans").type),
])


def _doc_sizes(batch: pa.Table) -> list[int]:
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False)
    return [int(offs[i + 1] - offs[i]) for i in range(len(batch))]


def split_small_large(ds, max_spans: int = DEFAULT_MAX_SPANS):
    """(small_docs, chunk_rows): small docs pass through untouched;
    oversized docs explode into page-aligned chunks of <= max_spans."""
    if max_spans < 1:
        # the chunk cursor advances by at most max_spans per step — a
        # non-positive budget would spin forever inside a worker
        raise ValueError(f"max_spans must be >= 1, got {max_spans}")

    def small_only(batch: pa.Table) -> pa.Table:
        sizes = _doc_sizes(batch)
        mask = pa.array([s <= max_spans for s in sizes], pa.bool_())
        return batch.filter(mask)

    def explode_large(batch: pa.Table) -> pa.Table:
        doc_ids, offs, kinds, texts, refs, span_offs = spans_column_views(batch)
        out_ids: list[str] = []
        out_chunk: list[int] = []
        fk: list[str] = []
        ft: list[str] = []
        fr: list[str] = []
        fo: list[int] = []
        bounds = [0]
        for i in range(len(doc_ids)):
            lo, hi = int(offs[i]), int(offs[i + 1])
            if hi - lo <= max_spans:
                continue
            # cut at page_break boundaries closest below the budget
            start = lo
            chunk = 0
            while start < hi:
                end = min(start + max_spans, hi)
                if end < hi:
                    back = end
                    while back > start + 1 and kinds[back] != "page_break":
                        back -= 1
                    if back > start + 1:
                        end = back
                fk.extend(kinds[start:end])
                ft.extend(texts[start:end])
                fr.extend(refs[start:end])
                fo.extend(span_offs[start:end])
                bounds.append(len(fk))
                out_ids.append(doc_ids[i])
                out_chunk.append(chunk)
                chunk += 1
                start = end
        spans = build_spans_array(fk, ft, fr, fo, bounds)
        return pa.Table.from_arrays(
            [pa.array(out_ids, pa.string()), pa.array(out_chunk, pa.int32()), spans],
            schema=CHUNK_SCHEMA)

    small = ds.map_batches(small_only, batch_format="pyarrow")
    chunks = ds.map_batches(explode_large, batch_format="pyarrow")
    return small, chunks


def reassemble(chunks_ds):
    """groupby(doc_id) → ordered concat of chunks back into whole docs."""

    def merge(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column("chunk_idx"))
        group = group.take(order)
        _ids, offs, kinds, texts, refs, span_offs = spans_column_views(group)
        spans = build_spans_array(kinds, texts, refs, span_offs, [0, len(kinds)])
        return pa.Table.from_arrays(
            [pa.array([group.column("doc_id")[0].as_py()], pa.string()), spans],
            schema=DOCUMENT_SCHEMA)

    return chunks_ds.groupby("doc_id").map_groups(merge, batch_format="pyarrow")


def rebalanced_documents(ds, max_spans: int = DEFAULT_MAX_SPANS):
    """Documents Dataset with the heavy tail split+reassembled so no
    single block carries a pathological doc through the pipeline.

    The small/large fork consumes ``ds`` twice, so the input is
    materialized once first — otherwise the whole upstream (read /
    synth / prior transforms) executes twice. The blocks live in the
    object store (spilling to disk as needed), which is exactly the
    cost of reading the corpus once.

    Size gate: when NO doc exceeds the budget (the common case), the
    materialized input returns as-is — the groupby exchange pays its
    ~2-3 s fixed cost even on zero rows (CLAUDE.md), so an empty heavy
    tail must not wire one up. The stats pass is a cheap re-read of
    the already-materialized blocks."""
    if max_spans < 1:
        raise ValueError(f"max_spans must be >= 1, got {max_spans}")
    ds = ds.materialize()

    def batch_max(batch: pa.Table) -> pa.Table:
        sizes = _doc_sizes(batch)
        return pa.table({"mx": pa.array([max(sizes) if sizes else 0], pa.int64())})

    biggest = max((r["mx"] for r in
                   ds.map_batches(batch_max, batch_format="pyarrow").take_all()),
                  default=0)
    if biggest <= max_spans:
        return ds
    small, chunks = split_small_large(ds, max_spans)
    return small.union(reassemble(chunks))
