"""Page-range selection + page metadata stages (S1-S4 parity).

The reference opens a PDF and slices a 1-based page range with bounds
checking (src/pdf_reader.py:37-59) and exposes page metadata
(:113-136). In the span model a page range is a pure span filter per
document — a stateless ``map_batches`` that keeps each doc's spans
between the selected page boundaries (page_break spans re-emitted so
downstream pagination still sees the structure).
"""
from __future__ import annotations

import pyarrow as pa

from ..schema import DOCUMENT_SCHEMA, build_spans_array, spans_column_views


def _page_slice(kinds: list[str], lo: int, hi: int,
                start_page: int, end_page: int) -> tuple[int, int]:
    """Span index range [a, b) covering 1-based pages start..end of one
    doc, numbered EXACTLY as docproc.paginate numbers them: a page is a
    non-empty run of spans, empty pages (leading / consecutive /
    trailing page_breaks) don't count — so slice page N is paginate
    page N for any input, not just break-dense synth docs."""
    page = 0
    open_page = False
    a = None
    b = hi
    for j in range(lo, hi):
        if kinds[j] == "page_break":
            open_page = False
            continue
        if not open_page:
            page += 1
            open_page = True
            if a is None and page == start_page:
                a = j
            if page == end_page + 1:
                b = j
                break
    if a is None:
        a = hi  # start page beyond the document -> empty (bounds check)
    return a, b


def select_page_range(ds, start_page: int, end_page: int):
    """Per-document page-range filter (1-based, inclusive, bounds
    clamped like the reference's ``get_pages``)."""
    if start_page < 1:
        start_page = 1
    if end_page < start_page:
        raise ValueError("end_page < start_page")

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, offs, kinds, texts, refs, span_offs = spans_column_views(batch)
        fk, ft, fr, fo = [], [], [], []
        bounds = [0]
        for i in range(len(doc_ids)):
            lo, hi = int(offs[i]), int(offs[i + 1])
            a, b = _page_slice(kinds, lo, hi, start_page, end_page)
            fk.extend(kinds[a:b])
            ft.extend(texts[a:b])
            fr.extend(refs[a:b])
            fo.extend(span_offs[a:b])
            bounds.append(len(fk))
        spans = build_spans_array(fk, ft, fr, fo, bounds)
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.string()), spans], schema=DOCUMENT_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")


PAGE_STATS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("n_pages", pa.int32()),
    ("n_spans", pa.int32()),
    ("n_tables", pa.int32()),
    ("max_spans_per_page", pa.int32()),
])


def _doc_page_stats(kinds: list[str], refs: list[str],
                    lo: int, hi: int) -> tuple[int, int, int]:
    """(n_pages, n_tables, max_spans_per_page) for one doc's span range,
    with page semantics == docproc.paginate: only non-empty runs count
    as pages; per-page tables are distinct refs."""
    n_pages = 0
    per_page = 0
    max_pp = 0
    n_tables = 0
    page_tables: set = set()
    for j in range(lo, hi):
        if kinds[j] == "page_break":
            if per_page:
                n_pages += 1
                max_pp = max(max_pp, per_page)
                n_tables += len(page_tables)
                per_page = 0
                page_tables = set()
        else:
            per_page += 1
            if kinds[j] == "table_row":
                page_tables.add(refs[j])
    if per_page:
        n_pages += 1
        max_pp = max(max_pp, per_page)
        n_tables += len(page_tables)
    return n_pages, n_tables, max_pp


def page_stats(ds):
    """Per-document page metadata (S4 analogue): page/table counts and
    the per-page span skew signal used for size-aware splitting."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, offs, kinds, _t, refs, _o = spans_column_views(batch)
        out = {n: [] for n in PAGE_STATS_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(offs[i]), int(offs[i + 1])
            n_pages, n_tables, max_pp = _doc_page_stats(kinds, refs, lo, hi)
            out["doc_id"].append(doc_ids[i])
            out["n_pages"].append(n_pages)
            out["n_spans"].append(hi - lo)
            out["n_tables"].append(n_tables)
            out["max_spans_per_page"].append(max_pp)
        return pa.Table.from_pydict(out, schema=PAGE_STATS_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")
