"""Real-PDF ingestion adapter (S1): pdfplumber pages → span docs.

Mirrors the reference's ``PDFReader`` semantics
(ref: src/pdf_reader.py:14-59): 1-based inclusive page ranges with a
``ValueError`` on out-of-bounds (ref:47-56), per-page
``extract_text() or ""`` (ref:61-79), ``extract_tables()`` with
``None`` cells blanked (ref:81-100), and per-page width/height/rotation
metadata (ref:113-136) — re-expressed as the engine's ordered span
model (kind, text, media_ref, offset):

- one ``text`` span per line of the page's extracted text (the unit
  ``docproc.page_text_lines`` folds back into page text);
- one ``table_row`` span per table row, cells joined with
  ``CELL_SEP``, ``media_ref`` = ``p{page}:t{index}`` provenance
  (mirrors ref: src/table_extractor.py:53-59);
- one ``media`` span per embedded image (interleaved-corpus parity);
- a ``page_break`` span between consecutive pages.

pdfplumber is not installable in this sandbox, so every entry point is
import-guarded: the span-assembly core (``pages_to_spans``) is
duck-typed and unit-tested with fake page objects; ``pdf_to_doc`` /
``read_pdf_documents`` raise a clear ImportError without the lib and
are exercised by a fixture test wherever pdfplumber exists.
"""
from __future__ import annotations

import os
from typing import Any, Iterable, Optional, Sequence, Tuple

from ..patterns import CELL_SEP

try:  # pragma: no cover - exercised only where pdfplumber exists
    import pdfplumber  # type: ignore

    HAVE_PDFPLUMBER = True
except ImportError:  # pragma: no cover
    pdfplumber = None
    HAVE_PDFPLUMBER = False


def _require_pdfplumber() -> None:
    if not HAVE_PDFPLUMBER:
        raise ImportError(
            "pdfplumber is required for real-PDF ingestion; install it or "
            "use the parquet/synthetic span sources")


def slice_pages(pages: Sequence[Any],
                page_range: Optional[Tuple[int, int]]) -> Sequence[Any]:
    """1-based inclusive page slice with the reference's bounds check
    (ref: src/pdf_reader.py:47-56 raises rather than clamping)."""
    if page_range is None:
        return pages
    start, end = page_range
    start_idx, end_idx = start - 1, end - 1
    if start_idx < 0 or end_idx >= len(pages):
        raise ValueError(f"页面范围超出PDF总页数 {len(pages)}")
    return pages[start_idx:end_idx + 1]


def pages_to_spans(pages: Iterable[Any],
                   start_page: int = 1) -> list[tuple[str, str, str, int]]:
    """Assemble ordered spans from duck-typed page objects exposing
    ``extract_text()``, ``extract_tables()`` and ``.images`` (the
    pdfplumber page surface the reference consumes).

    Per-page order: text lines, then tables, then images — the
    reference reads text and tables as separate per-page channels
    (ref: src/table_extractor.py:34-64), so no finer interleaving
    exists to preserve. ``page_break`` spans separate consecutive
    pages (a trailing break would create no page — docproc.paginate).
    """
    spans: list[tuple[str, str, str, int]] = []
    off = 0

    def emit(kind: str, text: str, ref: str) -> None:
        nonlocal off
        spans.append((kind, text, ref, off))
        off += 1

    for i, page in enumerate(pages):
        pageno = start_page + i
        if i:
            emit("page_break", str(pageno - 1), "")
        text = page.extract_text() or ""
        for line in text.split("\n"):
            if line.strip():
                emit("text", line, "")
        tables = page.extract_tables() or []
        for ti, table in enumerate(tables):
            ref = f"p{pageno}:t{ti}"
            for row in table:
                cells = ["" if c is None else str(c) for c in row]
                emit("table_row", CELL_SEP.join(cells), ref)
        for ii, _img in enumerate(getattr(page, "images", []) or []):
            mid = f"p{pageno}:i{ii}"
            emit("media", f"blob:{mid}", f"img:{mid}")
    return spans


def page_info(page: Any, pageno: int) -> dict[str, Any]:
    """Reference ``get_page_info`` shape (ref: src/pdf_reader.py:113-136)."""
    return {"page_number": pageno, "width": page.width,
            "height": page.height, "rotation": page.rotation}


def pdf_to_doc(pdf_path: str,
               page_range: Optional[Tuple[int, int]] = None,
               doc_id: Optional[str] = None) -> dict[str, Any]:
    """One PDF file → one span-doc dict
    ``{'doc_id', 'spans': [(kind, text, media_ref, offset), ...],
    'page_info': [...]}``."""
    _require_pdfplumber()
    with pdfplumber.open(pdf_path) as pdf:
        pages = slice_pages(pdf.pages, page_range)
        start = page_range[0] if page_range else 1
        spans = pages_to_spans(pages, start_page=start)
        info = [page_info(p, start + i) for i, p in enumerate(pages)]
    return {"doc_id": doc_id or os.path.basename(pdf_path),
            "spans": spans, "page_info": info}


def read_pdf_documents(paths: Sequence[str],
                       page_range: Optional[Tuple[int, int]] = None,
                       override_num_blocks: Optional[int] = None):
    """Distributed PDF ingestion: a Dataset of (doc_id, spans) rows,
    one per input file. The file list ships as tiny descriptor rows;
    each task opens and parses its own PDFs (pdfplumber state is
    per-call — no shared handles, so a plain task pool is right).
    Output schema matches every other document source
    (``schema.docs_to_table``), so the extraction pipeline and all
    span operators run unchanged on real PDFs."""
    _require_pdfplumber()
    import ray.data as rd
    import pyarrow as pa

    from ..schema import docs_to_table

    def parse(batch: pa.Table) -> pa.Table:
        docs = []
        for path in batch.column("path").to_pylist():
            d = pdf_to_doc(path, page_range)
            docs.append({"doc_id": d["doc_id"], "spans": d["spans"]})
        return docs_to_table(docs)

    items = [{"path": p} for p in paths]
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.from_items(items, **kwargs).map_batches(
        parse, batch_format="pyarrow")
