"""Real-PDF ingestion adapter (S1): span assembly is unit-tested with
duck-typed fake pages (pdfplumber is absent in this sandbox); the
pdfplumber-dependent entry points are skip-gated and exercised by the
fixture test wherever the lib exists."""
import pytest

from pdf_context_extractor_agent_ray.patterns import CELL_SEP
from pdf_context_extractor_agent_ray.sources.pdf_source import (
    HAVE_PDFPLUMBER,
    page_info,
    pages_to_spans,
    slice_pages,
)


class FakePage:
    def __init__(self, text="", tables=(), images=(), width=595.0,
                 height=842.0, rotation=0):
        self._text = text
        self._tables = list(tables)
        self.images = list(images)
        self.width = width
        self.height = height
        self.rotation = rotation

    def extract_text(self):
        return self._text

    def extract_tables(self):
        return self._tables


def test_slice_pages_1based_inclusive_and_bounds():
    pages = [FakePage(text=f"p{i}") for i in range(1, 6)]
    assert slice_pages(pages, (2, 4)) == pages[1:4]
    assert slice_pages(pages, None) == pages
    # reference raises on out-of-bounds, never clamps (pdf_reader.py:47-56)
    with pytest.raises(ValueError):
        slice_pages(pages, (0, 3))
    with pytest.raises(ValueError):
        slice_pages(pages, (1, 6))


def test_pages_to_spans_order_and_encoding():
    pages = [
        FakePage(text="line one\n\nline two",
                 tables=[[["项目", "本期"], ["资产", None]]],
                 images=[{"name": "im0"}]),
        FakePage(text="second page"),
    ]
    spans = pages_to_spans(pages, start_page=3)
    kinds = [s[0] for s in spans]
    assert kinds == ["text", "text", "table_row", "table_row", "media",
                     "page_break", "text"]
    # offsets are the document-order key, dense from 0
    assert [s[3] for s in spans] == list(range(len(spans)))
    # blank text lines are dropped, non-blank kept verbatim
    assert spans[0][1] == "line one" and spans[1][1] == "line two"
    # None cells blank, cells joined with CELL_SEP, provenance ref
    assert spans[2][1] == f"项目{CELL_SEP}本期"
    assert spans[3][1] == f"资产{CELL_SEP}"
    assert spans[2][2] == "p3:t0"
    # media spans mirror the synthetic corpus encoding
    assert spans[4][1] == "blob:p3:i0" and spans[4][2] == "img:p3:i0"
    # page_break carries the page it closes; no trailing break
    assert spans[5][1] == "3"


def test_pages_to_spans_empty_page_makes_no_spans():
    spans = pages_to_spans([FakePage(text=""), FakePage(text="x")])
    assert [s[0] for s in spans] == ["page_break", "text"]


def test_page_info_shape():
    info = page_info(FakePage(width=100.5, height=200.0, rotation=90), 7)
    assert info == {"page_number": 7, "width": 100.5, "height": 200.0,
                    "rotation": 90}


def test_spans_feed_extraction_oracle():
    """Adapter output is a valid engine document: the shared per-doc
    extractor accepts it end-to-end (no real PDF needed — the span
    model is the contract)."""
    from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict

    pages = [FakePage(text="合并资产负债表",
                      tables=[[["项目", "本期末", "上期末"],
                               ["货币资金", "10.00", "8.00"]]])]
    doc = {"doc_id": "pdf-fake-1", "spans": pages_to_spans(pages)}
    out = extract_doc_dict(doc)
    assert out["doc_id"] == "pdf-fake-1"
    assert isinstance(out["spans"], list)


@pytest.mark.skipif(not HAVE_PDFPLUMBER, reason="pdfplumber not installed")
def test_real_pdf_roundtrip(tmp_path):  # pragma: no cover - needs pdfplumber
    """Where pdfplumber exists: generate a minimal one-page PDF and
    ingest it."""
    from pdf_context_extractor_agent_ray.sources.pdf_source import pdf_to_doc

    pdf_bytes = (b"%PDF-1.4\n1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
                 b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
                 b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]>>endobj\n"
                 b"trailer<</Root 1 0 R>>\n%%EOF")
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf_bytes)
    doc = pdf_to_doc(str(p))
    assert doc["doc_id"] == "t.pdf"
    assert doc["page_info"][0]["page_number"] == 1
