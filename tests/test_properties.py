"""Property-based tests (hypothesis) for the scalar helpers and the
per-document extractor's robustness invariants."""
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_context_extractor_agent_ray import docproc
from pdf_context_extractor_agent_ray.docproc import (
    clean_numeric_value,
    clean_table_data,
    extract_document,
    is_numeric_format,
    merge_cross_page_tables,
)

cells = st.text(alphabet=string.printable + "货币资金负债，。：", max_size=12)


@given(st.text(max_size=20))
@settings(max_examples=200)
def test_clean_numeric_never_raises(s):
    out = clean_numeric_value(s)
    if out is not None:
        # \d matches UNICODE digits — reference-faithful behavior
        # (column_analyzer.py:456 uses the same class); hypothesis found
        # e.g. '᪐' (TAI THAM digit) surviving the clean
        import re
        assert re.fullmatch(r"[\d.\-]+", out), out


@given(st.decimals(min_value=-10**12, max_value=10**12, places=2))
@settings(max_examples=100)
def test_numeric_roundtrip(d):
    # any money-formatted decimal is detected and cleaned losslessly
    s = f"{d:,.2f}"
    assert is_numeric_format(s)
    assert clean_numeric_value(s) == f"{d:.2f}"


@given(st.lists(st.lists(st.one_of(st.none(), cells), max_size=6), max_size=10))
@settings(max_examples=100)
def test_clean_table_total(table):
    cleaned = clean_table_data(table)
    for row in cleaned:
        assert any(c.strip() for c in row)
        assert all(isinstance(c, str) for c in row)


@given(st.lists(st.lists(st.lists(cells, min_size=1, max_size=5),
                         min_size=1, max_size=5), max_size=4))
@settings(max_examples=50)
def test_merge_never_raises_and_bounded(tables):
    merged = merge_cross_page_tables(tables)
    assert len(merged) <= sum(len(t) for t in tables)


span_kinds = st.sampled_from(["text", "table_row", "page_break", "media"])


@given(st.lists(st.tuples(span_kinds, cells, st.text(max_size=6)),
                max_size=30))
@settings(max_examples=100, deadline=2000)
def test_extract_document_total_on_garbage(spans):
    """The extractor is total: ANY span sequence yields a well-formed
    result (the continue-on-error contract is for infrastructure
    failures, not input shape)."""
    kinds = [s[0] for s in spans]
    texts = [s[1] for s in spans]
    refs = [s[2] for s in spans]
    offsets = list(range(len(spans)))
    res = extract_document(kinds, texts, refs, offsets)
    assert len(res["kinds"]) == len(res["texts"]) == len(res["media_refs"])
    assert isinstance(res["valid"], bool)
    assert 0.0 <= res["confidence"] <= 1.0
    # media passthrough invariant: every input media span appears in output
    assert sum(1 for k in res["kinds"] if k == "media") == \
        sum(1 for k in kinds if k == "media")


@given(st.lists(st.tuples(span_kinds, st.sampled_from(["t1", "t2", ""])),
                max_size=25),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=6))
@settings(max_examples=200)
def test_page_slice_and_stats_match_paginate(spans, start, extra):
    """For ANY span sequence, the page-range slice and the page-stats
    fold agree with docproc.paginate — pages are non-empty runs, empty
    pages (leading/consecutive/trailing breaks) don't count."""
    from pdf_context_extractor_agent_ray.docproc import paginate
    from pdf_context_extractor_agent_ray.stages.pages import (
        _doc_page_stats, _page_slice)

    kinds = [s[0] for s in spans]
    refs = [s[1] if s[0] == "table_row" else "" for s in spans]
    texts = [f"x{i}" for i in range(len(spans))]
    offsets = list(range(len(spans)))
    pages = paginate(kinds, texts, refs, offsets)

    n_pages, n_tables, max_pp = _doc_page_stats(kinds, refs, 0, len(kinds))
    assert n_pages == len(pages)
    assert n_tables == sum(len(p["tables"]) for p in pages)
    assert max_pp == max((len(p["items"]) for p in pages), default=0)

    end = start + extra
    a, b = _page_slice(kinds, 0, len(kinds), start, end)
    got = [texts[j] for j in range(a, b) if kinds[j] != "page_break"]
    want = [it[1] for p in pages[start - 1:end] for it in p["items"]]
    assert got == want


@given(st.text(max_size=30))
@settings(max_examples=200)
def test_classify_title_total(line):
    out = docproc.classify_title(line)
    if out is not None:
        level, number, title = out
        assert level in (1, 2)
        assert number.isdigit()
        assert title.strip()
