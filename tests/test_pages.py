"""Page-range selection (S1) + page metadata (S4) stages."""
import pyarrow as pa

from pdf_context_extractor_agent_ray.docproc import paginate
from pdf_context_extractor_agent_ray.schema import docs_to_table, spans_column_views
from pdf_context_extractor_agent_ray.stages.pages import page_stats, select_page_range
from pdf_context_extractor_agent_ray.synth import generate_doc


def _doc_pages(row):
    spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
    return paginate([s[0] for s in spans], [s[1] for s in spans],
                    [s[2] for s in spans], [s[3] for s in spans])


def test_select_page_range(ray_session):
    import ray.data as rd
    doc = generate_doc("pages-0001", family="many_pages")
    full_pages = paginate([s[0] for s in doc["spans"]], [s[1] for s in doc["spans"]],
                          [s[2] for s in doc["spans"]], [s[3] for s in doc["spans"]])
    n = len(full_pages)
    assert n > 5
    ds = rd.from_arrow(docs_to_table([doc]))

    out = select_page_range(ds, 2, 4).take_all()[0]
    got_pages = _doc_pages(out)
    assert len(got_pages) == 3
    # content equality with the direct pagination of pages 2..4
    for gp, fp in zip(got_pages, full_pages[1:4]):
        assert [i[:3] for i in gp["items"]] == [i[:3] for i in fp["items"]]

    # bounds: start beyond the doc -> empty; end clamped to doc length
    assert _doc_pages(select_page_range(ds, n + 5, n + 9).take_all()[0]) == []
    clamped = select_page_range(ds, 1, n + 50).take_all()[0]
    assert len(_doc_pages(clamped)) == n


def test_empty_pages_match_paginate(ray_session):
    """Leading / consecutive / trailing page_breaks create EMPTY pages,
    which paginate skips — the page-range slice and page_stats must
    number pages identically or slice contents shift by a page."""
    import ray.data as rd
    spans = [("page_break", "1", "", 0), ("text", "A", "", 1),
             ("page_break", "2", "", 2), ("page_break", "3", "", 3),
             ("text", "B", "", 4), ("text", "C", "", 5),
             ("page_break", "4", "", 6)]
    doc = {"doc_id": "empty-pages", "spans": spans}
    pages = paginate([s[0] for s in spans], [s[1] for s in spans],
                     [s[2] for s in spans], [s[3] for s in spans])
    assert len(pages) == 2  # the paginate contract this test pins

    ds = rd.from_arrow(docs_to_table([doc]))
    r = page_stats(ds).take_all()[0]
    assert r["n_pages"] == 2
    assert r["max_spans_per_page"] == 2

    p1 = _doc_pages(select_page_range(ds, 1, 1).take_all()[0])
    assert [i[:3] for i in p1[0]["items"]] == [("text", "A", "")]
    p2 = _doc_pages(select_page_range(ds, 2, 2).take_all()[0])
    assert [i[:3] for i in p2[0]["items"]] == [("text", "B", ""), ("text", "C", "")]


def test_page_stats(ray_session):
    import ray.data as rd
    docs = [generate_doc(f"ps-{i:03d}") for i in range(20)]
    ds = rd.from_arrow(docs_to_table(docs))
    stats = {r["doc_id"]: r for r in page_stats(ds).take_all()}
    for d in docs:
        pages = paginate([s[0] for s in d["spans"]], [s[1] for s in d["spans"]],
                         [s[2] for s in d["spans"]], [s[3] for s in d["spans"]])
        r = stats[d["doc_id"]]
        assert r["n_pages"] == len(pages)
        assert r["n_spans"] == len(d["spans"])
        assert r["n_tables"] == sum(len(p["tables"]) for p in pages)


def test_table_contexts(ray_session):
    import ray.data as rd
    from pdf_context_extractor_agent_ray.stages.context import table_contexts
    docs = [generate_doc(f"ctx-{i:03d}", family="bs_simple") for i in range(5)]
    ds = rd.from_arrow(docs_to_table(docs))
    rows = table_contexts(ds).take_all()
    assert rows
    r = rows[0]
    # the statement title line sits right above the first table
    assert "资产负债表" in r["context_before"]
    assert r["n_rows"] > 10
    assert "项目" in r["table_head"]


def test_strip_boilerplate_preserves_structure(ray_session):
    import ray.data as rd
    from pdf_context_extractor_agent_ray.stages.context import strip_boilerplate
    docs = [generate_doc(f"bp-{i:03d}") for i in range(20)]
    ds = rd.from_arrow(docs_to_table(docs))
    out = {r["doc_id"]: r for r in strip_boilerplate(ds).take_all()}
    for d in docs:
        spans = out[d["doc_id"]]["spans"]
        # non-text spans all survive, order preserved
        orig_nontext = [(s[0], s[1]) for s in d["spans"] if s[0] != "text"]
        got_nontext = [(s["kind"], s["text"]) for s in spans if s["kind"] != "text"]
        assert got_nontext == orig_nontext
        assert len(spans) <= len(d["spans"])


def test_boilerplate_stats_agree_with_strip(ray_session):
    """The stats report must equal counting the actual strip_boilerplate
    rebuild against the original docs."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.stages.context import (
        boilerplate_stats, strip_boilerplate)
    docs = [generate_doc(f"bps-{i:03d}") for i in range(30)]
    ds = rd.from_arrow(docs_to_table(docs))
    stats = {r["doc_id"]: r for r in boilerplate_stats(ds).take_all()}
    stripped = {r["doc_id"]: r["spans"]
                for r in strip_boilerplate(ds).take_all()}
    for d in docs:
        kept = [s for s in stripped[d["doc_id"]] if s["kind"] == "text"]
        orig_text = [s for s in d["spans"] if s[0] == "text"]
        r = stats[d["doc_id"]]
        assert r["n_text_kept"] == len(kept)
        assert r["n_text_dropped"] == len(orig_text) - len(kept)
        assert r["kept_chars"] == sum(len(s["text"]) for s in kept)
