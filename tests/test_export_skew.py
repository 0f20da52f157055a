"""Flat export sink + skew split/reassemble invariance."""
import pyarrow as pa
import pytest

from pdf_context_extractor_agent_ray.functions.labels import get_label
from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict
from pdf_context_extractor_agent_ray.pipelines.export import flatten_output, write_flat_csv
from pdf_context_extractor_agent_ray.pipelines.extraction import extraction_pipeline
from pdf_context_extractor_agent_ray.schema import docs_to_table
from pdf_context_extractor_agent_ray.stages.skew import rebalanced_documents
from pdf_context_extractor_agent_ray.synth import generate_corpus, generate_doc


def test_get_label():
    assert get_label("operating_revenue", "income_statement") == "营业收入"
    assert get_label("assets_total", "balance_sheet") == "资产总计"
    assert get_label("ending_cash_balance", "cash_flow") == "期末现金及现金等价物余额"
    assert get_label("货币资金", "balance_sheet") == "货币资金"  # identity fallback
    assert get_label("unknown_key", "income_statement") == "unknown_key"


def test_flat_export(ray_session, tmp_path):
    import ray.data as rd
    corpus = generate_corpus(40, prefix="flat")
    out = extraction_pipeline(rd.from_arrow(docs_to_table(corpus)), concurrency=2)
    flat = flatten_output(out)
    rows = flat.take_all()
    assert rows
    # ordering contract: offsets strictly increasing within a doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["offset"])
    for doc_id, offs in by_doc.items():
        assert sorted(offs) == list(range(len(offs))), doc_id
    # item rows carry parsed fields + label
    item = next(r for r in rows if r["kind"] == "item" and r["statement_type"] == "balance_sheet")
    assert item["section"] and item["standard_name"] and item["original_name"]
    assert item["cn_label"] == get_label(item["standard_name"], "balance_sheet")
    # csv sink writes
    write_flat_csv(extraction_pipeline(rd.from_arrow(docs_to_table(corpus[:10])),
                                       concurrency=2), str(tmp_path / "csv"))
    import os
    assert any(f.endswith(".csv") for f in os.listdir(tmp_path / "csv"))


def test_item_text_decode_pipe_in_name():
    """A document row name containing '|' must survive the span-text
    wire format: the greedy middle absorbs it (the name field is the
    only document-controlled field in the encoding)."""
    from pdf_context_extractor_agent_ray.docproc import (
        decode_item_text, decode_unmatched_text)
    enc = "|".join(["流动资产", "monetary_funds", "货币|资金", "100.00", "90.00", ""])
    assert decode_item_text(enc) == (
        "流动资产", "monetary_funds", "货币|资金", "100.00", "90.00", "")
    assert decode_item_text("too|short") is None
    enc_u = "|".join(["row3", "其他|项目", "5.00", "", "注1"])
    assert decode_unmatched_text(enc_u) == ("row3", "其他|项目", "5.00", "", "注1")
    assert decode_unmatched_text("a|b") is None


def test_skew_guards_and_gate(ray_session):
    """max_spans < 1 raises (a zero budget would spin a worker forever)
    and an all-small corpus takes the no-exchange fast path with
    identical rows."""
    import ray.data as rd
    with pytest.raises(ValueError):
        rebalanced_documents(rd.from_arrow(docs_to_table(generate_corpus(2))), 0)
    corpus = generate_corpus(12, prefix="gate")
    ds = rd.from_arrow(docs_to_table(corpus))
    out = rebalanced_documents(ds, max_spans=10**9)  # nothing exceeds
    assert sorted(r["doc_id"] for r in out.take_all()) == \
        sorted(d["doc_id"] for d in corpus)


def test_skew_split_reassemble_equality(ray_session):
    import ray.data as rd
    # force heavy docs into the corpus
    corpus = [generate_doc(f"skew-{i:04d}", family="many_pages") for i in range(4)]
    corpus += generate_corpus(30, prefix="skewmix")
    oracle = {d["doc_id"]: extract_doc_dict(d) for d in corpus}

    ds = rd.from_arrow(docs_to_table(corpus))
    balanced = rebalanced_documents(ds, max_spans=150)  # low budget: all heavy docs split
    out = extraction_pipeline(balanced, concurrency=2, batch_size=8)
    got = {}
    for row in out.take_all():
        got[row["doc_id"]] = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                              for s in row["spans"]]
    assert set(got) == set(oracle)
    for doc_id in oracle:
        assert got[doc_id] == oracle[doc_id]["spans"], doc_id
