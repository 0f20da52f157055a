"""Span-sequence equality: the Ray pipeline must match the sequential
oracle exactly — (kind, text, media_ref, order) per doc_id — and be
invariant to input order, batch size, and parallelism (SURVEY.md §5.2)."""
import pytest

from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict
from pdf_context_extractor_agent_ray.pipelines.extraction import extraction_pipeline
from pdf_context_extractor_agent_ray.schema import docs_to_table
from pdf_context_extractor_agent_ray.synth import generate_corpus

N_DOCS = 250


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS)


@pytest.fixture(scope="module")
def oracle_results(corpus):
    return {d["doc_id"]: extract_doc_dict(d) for d in corpus}


def _collect(ds):
    out = {}
    for row in ds.take_all():
        out[row["doc_id"]] = {
            "spans": [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in row["spans"]],
            "valid": row["valid"],
            "confidence": row["confidence"],
            "errors": list(row["errors"]),
        }
    return out


def _assert_equal(ray_out, oracle_results):
    assert set(ray_out) == set(oracle_results)
    for doc_id, oracle in oracle_results.items():
        got = ray_out[doc_id]
        assert got["spans"] == oracle["spans"], f"span mismatch for {doc_id}"
        assert got["valid"] == oracle["valid"], doc_id
        assert got["errors"] == oracle["errors"], doc_id
        assert abs(got["confidence"] - oracle["confidence"]) < 1e-6, doc_id


def test_pipeline_matches_oracle(ray_session, corpus, oracle_results):
    import ray.data as rd
    ds = rd.from_arrow(docs_to_table(corpus))
    out = extraction_pipeline(ds, concurrency=2, batch_size=32)
    _assert_equal(_collect(out), oracle_results)


def test_invariant_to_input_order_and_batching(ray_session, corpus, oracle_results):
    import ray.data as rd
    shuffled = list(reversed(corpus))
    ds = rd.from_arrow(docs_to_table(shuffled)).repartition(7)
    out = extraction_pipeline(ds, concurrency=3, batch_size=11)
    _assert_equal(_collect(out), oracle_results)


def test_synth_source_distributed_generation(ray_session, corpus, oracle_results):
    # the distributed generator must produce the identical corpus
    from pdf_context_extractor_agent_ray.sources.synth_source import synth_documents
    ds = synth_documents(N_DOCS)
    out = extraction_pipeline(ds, concurrency=2, batch_size=64)
    _assert_equal(_collect(out), oracle_results)
