"""Checkpoint/resume: a second run skips completed docs; a killed run
(simulated by processing only a prefix) converges on rerun without
reprocessing (SURVEY.md §4.2, north-rule resumability)."""
import os

import pyarrow.parquet as pq
import pytest

from pdf_context_extractor_agent_ray import io as dio
from pdf_context_extractor_agent_ray.pipelines.extraction import run_resumable
from pdf_context_extractor_agent_ray.schema import docs_to_table
from pdf_context_extractor_agent_ray.synth import generate_corpus


@pytest.fixture()
def corpus():
    return generate_corpus(60, prefix="resume")


def _read_all_doc_ids(out_dir):
    ids = []
    for part in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, part)
        if not part.startswith("part-") or not os.path.isdir(p):
            continue
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                ids.extend(pq.read_table(os.path.join(p, f),
                                         columns=["doc_id"]).column("doc_id").to_pylist())
    return ids


def test_jsonl_documents_roundtrip(ray_session, corpus, tmp_path):
    """JSONL interchange: write_documents/read_documents roundtrip a
    documents Dataset span-for-span with the canonical Arrow schema."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.schema import DOCUMENT_SCHEMA

    path = str(tmp_path / "docs.jsonl")
    dio.write_documents(rd.from_arrow(docs_to_table(corpus)), path)
    back = dio.read_documents(path)
    got = {}
    for r in back.take_all():
        got[r["doc_id"]] = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]]
    assert len(got) == len(corpus)
    for d in corpus:
        assert got[d["doc_id"]] == [tuple(s) for s in d["spans"]], d["doc_id"]
    assert back.schema().base_schema.equals(DOCUMENT_SCHEMA)


def test_resume_skips_completed(ray_session, corpus, tmp_path):
    import ray.data as rd
    out = str(tmp_path / "out")

    # "killed" first run: only the first 25 docs were committed
    m1 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus[:25])), out,
                       concurrency=2, lineage={"input": "corpus[:25]"})
    assert m1["num_docs"] == 25

    # rerun over the FULL input: only the remaining 35 are processed
    m2 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus)), out,
                       concurrency=2, lineage={"input": "corpus"})
    assert m2["num_docs"] == 35
    assert m2["skipped_docs"] == 25

    ids = _read_all_doc_ids(out)
    assert sorted(ids) == sorted(d["doc_id"] for d in corpus)
    assert len(ids) == len(set(ids))  # no doc processed twice

    manifests = dio.load_manifests(out)
    assert len(manifests) == 2
    assert all(m["stage_version"] == dio.STAGE_VERSION for m in manifests)

    # idempotent third run: nothing left to do
    m3 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus)), out, concurrency=2)
    assert m3["num_docs"] == 0


def test_bloom_filter_no_false_negatives():
    ids = [f"doc-{i:08d}" for i in range(5000)]
    bf = dio.BloomFilter.build(ids)
    assert all(bf.might_contain(d) for d in ids)
    others = [f"other-{i:08d}" for i in range(20000)]
    fp = sum(1 for d in others if bf.might_contain(d)) / len(others)
    assert fp < 0.01, fp  # ~1.4e-4 expected at 20 bits/key
    # manifest roundtrip preserves the bit set
    rt = dio.BloomFilter.from_manifest(bf.to_manifest())
    assert rt.bits == bf.bits and all(rt.might_contain(d) for d in ids)


def test_bloom_batch_probe_matches_scalar():
    """The vectorized probe (the at-scale resume path) is bit-exact
    with the scalar reference: same arbitrary-precision residues via
    mod-m-first reduction."""
    import numpy as np

    ids = [f"doc-{i:08d}" for i in range(5000)]
    bf = dio.BloomFilter.build(ids)
    probe = ids[:2500] + [f"other-{i:08d}" for i in range(2500)] + ["", "x"]
    h1, h2 = dio.BloomFilter.hash_batch(probe)
    vec = bf.might_contain_batch(h1, h2)
    assert (vec == np.array([bf.might_contain(d) for d in probe])).all()
    cf = dio.CompletedFilter([(min(ids), max(ids), bf)])
    vec2 = cf.might_contain_batch(probe)
    assert (vec2 == np.array([cf.might_contain(d) for d in probe])).all()
    assert vec2[:2500].all() and not vec2[-2:].any()


def test_resume_bloom_path_converges(ray_session, corpus, tmp_path):
    """Forcing the manifest-only Bloom path (exact gate at 0) must
    still converge: rerun skips all finished docs, processes the rest,
    nothing is processed twice."""
    import ray.data as rd
    out = str(tmp_path / "out")

    m1 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus[:25])), out,
                       concurrency=2, resume_exact_max_docs=0)
    assert m1["num_docs"] == 25

    m2 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus)), out,
                       concurrency=2, resume_exact_max_docs=0)
    assert m2["skipped_docs"] == 25
    assert m2["num_docs"] == 35  # no false positives at this scale

    ids = _read_all_doc_ids(out)
    assert sorted(ids) == sorted(d["doc_id"] for d in corpus)
    assert len(ids) == len(set(ids))

    m3 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus)), out,
                       concurrency=2, resume_exact_max_docs=0)
    assert m3["num_docs"] == 0

    # the no-op run above wrote an EMPTY partition; the Bloom path must
    # skip it (not fall back to the exact scan) and still converge
    assert dio.completed_filter(out) is not None
    m4 = run_resumable(lambda: rd.from_arrow(docs_to_table(corpus)), out,
                       concurrency=2, resume_exact_max_docs=0)
    assert m4["num_docs"] == 0 and m4["skipped_docs"] == 60


def test_no_half_visible_partitions(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    import ray.data as rd
    run_resumable(lambda: rd.from_arrow(docs_to_table(corpus[:10])), out, concurrency=2)
    # only fully-committed part dirs with manifests are visible
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert parts and all(
        os.path.exists(os.path.join(out, p, dio.MANIFEST_NAME)) for p in parts)
