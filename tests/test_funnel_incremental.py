"""r5: CDC-driven incremental cleaning — run 2 processes only the
recrawl delta and must reproduce the from-scratch funnel exactly
(report AND survivor set), then hand the next run its manifest.
"""
import numpy as np
import pyarrow.dataset as pads
import pytest

SF = "/root/testdata/sf0.001"


def _docs():
    import ray.data as rd

    from pdf_context_extractor_agent_ray.functions.util import (
        strip_schema_metadata)
    return strip_schema_metadata(
        rd.read_parquet(f"{SF}/documents.parquet"))


def _survivor_ids(path: str) -> np.ndarray:
    ids = pads.dataset(path).to_table(columns=["doc_id"])["doc_id"]
    return np.sort(ids.to_numpy())


def test_incremental_equals_from_scratch_and_processes_only_delta(
        ray_session, tmp_path):
    from pdf_context_extractor_agent_ray.functions.dedup import (
        corpus_clean_funnel, corpus_clean_funnel_incremental,
        write_funnel_manifest)
    from pdf_context_extractor_agent_ray.functions.text import (
        snapshot_new, snapshot_old)

    man0 = str(tmp_path / "man0")
    write_funnel_manifest(snapshot_old(_docs()), man0)

    scratch_out = str(tmp_path / "scratch_out")
    scratch = corpus_clean_funnel(snapshot_new(_docs()),
                                  output_path=scratch_out)

    inc_out = str(tmp_path / "inc_out")
    man1 = str(tmp_path / "man1")
    rep, st = corpus_clean_funnel_incremental(
        snapshot_new(_docs()), man0, output_path=inc_out,
        output_manifest_path=man1, return_stats=True)

    # the contract: bit-identical report AND survivor set
    assert rep.equals(scratch)
    assert np.array_equal(_survivor_ids(inc_out),
                          _survivor_ids(scratch_out))

    # ...while text-level work stayed delta-bounded
    assert st["mode"] == "incremental"
    # survivor-driven: only delta docs that SURVIVE stage 1 re-feature
    assert 0 < st["n_text_featured"] <= st["n_delta"]
    assert 0 < st["n_delta"] < st["n_new"]
    assert st["n_unchanged"] + st["n_delta"] == st["n_new"]
    assert st["n_text_verify_fetched"] < st["n_new"] // 2

    # run 3 from run 2's manifest: the corpus is now fully unchanged,
    # so ZERO docs re-feature and the report reproduces again
    rep3, st3 = corpus_clean_funnel_incremental(
        snapshot_new(_docs()), man1, return_stats=True)
    assert rep3.equals(scratch)
    assert st3["n_delta"] == 0 and st3["n_text_featured"] == 0
    # run 2's pair memo covers run 3's identical candidate set, so
    # run 3 verifies with ZERO text fetches
    assert st3["n_text_verify_fetched"] == 0
    assert st3["n_pair_memo_hits"] > 0


def test_incremental_distributed_arm_agrees(ray_session, tmp_path):
    from pdf_context_extractor_agent_ray.functions.dedup import (
        corpus_clean_funnel, corpus_clean_funnel_incremental,
        write_funnel_manifest)
    from pdf_context_extractor_agent_ray.functions.text import (
        snapshot_new, snapshot_old)

    man0 = str(tmp_path / "man0")
    write_funnel_manifest(snapshot_old(_docs()), man0)
    scratch = corpus_clean_funnel(snapshot_new(_docs()))

    inc_out = str(tmp_path / "inc_out_dist")
    man1 = str(tmp_path / "man1_dist")
    rep, st = corpus_clean_funnel_incremental(
        snapshot_new(_docs()), man0, driver_max_docs=0,
        output_path=inc_out, output_manifest_path=man1,
        return_stats=True)
    assert rep.equals(scratch)
    assert st["mode"] == "incremental"
    assert 0 < st["n_text_featured"] <= st["n_delta"] < st["n_new"]

    # distributed run-3 from the distributed-arm manifest
    rep3, st3 = corpus_clean_funnel_incremental(
        snapshot_new(_docs()), man1, driver_max_docs=0,
        return_stats=True)
    assert rep3.equals(scratch)
    assert st3["n_delta"] == 0
    assert st3["n_text_verify_fetched"] == 0
    assert st3["n_pair_memo_hits"] > 0


def test_incremental_rebuild_fallback_and_missing_manifest(
        ray_session, tmp_path):
    from pdf_context_extractor_agent_ray.functions.dedup import (
        corpus_clean_funnel, corpus_clean_funnel_incremental,
        write_funnel_manifest)
    from pdf_context_extractor_agent_ray.functions.text import (
        snapshot_new, snapshot_old)

    with pytest.raises(ValueError, match="manifest .* missing"):
        corpus_clean_funnel_incremental(
            snapshot_new(_docs()), str(tmp_path / "nope"))

    man0 = str(tmp_path / "man0")
    write_funnel_manifest(snapshot_old(_docs()), man0)
    scratch = corpus_clean_funnel(snapshot_new(_docs()))
    # a delta budget of 0 forces the disclosed full-rebuild mode,
    # which must still produce the exact report
    rep, st = corpus_clean_funnel_incremental(
        snapshot_new(_docs()), man0, rebuild_delta_frac_e6=0,
        return_stats=True)
    assert st["mode"] == "full_rebuild"
    assert st["n_text_featured"] == st["n_new"]
    assert rep.equals(scratch)
