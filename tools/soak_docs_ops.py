"""Soak the late-r4 DOCUMENT operators at ~100x sf0.1 scale.

Builds key-shifted replicas of the sf0.1 documents table (replica i
shifts doc_id by i * stride, text/lang/source copied verbatim) and
checks three provable invariants on the 500k-doc corpus:

- ``corpus_clean_funnel``: with identical-text replicas, every
  fingerprint group's min doc_id lands in replica 0, so the exact-
  dedup SURVIVOR SET equals the base run's survivors exactly — stages
  1-4 must report the BASE counts while stage 0 reports 100x. The
  stride is rounded up to a multiple of DECONTAM_MODULUS so replica
  membership in the benchmark blocklist set is replica-invariant
  (shifted_id % MOD == base_id % MOD).
- ``source_quality_gate``: a uniformly x100-replicated score
  distribution has the SAME percentile_disc threshold (smallest v
  with 100*C(v) >= ceil(q*100n)  <=>  C(v) >= ceil(q*n)) and exactly
  x100 counts.
- ``lsh_recall_report``: at 100x the all-dup corpus is the exact
  side's O(k^2) worst case, so the BUDGET guard must raise with the
  projected pair-partial count in seconds; the sampled mode
  (sample_mod=32) must then complete and keep
  n_common == n_lsh <= n_exact (the LSH path exact-verifies).

Run:  python tools/soak_docs_ops.py [--reps 100] [--rebuild]
Results are recorded in SCALE.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/graft_soak_docs"  # suffixed per --reps in main()


def _stride() -> int:
    import math

    from pdf_context_extractor_agent_ray.functions.text import (
        DECONTAM_MODULUS, SNAP_MOD)
    max_id = int(pc.max(pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]).as_py())
    raw = max_id + 1
    # round UP to a multiple of BOTH residue moduli (decontam benchmark
    # and recrawl snapshot classes) so (id + i*stride) % MOD ==
    # id % MOD for every replica under either modulus
    mod = math.lcm(DECONTAM_MODULUS, SNAP_MOD)
    return -(-raw // mod) * mod


def build(reps: int) -> None:
    os.makedirs(OUT, exist_ok=True)
    base = pq.read_table(f"{SF}/documents.parquet")
    stride = _stride()
    with pq.ParquetWriter(f"{OUT}/documents.parquet", base.schema) as w:
        for i in range(reps):
            shifted = pc.add(base["doc_id"],
                             pa.scalar(i * stride, pa.int64()))
            w.write_table(base.set_column(
                base.schema.get_field_index("doc_id"), "doc_id", shifted))
    print(f"built documents: {reps} x {len(base)} rows "
          f"(stride {stride})", flush=True)


def check(reps: int) -> int:
    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pdf_context_extractor_agent_ray.functions.dedup import (
        corpus_clean_funnel, lsh_recall_report)
    from pdf_context_extractor_agent_ray.functions.text import (
        source_quality_gate)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs(path):
        return strip_schema_metadata(
            rd.read_parquet(f"{path}/documents.parquet"))

    failures = 0
    n_base = parquet_num_rows(f"{SF}/documents.parquet")
    n_big = parquet_num_rows(f"{OUT}/documents.parquet")
    assert n_big == n_base * reps, (n_big, n_base, reps)

    only = os.environ.get("SOAK_ONLY", "")

    def want(name: str) -> bool:
        return not only or name in only.split(",")

    if want("corpus_clean_funnel"):
        base = corpus_clean_funnel(docs(SF), n_docs=n_base)
        t0 = time.time()
        big = corpus_clean_funnel(docs(OUT), n_docs=n_big)
        dt = time.time() - t0
        expect = base.copy()
        expect.loc[0, "n_docs"] = n_base * reps  # raw scales; rest equal
        ok = big.equals(expect)
        print(f"corpus_clean_funnel: {dt:6.1f} s  "
              f"stages={big['n_docs'].tolist()}  "
              f"{'EXACT (survivor-set invariant)' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            failures += 1
            print("expected:\n", expect, "\ngot:\n", big)

    if want("source_quality_gate"):
        base = source_quality_gate(docs(SF)).to_pandas() \
            .sort_values("source").reset_index(drop=True)
        t0 = time.time()
        big = source_quality_gate(docs(OUT)).to_pandas() \
            .sort_values("source").reset_index(drop=True)
        dt = time.time() - t0
        expect = base.copy()
        for c in ("n_docs", "n_kept", "kept_chars"):
            expect[c] = expect[c] * reps
        ok = big.equals(expect)  # threshold_permille must NOT scale
        print(f"source_quality_gate: {dt:6.1f} s  rows={len(big)}  "
              f"{'EXACT (x' + str(reps) + ', same thresholds)' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            failures += 1
            print("expected:\n", expect, "\ngot:\n", big)

    if want("token_budget_plan"):
        from pdf_context_extractor_agent_ray.functions.text import (
            token_budget_plan)
        base = token_budget_plan(docs(SF)).to_pandas() \
            .reset_index(drop=True)
        t0 = time.time()
        big = token_budget_plan(docs(OUT)).to_pandas() \
            .reset_index(drop=True)
        dt = time.time() - t0
        # allocations depend only on weights + budget, so they are
        # replica-INVARIANT; corpus masses scale x reps and the repeat
        # factor refloors against the bigger mass
        expect = base.copy()
        for c in ("n_docs", "n_tokens"):
            expect[c] = expect[c] * reps
        expect["repeat_e6"] = (expect["alloc_tokens"] * 1_000_000) \
            // expect["n_tokens"]
        ok = big.equals(expect)
        print(f"token_budget_plan: {dt:6.1f} s  rows={len(big)}  "
              f"{'EXACT (invariant allocs, x' + str(reps) + ' masses)' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            failures += 1
            print("expected:\n", expect, "\ngot:\n", big)

    if want("recrawl_delta"):
        from pdf_context_extractor_agent_ray.functions.text import (
            recrawl_delta, snapshot_new, snapshot_old)
        import pandas as pd

        def _df(x):
            return (x if isinstance(x, pd.DataFrame) else x.to_pandas()) \
                .reset_index(drop=True)

        base = _df(recrawl_delta(snapshot_old(docs(SF)),
                                 snapshot_new(docs(SF)), n_docs=n_base))
        t0 = time.time()
        big = _df(recrawl_delta(snapshot_old(docs(OUT)),
                                snapshot_new(docs(OUT)), n_docs=n_big))
        dt = time.time() - t0
        # stride is a SNAP_MOD multiple, so residue classes (and hence
        # per-source class counts) replicate exactly x reps
        expect = base.copy()
        for c in ("n_unchanged", "n_changed", "n_added", "n_deleted"):
            expect[c] = expect[c] * reps
        ok = big.equals(expect)
        print(f"recrawl_delta: {dt:6.1f} s  rows={len(big)}  "
              f"{'EXACT x' + str(reps) if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures += 1
            print("expected:\n", expect, "\ngot:\n", big)

    if want("funnel_incremental"):
        # r5: the CDC loop at 500k docs, distributed arm (above the
        # 200k driver gate): run 1 manifests snapshot_old, run 2
        # cleans snapshot_new incrementally and must equal the
        # from-scratch funnel report while featuring only the delta
        from pdf_context_extractor_agent_ray.functions.dedup import (
            corpus_clean_funnel_incremental, write_funnel_manifest)
        from pdf_context_extractor_agent_ray.functions.text import (
            snapshot_new, snapshot_old)

        man = "/tmp/graft_soak_inc_manifest"
        t0 = time.time()
        write_funnel_manifest(snapshot_old(docs(OUT)), man)
        t_man = time.time() - t0
        t0 = time.time()
        scratch = corpus_clean_funnel(snapshot_new(docs(OUT)))
        t_scratch = time.time() - t0
        t0 = time.time()
        rep, st = corpus_clean_funnel_incremental(
            snapshot_new(docs(OUT)), man, return_stats=True)
        t_inc = time.time() - t0
        ok = rep.equals(scratch) and st["mode"] == "incremental" \
            and st["n_text_featured"] <= st["n_delta"] < st["n_new"]
        print(f"funnel_incremental: manifest {t_man:.1f} s, scratch "
              f"{t_scratch:.1f} s, incremental {t_inc:.1f} s  "
              f"delta={st['n_delta']}/{st['n_new']} "
              f"verify_fetch={st['n_text_verify_fetched']}  "
              f"{'EXACT (== from-scratch)' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            failures += 1
            print("expected:\n", scratch, "\ngot:\n", rep, "\n", st)

    if want("lsh_recall_report"):
        # r5: the exact side is BUDGETED. On a dup-dense corpus the
        # guard must raise with the projected pair-partial count in
        # seconds (never the r4 hung-cluster 600M-partial expansion),
        # and the sampled mode must then complete under the budget.
        t0 = time.time()
        mode = "full"
        try:
            rep = lsh_recall_report(docs(OUT), n_docs=n_big)
        except ValueError as ex:
            print(f"lsh_recall_report: guard raised in "
                  f"{time.time() - t0:4.1f} s — {ex}", flush=True)
            t0 = time.time()
            mode = "sampled mod=32"
            rep = lsh_recall_report(docs(OUT), sample_mod=32)
        dt = time.time() - t0
        row = rep.iloc[0]
        ok = (row["n_common_pairs"] == row["n_lsh_pairs"]
              <= row["n_exact_pairs"] and row["n_exact_pairs"] > 0)
        print(f"lsh_recall_report [{mode}]: {dt:6.1f} s  "
              f"exact={row['n_exact_pairs']} lsh={row['n_lsh_pairs']} "
              f"common={row['n_common_pairs']}  "
              f"{'OK (verified-subset invariant)' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            failures += 1
    ray.shutdown()
    return failures


def main() -> int:
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--build-only", action="store_true")
    args = ap.parse_args()
    if args.reps != 100:
        OUT = f"{OUT}_r{args.reps}"
    if args.rebuild or not os.path.exists(f"{OUT}/documents.parquet"):
        t0 = time.time()
        build(args.reps)
        print(f"build: {time.time() - t0:.0f} s", flush=True)
    if args.build_only:
        return 0
    return check(args.reps)


if __name__ == "__main__":
    sys.exit(main())
