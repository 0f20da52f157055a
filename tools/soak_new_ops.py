"""Soak the late-r4 join/overlap operators at ~100x sf0.1 scale.

Builds KEY-SHIFTED replicas of the sf0.1 tables (every replica i
shifts its entity keys by i * (max_key + 1) while keeping dates,
prices, nationkeys and types — so each replica is an independent,
internally-consistent copy of the base economy) and checks the exact
UNIFORM-REPLICATION invariant: every grouped integer output must be
exactly ``reps`` x the base-corpus output, value for value. That is an
integer-exact end-to-end check at 60M lineitem / 15M orders / 10M
events without needing a DuckDB recount of the 6-way joins.

Run:  python tools/soak_new_ops.py [--reps 100] [--rebuild]
Results are recorded in SCALE.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# `python tools/soak_new_ops.py` puts tools/ (not the repo root) on
# sys.path; Ray workers additionally need PYTHONPATH (CLAUDE.md), so
# export it for the session this script owns.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
# SOAK_OUT: alternate replica dir for reduced-replication runs
# (r5: no op needs one anymore — part_rank's per-bucket edge index
# removed the 100x spill; see SCALE.md)
OUT = os.environ.get("SOAK_OUT", "/tmp/graft_soak_r2")

# table -> columns that shift per replica -> the key DOMAIN they
# belong to (one stride per domain keeps cross-table references
# consistent inside a replica)
SHIFT_COLS = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
}
DOMAIN_SOURCE = {  # domain -> (table, column) that defines max key
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
}
COPY_TABLES = ("nation", "region")


def build(reps: int) -> None:
    os.makedirs(OUT, exist_ok=True)
    import pyarrow.compute as pc

    stride = {}
    for dom, (tab, col) in DOMAIN_SOURCE.items():
        stride[dom] = int(pc.max(
            pq.read_table(f"{SF}/{tab}.parquet", columns=[col])[col]
        ).as_py()) + 1

    for tab, cols in SHIFT_COLS.items():
        base = pq.read_table(f"{SF}/{tab}.parquet")
        # replicas append as row groups — never reps x base in memory
        with pq.ParquetWriter(f"{OUT}/{tab}.parquet", base.schema) as w:
            for i in range(reps):
                t = base
                for col, dom in cols.items():
                    shifted = pc.add(
                        base[col], pa.scalar(i * stride[dom],
                                             base.schema.field(col).type))
                    t = t.set_column(t.schema.get_field_index(col), col,
                                     shifted)
                w.write_table(t)
        print(f"built {tab}: {reps} x {len(base)} rows", flush=True)
    for tab in COPY_TABLES:
        pq.write_table(pq.read_table(f"{SF}/{tab}.parquet"),
                       f"{OUT}/{tab}.parquet")
        print(f"copied {tab}", flush=True)


def check(reps: int) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pdf_context_extractor_agent_ray.functions import graph as G
    from pdf_context_extractor_agent_ray.functions import relational as R
    from pdf_context_extractor_agent_ray.functions import streamops as S

    # op -> (callable, key columns; every NON-key int column must be
    # exactly reps x the base value)
    OPS = {
        "interorder_gaps": (R.interorder_gaps, ["gap_days"]),
        "promo_revenue": (R.promo_revenue, ["ship_month"]),
        "late_shipment_priority": (R.late_shipment_priority,
                                   ["o_orderpriority"]),
        "returnflag_priority": (R.returnflag_priority, ["l_returnflag"]),
        "nation_trade_volume": (R.nation_trade_volume,
                                ["supp_nation", "cust_nation", "l_year"]),
        "market_share": (R.market_share, ["o_year"]),
        "brand_qty_revenue": (R.brand_qty_revenue, ["p_brand"]),
        "event_user_overlap": (S.event_user_overlap, ["type_a", "type_b"]),
        # distinct users per window: every replica contributes its own
        # shifted users to the SAME time windows
        "active_users_window": (S.active_users_window,
                                ["window_start_us"]),
        # every replica repeats the base per-user day sets on fresh
        # users, so the streak histogram scales x reps exactly
        "activity_streaks": (S.activity_streaks, ["max_streak"]),
        # the Q6 scalar and Q9 rollup replicate uniformly too
        "revenue_change": (R.revenue_change, []),
        "product_type_profit": (R.product_type_profit,
                                ["nation", "l_year"]),
    }

    # key-LISTING ops don't scale x reps — every replica contributes
    # its own shifted winners. Expected = expand each base row into its
    # reps key-shifted copies (same names/amounts), re-rank, compare.
    import pandas as pd
    import pyarrow.compute as pc

    def _stride(dom: str) -> int:
        tab, col = DOMAIN_SOURCE[dom]
        return int(pc.max(
            pq.read_table(f"{SF}/{tab}.parquet", columns=[col])[col]
        ).as_py()) + 1

    def _expand(base: pd.DataFrame, key_col: str, dom: str) -> pd.DataFrame:
        stride = _stride(dom)
        out = pd.concat(
            [base.assign(**{key_col: base[key_col] + i * stride})
             for i in range(reps)], ignore_index=True)
        return out

    def check_returned_item_report():
        base = R.returned_item_report(SF)
        t0 = time.time()
        big = R.returned_item_report(OUT).reset_index(drop=True)
        dt = time.time() - t0
        # global top-k is drawn from the replicas of the base top-k:
        # any base row below the base cut has >= k replica-0 copies of
        # better rows above it (proof in SCALE.md), so expanding the
        # base page and re-ranking is the exact expectation
        expect = _expand(base, "c_custkey", "custkey") \
            .sort_values(["revenue_cents", "c_custkey"],
                         ascending=[False, True]) \
            .head(R.RETURNED_TOPK).reset_index(drop=True)
        return big.equals(expect), dt, len(big)

    def check_excess_qty_suppliers():
        base = R.excess_qty_suppliers(SF).to_pandas()
        t0 = time.time()
        big = R.excess_qty_suppliers(OUT).to_pandas().reset_index(drop=True)
        dt = time.time() - t0
        expect = _expand(base, "s_suppkey", "suppkey") \
            .sort_values("s_suppkey").reset_index(drop=True)
        return big.equals(expect), dt, len(big)

    def check_important_parts():
        # each replica's per-part values equal the base values and the
        # global total is reps x the base total, so running with
        # share_den = base_den * reps keeps the threshold EXACTLY the
        # base threshold (floor(aT/aD) == floor(T/D)) — the survivor
        # set is the base survivors, key-shifted per replica, re-ranked
        base = R.important_parts(SF)
        t0 = time.time()
        big = R.important_parts(
            OUT, share_den=R.important_share_den(SF) * reps) \
            .to_pandas().reset_index(drop=True)
        dt = time.time() - t0
        expect = _expand(base.to_pandas(), "l_partkey", "partkey") \
            .sort_values(["value_cents", "l_partkey"],
                         ascending=[False, True]).reset_index(drop=True)
        return big.equals(expect), dt, len(big)

    def check_min_cost_supplier():
        # winners are replica-local (parts don't cross replicas), so
        # the global top-k re-ranks the expanded FULL base winner set
        # (k=inf below the cut — a base row outside the base top-k can
        # still re-enter when better rows' later replicas sort after
        # it on the partkey tiebreak); both keys shift JOINTLY with
        # the replica index
        full = R.min_cost_supplier(SF, k=1 << 60).to_pandas()
        sp, ss = _stride("partkey"), _stride("suppkey")
        t0 = time.time()
        big = R.min_cost_supplier(OUT).to_pandas().reset_index(drop=True)
        dt = time.time() - t0
        expect = pd.concat(
            [full.assign(l_partkey=full["l_partkey"] + i * sp,
                         s_suppkey=full["s_suppkey"] + i * ss)
             for i in range(reps)], ignore_index=True) \
            .sort_values(["s_acctbal_cents", "n_name", "s_name", "l_partkey"],
                         ascending=[False, True, True, True]) \
            .head(R.MCS_TOPK).reset_index(drop=True)
        return big.equals(expect), dt, len(big)

    def check_key_skew_report():
        # each replica repeats the base fanout distribution with fresh
        # keys: n_keys/n_rows scale x reps; max fanout is unchanged
        # and the ceil-rank percentiles are provably invariant under
        # uniform replication ((100n*q + 99)//100 lands on the same
        # histogram value — the source_quality_gate threshold argument)
        base = R.key_skew_report(SF).to_pandas()
        t0 = time.time()
        big = R.key_skew_report(OUT).to_pandas().reset_index(drop=True)
        dt = time.time() - t0
        expect = base.copy()
        expect["n_keys"] = expect["n_keys"] * reps
        expect["n_rows"] = expect["n_rows"] * reps
        return big.equals(expect.reset_index(drop=True)), dt, len(big)

    def check_part_rank():
        # replicas are edge-disjoint graphs (orderkeys and partkeys
        # both shift), so every replica reproduces the base ranks on
        # shifted nodes; the global top-k re-ranks the expanded FULL
        # base rank table (k=inf — ties interleave across replicas on
        # the partkey tiebreak). The 60M-line corpus also forces the
        # DISTRIBUTED fixpoint path (driver gate is 5M lines).
        full = G.part_rank(SF, k=1 << 60)
        full = full.to_pandas() if hasattr(full, "to_pandas") else full
        sp = _stride("partkey")
        t0 = time.time()
        big = G.part_rank(OUT).to_pandas().reset_index(drop=True)
        dt = time.time() - t0
        expect = pd.concat(
            [full.assign(l_partkey=full["l_partkey"] + i * sp)
             for i in range(reps)], ignore_index=True) \
            .sort_values(["rank_score", "l_partkey"],
                         ascending=[False, True]) \
            .head(G.PART_RANK_TOPK).reset_index(drop=True)
        return big.equals(expect), dt, len(big)

    def check_segment_acctbal_mad():
        # uniform replication preserves every ceil-rank percentile
        # (the key_skew_report argument), and |cents - med| derives
        # from invariant med — so median AND MAD are invariant while
        # the population scales x reps
        base = R.segment_acctbal_mad(SF).to_pandas()
        t0 = time.time()
        big = R.segment_acctbal_mad(OUT).to_pandas().reset_index(drop=True)
        dt = time.time() - t0
        expect = base.copy()
        expect["n_customers"] = expect["n_customers"] * reps
        return big.equals(expect.reset_index(drop=True)), dt, len(big)

    LISTING_OPS = {
        "segment_acctbal_mad": check_segment_acctbal_mad,
        "part_rank": check_part_rank,
        "key_skew_report": check_key_skew_report,
        "returned_item_report": check_returned_item_report,
        "excess_qty_suppliers": check_excess_qty_suppliers,
        "important_parts": check_important_parts,
        "min_cost_supplier": check_min_cost_supplier,
    }

    only = os.environ.get("SOAK_ONLY", "")
    if only:
        OPS = {k: v for k, v in OPS.items() if k in only.split(",")}
        LISTING_OPS = {k: v for k, v in LISTING_OPS.items()
                       if k in only.split(",")}
    skip = os.environ.get("SOAK_SKIP", "")
    if skip:
        # (r5: part_rank no longer needs skipping — the per-bucket
        # edge index removed the per-iteration edge sort, and the
        # 100x soak completes in ~41 s; SCALE.md)
        OPS = {k: v for k, v in OPS.items() if k not in skip.split(",")}
        LISTING_OPS = {k: v for k, v in LISTING_OPS.items()
                       if k not in skip.split(",")}

    failures = 0
    for name, (fn, keys) in OPS.items():
        base = fn(SF).to_pandas()
        if keys:
            base = base.sort_values(keys)
        base = base.reset_index(drop=True)
        t0 = time.time()
        big = fn(OUT).to_pandas()
        if keys:
            big = big.sort_values(keys)
        big = big.reset_index(drop=True)
        dt = time.time() - t0
        expect = base.copy()
        for c in expect.columns:
            if c not in keys:
                expect[c] = expect[c] * reps
        ok = big.equals(expect)
        print(f"{name}: {dt:6.1f} s  rows={len(big)}  "
              f"{'EXACT x' + str(reps) if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures += 1
            print("expected (base x reps):\n", expect.head(10))
            print("got:\n", big.head(10))
    for name, chk in LISTING_OPS.items():
        ok, dt, nrows = chk()
        print(f"{name}: {dt:6.1f} s  rows={nrows}  "
              f"{'EXACT (expansion)' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures += 1
    ray.shutdown()
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--rebuild", action="store_true",
                    help="rebuild replicas even if OUT already exists")
    ap.add_argument("--build-only", action="store_true")
    args = ap.parse_args()
    if args.rebuild or not os.path.exists(f"{OUT}/lineitem.parquet"):
        t0 = time.time()
        build(args.reps)
        print(f"build: {time.time() - t0:.0f} s", flush=True)
    if args.build_only:
        return 0
    return check(args.reps)


if __name__ == "__main__":
    sys.exit(main())
