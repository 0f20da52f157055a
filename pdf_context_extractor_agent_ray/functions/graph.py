"""Graph analytics over derived entity graphs — the iterative-numeric
family (``dedup.dup_clusters`` is the iterative-LABEL family).

``part_rank`` runs PageRank over the part co-purchase graph (parts
co-occurring in an order are linked; edge weight = number of shared
(order, pair) co-occurrences) in EXACT integer arithmetic: every
contribution is a floor division, every update a bounded integer sum,
so the result is bit-identical between the numpy driver path, the
co-bucketed distributed path, and the DuckDB oracle's chained-CTE
twin — no float enters the fixpoint. Not a reference operator (the
reference has no graph engine); the shape is the standard damped
PageRank (Page et al. 1999) with a FIXED iteration count so the
distributed plan is static.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# damped PageRank, all-integer: r0 = SCALE per node;
# r_{t+1}(v) = BASE + sum_u (DAMP_NUM * r_t(u) * w_uv)
#                         // (DAMP_DEN * wout_u)
# with BASE = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN
PART_RANK_DAMP_NUM = 85
PART_RANK_DAMP_DEN = 100
PART_RANK_SCALE = 1_000_000_000
PART_RANK_BASE = ((PART_RANK_DAMP_DEN - PART_RANK_DAMP_NUM)
                  * PART_RANK_SCALE // PART_RANK_DAMP_DEN)
PART_RANK_ITERS = 3
PART_RANK_TOPK = 100
# lineitem tables up to this many rows run the exact numpy driver
# fold; above it the co-bucketed distributed path (same integers)
PART_RANK_DRIVER_MAX_LINES = 5_000_000
PART_RANK_ROWS_PER_BUCKET = 1_000_000

_COLS = ("bucket", "u", "v", "w", "wout", "kind", "val")


def _check_headroom(r_max: int, w_max: int,
                    wout_max: int | None = None) -> None:
    """Loud overflow guard: the contribution product AND the
    denominator product must fit int64 on every path (numpy wraps
    silently; DuckDB would widen to HUGEINT and silently diverge from
    a wrapped engine value)."""
    if PART_RANK_DAMP_NUM * int(r_max) * int(w_max) >= 2 ** 63:
        raise ValueError(
            f"part_rank int64 overflow: max rank {r_max} x max weight "
            f"{w_max} exceeds the 2^63 contribution headroom — shrink "
            f"PART_RANK_SCALE or split the graph")
    if wout_max is not None \
            and PART_RANK_DAMP_DEN * int(wout_max) >= 2 ** 63:
        raise ValueError(
            f"part_rank int64 overflow: max out-weight {wout_max} "
            f"exceeds the 2^63 denominator headroom")


def _check_mass(n_nodes_upper: int, iters: int) -> None:
    """Loud accumulation guard: every rank and every per-node partial
    sum is bounded by the TOTAL mass, and (damping < 1) the mass after
    t iterations is at most n * (SCALE + BASE * t) — all contributions
    are positive, so if that bound fits int64, no ``np.add.at`` /
    pandas sum can wrap. Checked a priori from a node-count UPPER
    bound (lineitem rows bound the node count), so the guard needs no
    pass over the data."""
    if n_nodes_upper * (PART_RANK_SCALE + PART_RANK_BASE * iters) >= 2 ** 63:
        raise ValueError(
            f"part_rank int64 overflow: {n_nodes_upper} potential nodes "
            f"x (SCALE + BASE * {iters}) exceeds the 2^63 total-mass "
            f"headroom — shrink PART_RANK_SCALE or split the graph")


def _pairs_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Ordered co-purchase pairs of one (orderkey, partkey) frame:
    distinct parts per order, then every (u, v) with u != v via one
    self-merge — vectorized across ALL orders in the frame at once
    (no per-order Python loop; parts-per-order is bounded by the
    order's line count, so the merge fanout is bounded per row)."""
    dl = df[["l_orderkey", "l_partkey"]].drop_duplicates()
    m = dl.merge(dl, on="l_orderkey", suffixes=("_u", "_v"))
    m = m[m["l_partkey_u"] != m["l_partkey_v"]]
    return m.rename(columns={"l_partkey_u": "u",
                             "l_partkey_v": "v"})[["u", "v"]]


def _rank_numpy(u: np.ndarray, v: np.ndarray, w: np.ndarray,
                iters: int = PART_RANK_ITERS):
    """The integer fixpoint on factorized edge arrays. Returns
    (node_ids_sorted, ranks). Uses ``np.add.at`` (exact int64
    accumulation) — never ``bincount(weights=...)``, whose float64
    cast loses exactness above 2^53."""
    nodes = np.unique(u)  # == unique(v): the graph is symmetric
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    wout = np.zeros(len(nodes), np.int64)
    np.add.at(wout, ui, w)
    _check_mass(len(nodes), iters)
    r = np.full(len(nodes), PART_RANK_SCALE, np.int64)
    for _ in range(iters):
        _check_headroom(int(r.max(initial=0)), int(w.max(initial=0)),
                        int(wout.max(initial=0)))
        contrib = (PART_RANK_DAMP_NUM * r[ui] * w) \
            // (PART_RANK_DAMP_DEN * wout[ui])
        nxt = np.full(len(nodes), PART_RANK_BASE, np.int64)
        np.add.at(nxt, vi, contrib)
        r = nxt
    return nodes, r


def _topk_frame(df: pd.DataFrame, k: int) -> pd.DataFrame:
    out = df.sort_values(["rank_score", "l_partkey"],
                         ascending=[False, True], kind="mergesort").head(k)
    return out.reset_index(drop=True).astype(
        {"l_partkey": "int64", "rank_score": "int64"})


def _group_ranks(df: pd.DataFrame) -> pd.Series:
    """Rank values for one node bucket from its partial rows.
    Iteration 1 sees complete seed ranks (kind 1, summed verbatim);
    every later iteration sees contribution partials (kind 2, summed
    plus the damping BASE added exactly once here). Seeds keep riding
    the union after iteration 1 and are IGNORED whenever kind-2 rows
    exist — every node has in-edges (the graph is symmetric), so
    kind-2 presence is bucket-wide, never per-node."""
    k2 = df[df["kind"] == 2]
    if len(k2):
        return k2.groupby("u")["val"].sum() + PART_RANK_BASE
    return df[df["kind"] == 1].groupby("u")["val"].sum()


def part_rank(sf_dir: str, k: int = PART_RANK_TOPK,
              iters: int = PART_RANK_ITERS,
              num_buckets: int | None = None,
              driver_max_lines: int = PART_RANK_DRIVER_MAX_LINES):
    """Top-k parts by integer PageRank over the co-purchase graph.
    Output: (l_partkey, rank_score), sorted (rank desc, partkey asc).

    Shape at scale: pair generation buckets lineitem by the ORDERKEY
    hash (an order's parts must meet; the re-distinct inside the
    bucket fold is global-exact because an order's rows all share its
    bucket) and emits (u, v) pair partials already re-keyed to the U
    hash; one exchange later every u-bucket merges its edge weights
    AND derives its out-weights in the same fold, so edge rows are
    born carrying their denominator, plus one seed rank row per node.
    Each PageRank iteration is then exactly ONE exchange: the static
    edge+seed dataset (materialized once) unions the previous
    iteration's contribution partials, each node bucket folds its
    rank (``_group_ranks``) and emits the next contributions keyed by
    hash(v). After ``iters`` contribution exchanges a final fold
    emits (node, rank); per-block top-k bounds the single-partition
    finish. Re-shipping the static edges each iteration is the
    Dataset-native trade versus an actor-held mutable partition index
    (``SURVEY §2`` custom-operator ladder, option (a)). Below
    ``driver_max_lines`` lineitem rows the whole fixpoint runs as the
    exact numpy driver fold — same integers, dual-path tested."""
    from .relational import _read
    from .util import bucket_count, bucket_hash, parquet_num_rows

    n_lines = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    # node count is bounded by distinct parts <= lineitem rows, so the
    # accumulation guard holds for BOTH paths before any data moves
    _check_mass(n_lines, iters)
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    if n_lines <= driver_max_lines:
        dl = ds.to_pandas()
        pairs = _pairs_frame(dl)
        e = pairs.groupby(["u", "v"], as_index=False).size() \
            .rename(columns={"size": "w"})
        if not len(e):
            return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                                 "rank_score": pd.Series([], dtype="int64")})
        nodes, r = _rank_numpy(e["u"].to_numpy(np.int64),
                               e["v"].to_numpy(np.int64),
                               e["w"].to_numpy(np.int64), iters)
        return _topk_frame(
            pd.DataFrame({"l_partkey": nodes, "rank_score": r}), k)

    # ---- distributed path ----
    if num_buckets is None:
        num_buckets = bucket_count(n_lines, PART_RANK_ROWS_PER_BUCKET)

    def _ship(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = bucket_hash(df["u"].to_numpy(np.int64), num_buckets)
        for c in _COLS:
            if c not in df.columns:
                df[c] = np.int64(0)
        return df[list(_COLS)].astype({c: "int64" for c in _COLS})

    def by_order(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
        })
        return t.append_column("bucket", pa.array(bucket_hash(
            t["l_orderkey"].to_numpy(zero_copy_only=False), num_buckets),
            pa.int64()))

    def pair_fold(df: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_frame(df)
        p = p.groupby(["u", "v"], as_index=False).size() \
            .rename(columns={"size": "w"})
        return _ship(p)

    def edge_seed_fold(df: pd.DataFrame) -> pd.DataFrame:
        # merge duplicate (u, v) weight partials, derive wout, and
        # emit the kind-1 seed rank row per node IN the same
        # group-local fold (exact-once: downstream block splitting
        # can never duplicate what a single group emitted once)
        e = df.groupby(["u", "v"], as_index=False)["w"].sum()
        e["wout"] = e.groupby("u")["w"].transform("sum")
        e["kind"] = np.int64(0)
        seeds = pd.DataFrame({
            "u": e["u"].drop_duplicates().to_numpy(np.int64)})
        seeds["kind"] = np.int64(1)
        seeds["val"] = np.int64(PART_RANK_SCALE)
        return pd.concat([_ship(e), _ship(seeds)], ignore_index=True)

    edges_seeded = ds.map_batches(by_order, batch_format="pyarrow",
                                  batch_size=None) \
        .groupby("bucket").map_groups(pair_fold, batch_format="pandas") \
        .groupby("bucket").map_groups(edge_seed_fold,
                                      batch_format="pandas") \
        .materialize()

    def contrib_fold(df: pd.DataFrame) -> pd.DataFrame:
        rsum = _group_ranks(df)
        e = df[df["kind"] == 0]
        r = e["u"].map(rsum).to_numpy(np.int64)  # loud on any miss
        w = e["w"].to_numpy(np.int64)
        _check_headroom(int(r.max(initial=0)), int(w.max(initial=0)),
                        int(e["wout"].max()) if len(e) else 0)
        contrib = (PART_RANK_DAMP_NUM * r * w) \
            // (PART_RANK_DAMP_DEN * e["wout"].to_numpy(np.int64))
        out = pd.DataFrame({"u": e["v"].to_numpy(np.int64),
                            "val": contrib}) \
            .groupby("u", as_index=False)["val"].sum()
        out["kind"] = np.int64(2)
        return _ship(out)

    def rank_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = _group_ranks(df).reset_index()
        return _topk_frame(pd.DataFrame({
            "l_partkey": out["u"].to_numpy(np.int64),
            "rank_score": out["val"].to_numpy(np.int64)}), k)

    # MATERIALIZE each iteration's contributions: chaining all
    # iterations into one lazy DAG stacks every sort barrier and every
    # union's buffered edge copy into a single streaming execution —
    # measured at the 100x soak, object-store backpressure throttled
    # the first fold to ONE concurrent task (50/280 blocks in 10 min,
    # 31 workers idle). Checkpointing per iteration makes each
    # exchange a standalone sort+fold that runs at full width, and is
    # also the natural resume point for a preempted fixpoint.
    cur = edges_seeded
    for _ in range(iters):
        contribs = cur.groupby("bucket").map_groups(
            contrib_fold, batch_format="pandas").materialize()
        cur = edges_seeded.union(contribs)
    ranked = cur.groupby("bucket").map_groups(rank_fold,
                                              batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return _topk_frame(df, k)

    return ranked.repartition(1).map_batches(finish, batch_format="pandas",
                                             batch_size=None)
