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

CONTRACT: both fixpoint paths require a SYMMETRIC edge set (every
directed edge (u, v) has its mirror (v, u) — the co-purchase pair
expansion emits both directions by construction). Symmetry is what
guarantees every node with out-edges also receives contribution
partials each iteration; on a directed graph an in-edge-less source
node would have no rank row, which the distributed fold detects and
raises on loudly (``_rank_or_raise``) instead of silently mis-ranking.
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

# edge rows (static, exchanged once) and contribution-partial rows
# (the only thing exchanged per iteration — 24 B/row)
_EDGE_COLS = ("bucket", "u", "v", "w", "wout")
_PARTIAL_COLS = ("bucket", "u", "val")


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


def _bucket_ranks(df: pd.DataFrame) -> pd.Series:
    """Ranks for one node bucket from its complete contribution
    partials: r(v) = BASE + sum of partials — exactly ``_rank_numpy``'s
    ``nxt`` update (integer addition is order-independent, so partial
    merge order never matters)."""
    return df.groupby("u")["val"].sum() + PART_RANK_BASE


def _rank_or_raise(e_u: pd.Series, ranks: pd.Series) -> np.ndarray:
    """Look up each edge source's rank; raise loudly if any source has
    no rank row (violates the module's symmetric-graph contract — on a
    directed graph an in-edge-less source would otherwise be silently
    mis-ranked)."""
    r = e_u.map(ranks)
    if r.isna().any():
        missing = e_u[r.isna()].unique()[:5]
        raise ValueError(
            "part_rank: edge sources with no contribution partials "
            f"(e.g. {missing.tolist()}) — the graph is not symmetric; "
            "see the module contract")
    return r.to_numpy(np.int64)


def _bucket_edge_index(edges) -> dict[int, list]:
    """Split the materialized bucketed edge dataset ONCE into a
    per-bucket object-store index {bucket: [table refs]}: one remote
    task per edge block slices it by bucket run (blocks can straddle
    buckets after dynamic block splitting) and ``ray.put``s each
    sub-table. Edge bytes stay distributed in plasma — the driver
    keeps only the ref map — and each iteration's fold fetches exactly
    its own bucket's tables, so the static edges never re-enter an
    exchange. Sub-table refs are owned by the split workers; a lost
    worker surfaces as a loud OwnerDiedError in the fold, never a
    silent wrong rank."""
    import ray

    @ray.remote
    def split(tbl: pa.Table) -> list:
        if tbl.num_rows == 0:
            return []
        arrs = {c: tbl.column(c).to_numpy(zero_copy_only=False)
                for c in _EDGE_COLS}
        order = np.argsort(arrs["bucket"], kind="stable")
        arrs = {c: a[order] for c, a in arrs.items()}
        b = arrs["bucket"]
        bounds = np.flatnonzero(np.diff(b)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(b)]))
        return [(int(b[s]),
                 ray.put(pa.table({c: a[s:e] for c, a in arrs.items()})))
                for s, e in zip(starts, ends)]

    index: dict[int, list] = {}
    for part in ray.get([split.remote(ref)
                         for ref in edges.to_arrow_refs()]):
        for bucket, ref in part:
            index.setdefault(bucket, []).append(ref)
    return index


def _fetch_bucket_edges(index: dict[int, list], bucket: int) -> pd.DataFrame:
    """One bucket's complete static edge table from the cached index.
    A bucket that received contribution partials but has no cached
    edges violates the symmetric-graph contract — loud, never empty."""
    import ray

    refs = index.get(bucket)
    if not refs:
        raise ValueError(
            f"part_rank: contribution partials arrived for bucket "
            f"{bucket} but no cached edge table exists — the graph is "
            "not symmetric; see the module contract")
    return pa.concat_tables(ray.get(refs)).to_pandas()


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
    born carrying their denominator. The bucketed edge blocks are then
    SPLIT ONCE into a per-bucket object-store index
    (``_bucket_edge_index``) and never enter an exchange again:
    iteration 1's contributions are a pure streaming ``map_batches``
    over the materialized edges (seed rank is the constant SCALE, so
    no rank lookup is needed), and every later iteration exchanges
    ONLY the (bucket, node, val) contribution partials — 24 B/row,
    O(nodes)-bounded after the in-fold partial sum — while each node
    bucket's fold fetches its own static edge table by ref (plasma
    read, no sort, no re-ship). This replaces round 4's
    edges.union(contribs) re-sort, whose per-iteration O(edges) sort
    spill exceeded a single box's disk at the 100x soak (230M edges,
    SCALE.md). Per-iteration ``materialize()`` stays: it is the
    checkpoint that keeps each exchange a standalone full-width sort
    (the chained-DAG backpressure lesson) and the natural resume
    point. Below ``driver_max_lines`` lineitem rows the whole
    fixpoint runs as the exact numpy driver fold — same integers,
    dual-path tested."""
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

    def _ship_partials(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = bucket_hash(df["u"].to_numpy(np.int64), num_buckets)
        return df[list(_PARTIAL_COLS)].astype(
            {c: "int64" for c in _PARTIAL_COLS})

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
        p["bucket"] = bucket_hash(p["u"].to_numpy(np.int64), num_buckets)
        return p[list(_EDGE_COLS[:-1])].astype(
            {c: "int64" for c in _EDGE_COLS[:-1]})

    def edge_fold(df: pd.DataFrame) -> pd.DataFrame:
        # merge duplicate (u, v) weight partials and derive wout in
        # the same group-local fold, so every edge row is born
        # carrying its denominator (no seed rows: iteration 1's rank
        # is the constant SCALE)
        e = df.groupby(["u", "v"], as_index=False)["w"].sum()
        e["wout"] = e.groupby("u")["w"].transform("sum")
        e["bucket"] = df["bucket"].iloc[0]
        return e[list(_EDGE_COLS)].astype({c: "int64" for c in _EDGE_COLS})

    edges = ds.map_batches(by_order, batch_format="pyarrow",
                           batch_size=None) \
        .groupby("bucket").map_groups(pair_fold, batch_format="pandas") \
        .groupby("bucket").map_groups(edge_fold, batch_format="pandas") \
        .materialize()
    edge_index = _bucket_edge_index(edges)

    def seed_contrib(df: pd.DataFrame) -> pd.DataFrame:
        # iteration 1 as a pure streaming pass: r0 = SCALE for every
        # node, so each edge's contribution needs no rank lookup.
        # Batches may split a bucket mid-way — safe, these are
        # mergeable partials re-summed by the next fold.
        w = df["w"].to_numpy(np.int64)
        _check_headroom(PART_RANK_SCALE, int(w.max(initial=0)),
                        int(df["wout"].max()) if len(df) else 0)
        contrib = (PART_RANK_DAMP_NUM * PART_RANK_SCALE * w) \
            // (PART_RANK_DAMP_DEN * df["wout"].to_numpy(np.int64))
        out = pd.DataFrame({"u": df["v"].to_numpy(np.int64),
                            "val": contrib}) \
            .groupby("u", as_index=False)["val"].sum()
        return _ship_partials(out)

    def contrib_fold(df: pd.DataFrame) -> pd.DataFrame:
        # one complete node bucket's partials -> its ranks -> the next
        # iteration's contributions, using the bucket's CACHED static
        # edge table (fetched by ref — never re-exchanged)
        ranks = _bucket_ranks(df)
        e = _fetch_bucket_edges(edge_index, int(df["bucket"].iloc[0]))
        r = _rank_or_raise(e["u"], ranks)
        w = e["w"].to_numpy(np.int64)
        _check_headroom(int(r.max(initial=0)), int(w.max(initial=0)),
                        int(e["wout"].max()) if len(e) else 0)
        contrib = (PART_RANK_DAMP_NUM * r * w) \
            // (PART_RANK_DAMP_DEN * e["wout"].to_numpy(np.int64))
        out = pd.DataFrame({"u": e["v"].to_numpy(np.int64),
                            "val": contrib}) \
            .groupby("u", as_index=False)["val"].sum()
        return _ship_partials(out)

    def rank_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = _bucket_ranks(df).reset_index()
        return _topk_frame(pd.DataFrame({
            "l_partkey": out["u"].to_numpy(np.int64),
            "rank_score": out["val"].to_numpy(np.int64)}), k)

    # MATERIALIZE each iteration's partials: chaining all iterations
    # into one lazy DAG stacks every sort barrier into a single
    # streaming execution — measured at the 100x soak, object-store
    # backpressure throttled the first fold to ONE concurrent task
    # (50/280 blocks in 10 min, 31 workers idle). Checkpointing per
    # iteration keeps each exchange a standalone full-width sort+fold
    # and is the natural resume point for a preempted fixpoint.
    cur = edges.map_batches(seed_contrib, batch_format="pandas") \
        .materialize()
    del edges  # release the original edge blocks; the index holds all
    for _ in range(iters - 1):
        cur = cur.groupby("bucket").map_groups(
            contrib_fold, batch_format="pandas").materialize()
    ranked = cur.groupby("bucket").map_groups(rank_fold,
                                              batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return _topk_frame(df, k)

    return ranked.repartition(1).map_batches(finish, batch_format="pandas",
                                             batch_size=None)
