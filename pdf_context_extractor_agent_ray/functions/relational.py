"""Relational engine primitives, Ray-Data-first.

These exercise the generic capabilities every pipeline needs — filter,
project, grouped aggregate, broadcast join, windowed aggregate,
top-k — with the at-scale patterns baked in:

- **pre-aggregation**: partial sums per batch inside ``map_batches``
  (one row per key per batch) BEFORE the shuffle groupby, so the
  all-to-all moves keys, not rows;
- **broadcast join**: small dimension tables ship once via ``ray.put``
  and join as dict lookups per batch — no shuffle;
- **top-k**: per-batch partial top-k, then a single tiny sort.

All money aggregates are integer-scaled (``*_cents``) so the DuckDB
oracles hash identically (no float-sum ordering noise).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .util import table_from_pandas


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    from .util import strip_schema_metadata
    # metadata-free blocks keep downstream groupby/join reduces on the
    # hashable-schema fast path (util.strip_schema_metadata)
    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns))


def _finish_grouped_sums(partials, keys: list[str]):
    """Bounded-key finish: see ``functions.util.finish_grouped``."""
    from .util import finish_grouped
    return finish_grouped(partials, keys)


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-01"):
    """TPC-H Q1-shaped grouped aggregate with per-batch partials."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff_ts))
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        tmp = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": pc.cast(pc.round(pc.multiply(batch["l_quantity"], 100), round_mode="half_towards_infinity"), pa.int64()),
            "price_c": pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100), round_mode="half_towards_infinity"), pa.int64()),
            "disc_c": pc.cast(pc.round(pc.multiply(disc_price, 100), round_mode="half_towards_infinity"), pa.int64()),
        })
        # partial combine: one row per (flag, status) per batch —
        # Arrow-native group_by, no full-batch pandas conversion
        return tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"),
             ("disc_c", "sum"), ("qty_c", "count")]) \
            .rename_columns(["l_returnflag", "l_linestatus",
                             "sum_qty_cents", "sum_price_cents",
                             "sum_disc_price_cents", "n_rows"])

    return _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"])


# customer dimensions up to this many bytes on disk broadcast as a
# driver dict; above it (TPC-H sf10k has 1.5B customers) the dimension
# joins hash-partitioned — a driver dict there is an OOM
CUSTOMER_DIM_BROADCAST_MAX_BYTES = 256 << 20


def top_customers(sf_dir: str, k: int = 10,
                  broadcast_max_bytes: int = CUSTOMER_DIM_BROADCAST_MAX_BYTES):
    """Revenue top-k over the customer dimension: orders pre-aggregate
    per customer, then the dimension attaches — broadcast dict below
    ``broadcast_max_bytes`` of dimension parquet, hash-partitioned
    ``Dataset.join`` above (same gate pattern as order_revenue_topk).
    Both paths are inner-join semantics and tested for agreement."""
    import os
    import ray
    from ray.data.aggregate import Sum
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "price_c": pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100), round_mode="half_towards_infinity"), pa.int64()),
        }).group_by("o_custkey").aggregate(
            [("price_c", "sum"), ("price_c", "count")]) \
            .rename_columns(["o_custkey", "revenue_cents", "n_orders"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                                        Sum("n_orders", alias_name="n_orders"))

    try:
        dim_bytes = os.path.getsize(f"{sf_dir}/customer.parquet")
    except OSError:
        dim_bytes = 0

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "o_custkey"],
                              ascending=[False, True]).head(k)

    if dim_bytes <= broadcast_max_bytes:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_name", "c_mktsegment"])
        lookup = {k_: (n, s) for k_, n, s in zip(cust["c_custkey"].to_pylist(),
                                                 cust["c_name"].to_pylist(),
                                                 cust["c_mktsegment"].to_pylist())}
        ref = ray.put(lookup)

        def partial_rank(df: pd.DataFrame) -> pd.DataFrame:
            # inner-join semantics (match the oracle): custkeys with no
            # customer row drop BEFORE ranking, never fabricate blanks.
            # Per-block partial top-k: the aggregate emits each key
            # once, so top-k of per-block top-ks is exact — the
            # single-partition finisher sees k rows per block, not one
            # row per customer.
            lk = ray.get(ref)
            df = df[df["o_custkey"].isin(lk.keys())]
            return rank(df)

        def attach_and_rank(df: pd.DataFrame) -> pd.DataFrame:
            lk = ray.get(ref)
            df = rank(df).copy()
            df["c_name"] = [lk[c][0] for c in df["o_custkey"]]
            df["c_mktsegment"] = [lk[c][1] for c in df["o_custkey"]]
            return df

        return agg.map_batches(partial_rank, batch_format="pandas") \
            .repartition(1).map_batches(attach_and_rank, batch_format="pandas")

    # at-scale path: the per-customer aggregate (one row per custkey)
    # joins the dimension hash-partitioned on the customer key, then
    # per-block partial top-k so the finisher never holds the dimension
    cpus = int(ray.cluster_resources().get("CPU", 4))
    num_partitions = min(max(2, cpus // 2),
                         max(2, -(-dim_bytes // (128 << 20))))
    cust_ds = _read(sf_dir, "customer",
                    ["c_custkey", "c_name", "c_mktsegment"])
    j = agg.join(cust_ds, "inner", num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))

    def project_rank(df: pd.DataFrame) -> pd.DataFrame:
        return rank(df)[["o_custkey", "revenue_cents", "n_orders",
                         "c_name", "c_mktsegment"]]

    return j.map_batches(project_rank, batch_format="pandas") \
        .repartition(1).map_batches(project_rank, batch_format="pandas")


def events_windowed(sf_dir: str):
    """Tumbling 1-hour windowed aggregate over the events stream table:
    window key computed per batch (epoch-hour bucket), partial counts
    pre-aggregated, then the small bounded-key finish (windows grow
    with TIME, not corpus size)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.cast(pc.floor_temporal(batch["ts"], unit="hour"), pa.int64())
        return pa.table({
            "window_start_us": hour,
            "event_type": batch["event_type"],
            "value_c": pc.cast(pc.round(pc.multiply(batch["value"], 100), round_mode="half_towards_infinity"), pa.int64()),
        }).group_by(["window_start_us", "event_type"]).aggregate(
            [("value_c", "count"), ("value_c", "sum")]) \
            .rename_columns(["window_start_us", "event_type",
                             "n_events", "sum_value_cents"])

    return _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_start_us", "event_type"])


def filter_sort_topk(sf_dir: str, k: int = 20):
    """Filter + project + global top-k via per-batch partial top-k
    (never a full sort of the input)."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        t = pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
            "price_cents": pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100), round_mode="half_towards_infinity"),
                                   pa.int64()),
        })
        idx = pc.sort_indices(t, sort_keys=[("price_cents", "descending"),
                                            ("l_orderkey", "ascending"),
                                            ("l_linenumber", "ascending")])
        return t.take(idx[:k])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["price_cents", "l_orderkey", "l_linenumber"],
                              ascending=[False, True, True]).head(k)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(final, batch_format="pandas")


def order_revenue_topk(sf_dir: str, k: int = 10, segment: str = "BUILDING",
                       cutoff: str = "1995-03-15", num_partitions: int | None = None):
    """TPC-H Q3-shaped pipeline: broadcast semi-join on the small side
    (customer segment filter), hash-partitioned ``Dataset.join`` for the
    large-large lineitem⋈orders exchange, pre-aggregated revenue, tiny
    final top-k. Partitioning key: the order key, reused by the join
    AND the groupby so the second exchange is co-partitioned."""
    import ray
    import pyarrow.parquet as pq

    if num_partitions is None:
        # join aggregators are actors: keep the pool well under the
        # cluster CPU count or the exchange can't schedule — and size
        # by input bytes so a small join doesn't pay 16 actor startups
        # (~128 MB of fact-table input per aggregator)
        import os
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            nbytes = os.path.getsize(f"{sf_dir}/lineitem.parquet") \
                + os.path.getsize(f"{sf_dir}/orders.parquet")
        except OSError:
            nbytes = 0
        by_size = max(2, -(-nbytes // (128 << 20)))
        num_partitions = min(max(2, cpus // 2), by_size)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"]
    ref = ray.put(keys.combine_chunks())
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        batch = batch.filter(pc.less(batch["o_orderdate"], cutoff_ts))
        batch = batch.filter(pc.is_in(batch["o_custkey"], value_set=wanted))
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_orderdate_us": pc.cast(batch["o_orderdate"], pa.int64())})

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def filter_lineitem(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cutoff_ts))
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"), pa.int64()),
        })

    o = orders.map_batches(filter_orders, batch_format="pyarrow")
    l = lineitem.map_batches(filter_lineitem, batch_format="pyarrow")
    joined = l.join(o, "inner", num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",))

    from ray.data.aggregate import Sum
    agg = joined.groupby(["l_orderkey", "o_orderdate_us"]).aggregate(
        Sum("rev_c", alias_name="revenue_cents"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "l_orderkey"],
                              ascending=[False, True]).head(k)

    # per-block partial top-k first (each order key appears once after
    # the aggregate), so the single partition receives k rows per block
    return agg.map_batches(final, batch_format="pandas") \
        .repartition(1).map_batches(final, batch_format="pandas")


def region_rollup(sf_dir: str):
    """customer → nation → region rollup via broadcast dimension maps
    (region/nation are tiny: classic broadcast-join shape)."""
    import ray
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    ref = ray.put((n2r, r2name))

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        n2r_, r2name_ = ray.get(ref)
        nk = batch["c_nationkey"].to_pylist()
        names = [r2name_[n2r_[n]] for n in nk]
        return pa.table({
            "r_name": pa.array(names, pa.string()),
            "bal_c": pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100), round_mode="half_towards_infinity"), pa.int64()),
        }).group_by("r_name").aggregate(
            [("bal_c", "count"), ("bal_c", "sum")]) \
            .rename_columns(["r_name", "n_customers", "sum_acctbal_cents"])

    return _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"), ["r_name"])


def segment_stats(sf_dir: str):
    """Distinct-ish aggregate: customers per market segment
    (pre-aggregated per batch, bounded-key finish)."""
    import pandas as pd

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "bal_c": pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100), round_mode="half_towards_infinity"), pa.int64()),
        }).group_by("c_mktsegment").aggregate(
            [("bal_c", "count"), ("bal_c", "sum")]) \
            .rename_columns(["c_mktsegment", "n_customers",
                             "sum_acctbal_cents"])

    return _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"), ["c_mktsegment"])


TOP_ORDERS_PER_SEGMENT_K = 3


def top_orders_per_segment(sf_dir: str, k: int = TOP_ORDERS_PER_SEGMENT_K,
                           broadcast_max_bytes: int = CUSTOMER_DIM_BROADCAST_MAX_BYTES):
    """Grouped top-k: the k highest-value orders per market segment
    (totalprice desc, orderkey asc tie-break), with the global rank
    attached — the generic per-group top-k shape: per-batch partial
    top-k per segment (segments are a bounded enum, so each batch
    emits <= |segments|*k rows), one tiny single-partition finish that
    re-selects and ranks. The customer->segment dimension attaches
    broadcast below the byte gate and via a hash-partitioned
    ``Dataset.join`` above (same gate as ``top_customers``; both paths
    inner-join semantics)."""
    import os

    import ray
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["segment", "totalprice_cents", "orderkey"],
                              ascending=[True, False, True]) \
            .groupby("segment", as_index=False, sort=False).head(k)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = topk(df).copy()
        df["rk"] = df.groupby("segment", sort=False).cumcount() + 1
        return df[["segment", "orderkey", "totalprice_cents", "rk"]]

    try:
        dim_bytes = os.path.getsize(f"{sf_dir}/customer.parquet")
    except OSError:
        dim_bytes = 0

    if dim_bytes <= broadcast_max_bytes:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(),
                               cust["c_mktsegment"].to_pylist())))

        def partial(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            df = pa.table({
                "orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "totalprice_cents": pc.cast(
                    pc.round(pc.multiply(batch["o_totalprice"], 100),
                             round_mode="half_towards_infinity"), pa.int64()),
            }).to_pandas()
            df["segment"] = df["o_custkey"].map(lk)
            df = df.dropna(subset=["segment"])  # inner-join semantics
            return table_from_pandas(topk(df)[["segment", "orderkey", "totalprice_cents"]])

        return ds.map_batches(partial, batch_format="pyarrow") \
            .repartition(1).map_batches(rank, batch_format="pandas",
                                        batch_size=None)

    # at-scale path: orders pre-trim per batch is impossible before the
    # segment attaches, so the dimension joins hash-partitioned on the
    # customer key; per-block partial top-k after the join keeps the
    # finisher at |segments|*k rows per block
    cpus = int(ray.cluster_resources().get("CPU", 4))
    dim = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def price_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "totalprice_cents": pc.cast(
                pc.round(pc.multiply(batch["o_totalprice"], 100),
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    j = ds.map_batches(price_cents, batch_format="pyarrow") \
        .join(dim, "inner", num_partitions=max(2, cpus // 2),
              on=("o_custkey",), right_on=("c_custkey",))

    def partial_joined(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"c_mktsegment": "segment"})
        return topk(df)[["segment", "orderkey", "totalprice_cents"]]

    return j.map_batches(partial_joined, batch_format="pandas") \
        .repartition(1).map_batches(rank, batch_format="pandas",
                                    batch_size=None)


HOP_US = 15 * 60 * 1_000_000          # hop: 15 minutes
HOP_WINDOW_US = 60 * 60 * 1_000_000   # window: 1 hour


def events_hopping(sf_dir: str):
    """Hopping (sliding) windowed aggregate: 1-hour windows advancing
    every 15 minutes, so each event contributes to window/hop = 4
    overlapping windows. The expansion is a per-batch numpy repeat
    folded immediately into (window, event_type) partials — the
    exchange moves bounded-key partial rows, never the 4x-replicated
    event stream. Windows grow with TIME, not corpus size, so the
    single-block finish holds them all (same argument as
    ``events_windowed``)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    k = HOP_WINDOW_US // HOP_US

    def partial(batch: pa.Table) -> pa.Table:
        tus = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = (tus // HOP_US) * HOP_US
        value_c = pc.cast(
            pc.round(pc.multiply(batch["value"], 100),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        offs = np.arange(k, dtype=np.int64) * HOP_US
        df = pd.DataFrame({
            "window_start_us": (base[:, None] - offs[None, :]).reshape(-1),
            "event_type": np.repeat(et, k),
            "value_c": np.repeat(value_c, k),
        })
        agg = df.groupby(["window_start_us", "event_type"], as_index=False).agg(
            n_events=("value_c", "size"), sum_value_cents=("value_c", "sum"))
        return table_from_pandas(agg)

    return _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_start_us", "event_type"])


CUSTDIST_ROWS_PER_BUCKET = 1_000_000


def customer_distribution(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    INCLUDING zero-order customers. Output: c_count, custdist (the
    c_count = 0 row is always present, derived as total customers
    minus customers with orders).

    Shape at scale: per-batch (o_custkey, n) partial counts (one row
    per DISTINCT custkey per batch) hash into ~1M-row custkey buckets;
    each bucket folds its custkeys vectorized and emits its own
    bounded counts-of-counts histogram, so the second exchange is
    len(histogram) rows per bucket — the full per-customer table never
    coalesces anywhere. The zero row needs only the customer-table
    row count (parquet footer) and the histogram's own mass: no join
    against the customer table at all.
    """
    from .util import parquet_num_rows, table_from_pandas

    n_customers = parquet_num_rows(f"{sf_dir}/customer.parquet")
    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = max(1, n_orders // CUSTDIST_ROWS_PER_BUCKET)
    ds = _read(sf_dir, "orders", ["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, counts = np.unique(key, return_counts=True)
        b = ((ids.astype(np.uint64) * np.uint64(2654435761))
             & np.uint64(0xFFFFFFFF)) % num_buckets
        return pa.table({"bucket": pa.array(b.astype(np.int64), pa.int64()),
                         "o_custkey": pa.array(ids, pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"c_count": pd.Series([], dtype="int64"),
                                 "custdist": pd.Series([], dtype="int64")})
        per_cust = df.groupby("o_custkey")["n"].sum()
        hist = per_cust.value_counts()
        return pd.DataFrame({"c_count": hist.index.astype("int64"),
                             "custdist": hist.to_numpy().astype("int64")})

    folded = _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby("bucket").map_groups(bucket_hist, batch_format="pandas"),
        ["c_count"])

    def add_zero_row(df: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame({"c_count": pd.Series([0], dtype="int64"),
                             "custdist": pd.Series(
                                 [n_customers - int(df["custdist"].sum())],
                                 dtype="int64")})
        out = pd.concat([df[df["c_count"] != 0], zero], ignore_index=True)
        return out.sort_values(["custdist", "c_count"],
                               ascending=[False, False]).reset_index(drop=True)

    return folded.map_batches(add_zero_row, batch_format="pandas",
                              batch_size=None)
