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


def _read(sf_dir: str, table: str, columns=None, predicate=None,
          window=None):
    """Column- and (optionally) row-pruned parquet read. ``predicate``
    is a ``pyarrow.dataset`` expression pushed into the fragment scan —
    at scale it skips whole row groups via min/max statistics before
    any byte leaves storage. Callers KEEP their in-batch filters with
    the same bounds: the pushdown is purely an optimization and the
    batch filter remains the semantic guard (so an oracle never
    depends on scan-level behavior).

    ``window=(col, lo, hi)`` (either bound may be None) declares the
    predicate's bounding box. It builds the ``lo <= col < hi``
    predicate when ``predicate`` is not given, and — critically — it
    lets the read detect from footer statistics ALONE that every row
    group is pruned. A fully-pruned scan yields ZERO read tasks, so
    zero blocks reach any downstream hash shuffle; Ray's join
    aggregators then never receive their schema-broadcast empty shard
    and acero dies with "No match ... for key field" on a schemaless
    empty partition (seen on the date-windowed Q-shapes at sf0.001,
    whose windows hold no rows). In that case return ONE explicit
    0-row, schema-carrying block, MARKED known-empty
    (``util.mark_known_empty``) so join call sites (``_inner_join``)
    and the gated semi-join helpers can short-circuit driver-side.
    The check is conservative (missing stats => the row group
    survives), so it can only ever SKIP work, never change results."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from .util import (mark_known_empty, set_seed_schema,
                       strip_schema_metadata)

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path)
    names = columns if columns is not None else schema.names
    seed = pa.schema([schema.field(c).remove_metadata()
                      for c in names]).empty_table()
    if window is not None:
        col, lo, hi = window
        if predicate is None:
            import pyarrow.dataset as pds
            expr = None
            if lo is not None:
                expr = pds.field(col) >= lo
            if hi is not None:
                e2 = pds.field(col) < hi
                expr = e2 if expr is None else expr & e2
            predicate = expr
        if not _window_survives(path, col, lo, hi):
            return mark_known_empty(rd.from_arrow(seed), seed)
    # metadata-free blocks keep downstream groupby/join reduces on the
    # hashable-schema fast path (util.strip_schema_metadata); the seed
    # schema rides along for the join anchors (util.set_seed_schema)
    kw = {"filter": predicate} if predicate is not None else {}
    return set_seed_schema(
        strip_schema_metadata(
            rd.read_parquet(path, columns=columns, **kw)),
        seed)


def _window_survives(path: str, col: str, lo, hi) -> bool:
    """True if any row group MAY hold rows with lo <= col < hi per
    footer min/max statistics — a pure metadata read, no data pages.
    Inclusive on both ends of the stats compare, so strict-bound
    callers (e.g. ``col > lo``) get a conservative answer."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    try:
        j = pf.schema_arrow.names.index(col)
    except ValueError:
        return True
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(j).statistics
        if st is None or not st.has_min_max:
            return True
        mn, mx = st.min, st.max
        if isinstance(lo, np.datetime64) or isinstance(hi, np.datetime64):
            mn, mx = np.datetime64(mn), np.datetime64(mx)
        if (lo is None or mx >= lo) and (hi is None or mn < hi):
            return True
    return False


def _between(col: str, lo, hi):
    """``lo <= col < hi`` as a pushdown-able dataset expression."""
    import pyarrow.dataset as pds
    return (pds.field(col) >= lo) & (pds.field(col) < hi)


def _map_pa(ds, fn, **kw):
    """``ds.map_batches(fn, batch_format="pyarrow")`` that PROPAGATES
    the seed schema and the known-empty mark: ``map_batches`` returns a
    new Dataset object so the attributes would be lost; re-derive the
    post-map schema by applying ``fn`` to the 0-row seed table
    driver-side (the same fn the workers run, so the schemas cannot
    diverge). Use this instead of raw ``map_batches`` on every stage
    that feeds a join side (see ``_sentinel_anchor``)."""
    from .util import (known_empty_table, mark_known_empty,
                       seed_schema_table, set_seed_schema)

    out = ds.map_batches(fn, batch_format="pyarrow", **kw)
    seed = seed_schema_table(ds)
    if seed is not None:
        mapped = fn(seed)
        set_seed_schema(out, mapped)
        if known_empty_table(ds) is not None:
            mark_known_empty(out, mapped)
    return out


# Reserved join-key range for schema-anchor sentinel rows. Engine join
# keys are non-negative ids, so values this deep in the negatives can
# never collide with real data (the contract every join helper below
# documents).
_SENT_FLOOR = -(2 ** 61)
_SENT_LEFT = -(2 ** 62) - 11
_SENT_RIGHT = -(2 ** 62) - 13


def _sentinel_anchor(side, key_cols, sentinel):
    """Union a ONE-ROW schema-anchor into a join side. Ray drops 0-row
    blocks at every layer (reads whose pushed filter matches nothing
    emit no block; map operators skip empty outputs even mid-fused
    chain; the hash shuffle returns before the join schema broadcast at
    ``num_rows == 0`` and only ever attempts that broadcast on the
    FIRST block of a side) — so a side that filters to zero rows
    presents ZERO blocks, some aggregator partition stays schemaless,
    and acero raises "No match ... for key field". One guaranteed
    non-empty block per side keeps the schema broadcast alive; the
    anchor row carries an impossible key (int64 far below any real id;
    left and right use DIFFERENT reserved keys) so inner-join semantics
    drop it from the output.

    The anchor's schema comes from the side's statically-propagated
    seed (``util.seed_schema_table``, attached by ``_read`` and chained
    by ``_map_pa``), falling back to Ray's schema resolution for sides
    without one (e.g. groupby outputs — those have data in every
    supported scenario). Returns the side unchanged when no schema can
    be resolved or a key column is not int64."""
    import ray.data as rd
    from .util import seed_schema_table

    seed = seed_schema_table(side)
    schema = seed.schema if seed is not None else _schema_of(side)
    if schema is None or any(
            n not in schema.names or not pa.types.is_int64(schema.field(n).type)
            for n in key_cols):
        return side
    row = [pa.array([sentinel], pa.int64()) if f.name in set(key_cols)
           else pa.nulls(1, f.type) for f in schema]
    return side.union(rd.from_arrow(
        pa.Table.from_arrays(row, schema=schema)))


def _strip_sentinels(key_cols):
    """Drop schema-anchor rows after an outer join (their key is the
    reserved value; inner joins never emit them). Also drops null-key
    rows — fine for this engine, whose join keys are non-null ids."""
    key_cols = tuple(key_cols)

    def strip(t: pa.Table) -> pa.Table:
        for k in key_cols:
            if pa.types.is_int64(t.schema.field(k).type):
                t = t.filter(pc.greater(
                    t[k], pa.scalar(_SENT_FLOOR, pa.int64())))
        return t

    return strip


def _joined_seed(ls: "pa.Schema", rs: "pa.Schema", r_on) -> pa.Table:
    """Pyarrow's joined schema as a 0-row table: left columns + right
    columns minus right keys."""
    fields = list(ls) + [rs.field(n) for n in rs.names
                         if n not in set(r_on)]
    return pa.schema(fields).empty_table()


def _inner_join(left, right, num_partitions, on, right_on=None):
    """Empty-safe ``Dataset.join``. Two layers:

    1. PLAN-TIME empty (a fully-pruned windowed read carrying the
       ``util.mark_known_empty`` tag): skip the join entirely and
       return a 0-row table with the joined schema, re-marked for
       chaining.
    2. RUNTIME empty (a filter that matched nothing — footer stats
       cannot see it): a one-row schema-anchor sentinel unioned into
       each side (``_sentinel_anchor``) keeps the join aggregators'
       schema broadcast alive; inner-join semantics drop the anchors.

    The join output carries a propagated seed schema when both sides'
    schemas are statically known, so chained joins stay anchored."""
    import ray.data as rd
    from .util import (known_empty_table, mark_known_empty,
                       seed_schema_table, set_seed_schema)

    on = tuple(on)
    r_on = tuple(right_on) if right_on is not None else on
    lt, rt = known_empty_table(left), known_empty_table(right)
    lseed, rseed = seed_schema_table(left), seed_schema_table(right)
    if lt is not None or rt is not None:
        ls = lt.schema if lt is not None else \
            (lseed.schema if lseed is not None else _schema_of(left))
        rs = rt.schema if rt is not None else \
            (rseed.schema if rseed is not None else _schema_of(right))
        if ls is not None and rs is not None:
            t = _joined_seed(ls, rs, r_on)
            return mark_known_empty(rd.from_arrow(t), t)
        # cannot resolve the live side's schema: fall through to the
        # real (anchored) join
    l2 = _sentinel_anchor(left, on, _SENT_LEFT)
    r2 = _sentinel_anchor(right, r_on, _SENT_RIGHT)
    j = l2.join(r2, "inner", num_partitions=num_partitions,
                on=on, right_on=right_on)
    if lseed is not None and rseed is not None:
        set_seed_schema(j, _joined_seed(lseed.schema, rseed.schema, r_on))
    return j


def _left_outer_join(left, right, num_partitions, on, right_on=None):
    """Empty-safe left-outer join (the anti-join building block).
    Schema anchors go in on both sides; the LEFT anchor survives a
    left-outer join as an unmatched row, so the output strips reserved
    keys (``_strip_sentinels``). A plan-time-empty RIGHT side
    short-circuits to null-widened left rows (the anti-join keeps
    everything); a plan-time-empty LEFT side is the empty result."""
    import ray.data as rd
    from .util import known_empty_table, mark_known_empty, seed_schema_table

    on = tuple(on)
    r_on = tuple(right_on) if right_on is not None else on
    lt, rt = known_empty_table(left), known_empty_table(right)
    if lt is not None:
        rseed = seed_schema_table(right)
        rs = rt.schema if rt is not None else \
            (rseed.schema if rseed is not None else _schema_of(right))
        if rs is not None:
            t = _joined_seed(lt.schema, rs, r_on)
            return mark_known_empty(rd.from_arrow(t), t)
    elif rt is not None:
        add = [rt.schema.field(n) for n in rt.schema.names
               if n not in set(r_on)]

        def widen(t: pa.Table) -> pa.Table:
            for f in add:
                t = t.append_column(f.name, pa.nulls(len(t), f.type))
            return t

        return _map_pa(left, widen)
    l2 = _sentinel_anchor(left, on, _SENT_LEFT)
    r2 = _sentinel_anchor(right, r_on, _SENT_RIGHT)
    j = l2.join(r2, "left_outer", num_partitions=num_partitions,
                on=on, right_on=right_on)
    return j.map_batches(_strip_sentinels(on), batch_format="pyarrow")


def _schema_of(ds):
    """Arrow schema of a live Dataset side (executes at most one block
    of the plan), or None when Ray cannot resolve one (a runtime-empty
    stream has no block to infer from) or the side holds pandas blocks
    (whose PandasBlockSchema cannot type a sentinel row)."""
    s = ds.schema(fetch_if_missing=True)
    if s is None or not isinstance(s.base_schema, pa.Schema):
        return None
    return s.base_schema


def _finish_grouped_sums(partials, keys: list[str]):
    """Bounded-key finish: see ``functions.util.finish_grouped``."""
    from .util import finish_grouped
    return finish_grouped(partials, keys)


def _attach_dim_value(ds, sf_dir: str, dim_table: str, dim_key: str,
                      val_col: str, fact_key: str, out_col: str | None,
                      broadcast_max_bytes: int, num_partitions: int,
                      allowed: np.ndarray | None = None, project=None):
    """Attach a dimension's int64 ``val_col`` onto a fact stream as
    ``out_col`` via an inner join on ``fact_key == dim_key`` (fact rows
    with no dim match DROP — semi-join semantics). ``allowed`` (sorted
    int64 values) filters dim rows before the attach, turning it into
    a membership semi-join; ``out_col=None`` keeps only the filtering
    effect. ``project(batch) -> pa.Table`` prepares the fact columns
    (must include ``fact_key``).

    Below the byte gate the dim ships ONCE as a sorted-numpy
    (keys, vals) pair via ``ray.put`` and every fact batch resolves
    membership with one searchsorted — the fact table never shuffles.
    Above it, a hash-partitioned ``Dataset.join`` on the key.
    """
    import os
    import ray
    import pyarrow.parquet as pq
    import ray.data as rd
    from .util import known_empty_table, mark_known_empty

    if project is None:
        def project(batch):
            return batch

    seed = known_empty_table(ds)
    if seed is not None:
        # plan-time-empty fact: the attach result is empty with the
        # projected schema (+ the int64 out_col) — skip both arms so no
        # all-empty side ever reaches a hash join (see _inner_join)
        t = project(seed)
        if out_col is not None:
            t = t.append_column(out_col, pa.array([], pa.int64()))
        return mark_known_empty(rd.from_arrow(t), t)

    try:
        dim_bytes = os.path.getsize(f"{sf_dir}/{dim_table}.parquet")
    except OSError:
        dim_bytes = 0

    if dim_bytes <= broadcast_max_bytes:
        dim = pq.read_table(f"{sf_dir}/{dim_table}.parquet",
                            columns=[dim_key, val_col])
        vals64 = pc.cast(dim[val_col], pa.int64())
        if allowed is not None:
            keep = pc.is_in(vals64, value_set=pa.array(allowed, pa.int64()))
            dim, vals64 = dim.filter(keep), vals64.filter(keep)
        keys = dim[dim_key].to_numpy(zero_copy_only=False)
        vals = vals64.to_numpy(zero_copy_only=False)
        order = np.argsort(keys)
        ref = ray.put((keys[order], vals[order]))

        def attach(batch: pa.Table) -> pa.Table:
            ks, vs = ray.get(ref)
            t = project(batch)
            fk = t[fact_key].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, fk)
            pos_c = np.minimum(pos, max(len(ks) - 1, 0))
            hit = (ks[pos_c] == fk) if len(ks) else np.zeros(len(fk), bool)
            t = t.filter(pa.array(hit))
            if out_col is None:
                return t
            return t.append_column(out_col, pa.array(vs[pos_c[hit]],
                                                     pa.int64()))

        return _map_pa(ds, attach)

    vname = out_col or f"_{val_col}_drop"

    def dim_project(t: pa.Table) -> pa.Table:
        vals64 = pc.cast(t[val_col], pa.int64())
        out = pa.table({dim_key: pc.cast(t[dim_key], pa.int64()),
                        vname: vals64})
        if allowed is not None:
            out = out.filter(pc.is_in(
                vals64, value_set=pa.array(allowed, pa.int64())))
        return out

    dim_ds = _map_pa(_read(sf_dir, dim_table, [dim_key, val_col]),
                     dim_project)
    j = _inner_join(_map_pa(ds, project), dim_ds,
                    num_partitions, (fact_key,), (dim_key,))

    def cleanup(t: pa.Table) -> pa.Table:
        # schema parity with the broadcast arm: fact columns (+ out_col)
        drop = [c for c in (dim_key, None if out_col else vname)
                if c and c != fact_key and c in t.column_names]
        return t.drop_columns(drop) if drop else t

    return _map_pa(j, cleanup)


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

    from .util import set_seed_schema
    agg = set_seed_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders")),
        pa.schema([("o_custkey", pa.int64()),
                   ("revenue_cents", pa.int64()),
                   ("n_orders", pa.int64())]).empty_table())

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
    j = _inner_join(agg, cust_ds, num_partitions,
                    ("o_custkey",), ("c_custkey",))

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

    o = _map_pa(orders, filter_orders)
    l = _map_pa(lineitem, filter_lineitem)
    joined = _inner_join(l, o, num_partitions,
                         ("l_orderkey",), ("o_orderkey",))

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

    j = _inner_join(_map_pa(ds, price_cents), dim, max(2, cpus // 2),
                    ("o_custkey",), ("c_custkey",))

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
    from .util import bucket_count, parquet_num_rows

    n_customers = parquet_num_rows(f"{sf_dir}/customer.parquet")
    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_orders, CUSTDIST_ROWS_PER_BUCKET)
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


RUNNING_ROWS_PER_BUCKET = 1_000_000


def running_totals(sf_dir: str, num_buckets: int | None = None):
    """Per-customer RUNNING revenue: for every order, the cumulative
    sum of that customer's order totals in (o_orderdate, o_orderkey)
    order — the classic partition-ordered window aggregate
    (``SUM() OVER (PARTITION BY ... ORDER BY ...)``).

    Shape at scale: orders hash into ~1M-row custkey buckets (a
    customer's orders all land in one bucket), each bucket sorts once
    and runs ONE vectorized pandas grouped cumsum over every customer
    in the bucket — never a per-customer Python call
    (streamops-style bucketed fold). Output is row-per-order, so the
    operator streams: each bucket emits its own block straight to the
    consumer, nothing coalesces.
    """
    from .util import bucket_count, parquet_num_rows

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_orders, RUNNING_ROWS_PER_BUCKET)
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((key * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) % num_buckets
        return pa.table({
            "bucket": pa.array(b.astype(np.int64), pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "o_orderkey": batch["o_orderkey"],
            "o_orderdate_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "price_c": pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100),
                                        round_mode="half_towards_infinity"),
                               pa.int64()),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate_us", "o_orderkey"],
                            kind="mergesort").reset_index(drop=True)
        df["running_cents"] = df.groupby("o_custkey", sort=False)["price_c"].cumsum()
        return df[["o_custkey", "o_orderkey", "o_orderdate_us", "running_cents"]]

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(fold, batch_format="pandas")


# distinct order-custkey sets up to this many bytes of orders parquet
# broadcast as an Arrow value_set; above it the anti-join runs as a
# hash-partitioned left_outer Dataset.join against the per-custkey
# order counts (never a driver set)
IDLE_ANTI_BROADCAST_MAX_BYTES = 256 << 20
IDLE_CUTOFF = "2000-01-01"  # "idle" = no order on/after this date


def idle_customers(sf_dir: str, cutoff: str = IDLE_CUTOFF,
                   broadcast_max_bytes: int = IDLE_ANTI_BROADCAST_MAX_BYTES,
                   num_partitions: int | None = None):
    """TPC-H Q22 shape: customers with an ABOVE-AVERAGE positive
    balance and no RECENT order (none on/after ``cutoff``), rolled up
    per nation (n_nationkey, numcust, totacctbal_cents).

    Two passes over the customer table, both distributed:

    1. global (count, sum) of positive balances via per-batch partials
       — the average is then applied as an exact INTEGER cross-multiply
       (``bal_cents * n_pos > sum_pos_cents``), so the engine and the
       DuckDB oracle agree bit-for-bit with no float-division epsilon;
    2. filter + ANTI-JOIN against the orders custkeys: broadcast
       distinct-key value_set below ``broadcast_max_bytes`` of orders
       parquet, hash-partitioned ``left_outer`` join against the
       per-custkey order counts above it (both paths tested for
       agreement).
    """
    import os
    import ray

    # pass 1: exact global positive-balance count+sum (tiny result)
    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]

    def pos_partial(batch: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100),
                               round_mode="half_towards_infinity"), pa.int64())
        bal = bal.filter(pc.greater(bal, 0))
        return pa.table({"k": pa.array([0], pa.int64()),
                         "n_pos": pa.array([len(bal)], pa.int64()),
                         "sum_pos": pa.array([pc.sum(bal).as_py() or 0], pa.int64())})

    stats = _finish_grouped_sums(
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(pos_partial, batch_format="pyarrow"), ["k"]).take_all()
    n_pos, sum_pos = stats[0]["n_pos"], stats[0]["sum_pos"]

    ds = _read(sf_dir, "customer", cust_cols)

    def rich_only(batch: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100),
                               round_mode="half_towards_infinity"), pa.int64())
        keep = pc.greater(pc.multiply(bal, pa.scalar(n_pos, pa.int64())),
                          pa.scalar(sum_pos, pa.int64()))
        t = pa.table({"c_custkey": batch["c_custkey"],
                      "n_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
                      "bal_cents": bal})
        return t.filter(keep)

    rich = ds.map_batches(rich_only, batch_format="pyarrow")

    def rollup(stream):
        return _finish_grouped_sums(
            stream.map_batches(
                lambda t: pa.table({"n_nationkey": t["n_nationkey"],
                                    "bal_cents": t["bal_cents"]})
                .group_by("n_nationkey")
                .aggregate([("bal_cents", "count"), ("bal_cents", "sum")])
                .rename_columns(["n_nationkey", "numcust", "totacctbal_cents"]),
                batch_format="pyarrow"),
            ["n_nationkey"])

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = 0

    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"))

    if orders_bytes <= broadcast_max_bytes:
        import pyarrow.parquet as pq
        recent = pq.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderdate"])
        recent = recent.filter(
            pc.greater_equal(recent["o_orderdate"], cutoff_ts))
        have = pc.unique(recent["o_custkey"].combine_chunks())
        ref = ray.put(have)

        def anti(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(
                pc.is_in(batch["c_custkey"], value_set=ray.get(ref))))

        return rollup(rich.map_batches(anti, batch_format="pyarrow"))

    # at-scale path: per-batch distinct custkeys pre-shrink the orders
    # side, groupby dedups globally, then a hash-partitioned left_outer
    # join marks matches and the filter keeps the nulls (anti-join)
    from ray.data.aggregate import Count
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   window=("o_orderdate", np.datetime64(cutoff, "us"),
                           None))
    from .util import known_empty_table
    if known_empty_table(orders) is not None:
        # nobody ordered since the cutoff: the anti-join keeps every
        # rich customer (a 0-row right side would starve the left_outer
        # join's aggregators of schema — see _inner_join)
        return rollup(rich.map_batches(
            lambda t: t.select(["n_nationkey", "bal_cents"]),
            batch_format="pyarrow"))
    have_ds = orders.map_batches(
        lambda t: pa.table({"o_custkey": pc.unique(
            t.filter(pc.greater_equal(t["o_orderdate"], cutoff_ts))
            ["o_custkey"].combine_chunks())}),
        batch_format="pyarrow").groupby("o_custkey").aggregate(
            Count(alias_name="n_orders"))
    from .util import set_seed_schema
    set_seed_schema(have_ds, pa.schema(
        [("o_custkey", pa.int64()),
         ("n_orders", pa.int64())]).empty_table())
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-orders_bytes // (128 << 20))))
    j = _left_outer_join(rich, have_ds, num_partitions,
                         ("c_custkey",), ("o_custkey",))

    def keep_nulls(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_orders"].isna()][["n_nationkey", "bal_cents"]]

    anti_df = j.map_batches(keep_nulls, batch_format="pandas")
    return rollup(anti_df.map_batches(
        lambda t: pa.table({"n_nationkey": pc.cast(t["n_nationkey"], pa.int64()),
                            "bal_cents": pc.cast(t["bal_cents"], pa.int64())}),
        batch_format="pyarrow"))


ORDER_STATUSES = ("F", "O", "P")  # bounded enum, pivot column order


def order_priority_matrix(sf_dir: str):
    """PIVOT: order counts as a priority × status matrix — one row per
    o_orderpriority with a count column per status (n_f/n_o/n_p) plus
    the row total. Per-batch 2-D partial counts (priority × status is
    a bounded enum product), bounded-key finish, then the pivot itself
    happens on the tiny folded table — the wide layout never exists
    at data scale."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "o_orderstatus": batch["o_orderstatus"],
        }).group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("o_orderstatus", "count")]) \
            .rename_columns(["o_orderpriority", "o_orderstatus", "n"])

    folded = _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"])

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index="o_orderpriority", columns="o_orderstatus",
                              values="n", aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"o_orderpriority": wide.index})
        for s in ORDER_STATUSES:
            col = wide[s] if s in wide.columns else 0
            out[f"n_{s.lower()}"] = pd.Series(col).to_numpy(dtype="int64") \
                if s in wide.columns else np.zeros(len(wide), dtype="int64")
        out["n_total"] = (out[[f"n_{s.lower()}" for s in ORDER_STATUSES]]
                          .sum(axis=1).astype("int64"))
        return out.sort_values("o_orderpriority").reset_index(drop=True)

    return folded.map_batches(pivot, batch_format="pandas", batch_size=None)


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01",
                          broadcast_max_bytes: int = CUSTOMER_DIM_BROADCAST_MAX_BYTES,
                          num_partitions: int | None = None):
    """TPC-H Q5 shape: revenue per nation from lineitems where the
    SUPPLIER and the ordering CUSTOMER share a nation inside one
    region, for orders inside a date window — the multi-way join:
    region⋈nation broadcast (bounded enums), customer⋈orders broadcast
    dict below the byte gate / hash-partitioned ``Dataset.join`` above,
    orders⋈lineitem always hash-partitioned on the order key (the
    large-large exchange), supplier attached the same gated way on the
    supp key. Revenue is per-row cents (round half-away) so the DuckDB
    oracle sums identically."""
    import os
    import ray
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {rk for rk, rn in zip(region_t["r_regionkey"].to_pylist(),
                                  region_t["r_name"].to_pylist()) if rn == region}
    nation_in = {nk: nm for nk, nm, rg in zip(nation["n_nationkey"].to_pylist(),
                                              nation["n_name"].to_pylist(),
                                              nation["n_regionkey"].to_pylist())
                 if rg in rkeys}
    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            nbytes = os.path.getsize(f"{sf_dir}/lineitem.parquet") \
                + os.path.getsize(f"{sf_dir}/orders.parquet")
        except OSError:
            nbytes = 0
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-nbytes // (128 << 20))))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                   window=("o_orderdate",
                                      np.datetime64(date_from, "us"),
                                      np.datetime64(date_to, "us")))

    def in_window(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo),
            pc.less(batch["o_orderdate"], hi)))
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_custkey": batch["o_custkey"]})

    o = _map_pa(orders, in_window)

    try:
        cust_bytes = os.path.getsize(f"{sf_dir}/customer.parquet")
    except OSError:
        cust_bytes = 0

    if cust_bytes <= broadcast_max_bytes:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        c_map = {k: v for k, v in zip(cust["c_custkey"].to_pylist(),
                                      cust["c_nationkey"].to_pylist())
                 if v in nation_in}
        cref = ray.put(c_map)

        def attach_cnation(batch: pa.Table) -> pa.Table:
            lk = ray.get(cref)
            nk = pd.Series(batch["o_custkey"].to_numpy(zero_copy_only=False)) \
                .map(lk).to_numpy(dtype="float64", na_value=np.nan)
            keep = ~np.isnan(nk)
            return pa.table({
                "o_orderkey": pa.array(
                    batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64()),
                "c_nationkey": pa.array(nk[keep].astype(np.int64), pa.int64()),
            })

        o = _map_pa(o, attach_cnation)
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

        def cust_in_region(batch: pa.Table) -> pa.Table:
            t = pa.table({"c_custkey": batch["c_custkey"],
                          "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64())})
            return t.filter(pc.is_in(
                t["c_nationkey"],
                value_set=pa.array(sorted(nation_in), pa.int64())))

        o = _inner_join(
            o, _map_pa(cust_ds, cust_in_region),
            num_partitions, ("o_custkey",), ("c_custkey",))
        o = _map_pa(o, lambda t: t.select(["o_orderkey", "c_nationkey"]))

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_project(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    li = _map_pa(lineitem, li_project)
    j = _inner_join(li, o, num_partitions,
                    ("l_orderkey",), ("o_orderkey",))

    try:
        supp_bytes = os.path.getsize(f"{sf_dir}/supplier.parquet")
    except OSError:
        supp_bytes = 0

    name_ref = ray.put({k: v for k, v in nation_in.items()})

    def finish_names(stream):
        def partial(batch: pa.Table) -> pa.Table:
            # fold to (nationkey, sum) FIRST — bounded enum — then map
            # the <=|nations| keys to names, never a per-row lookup
            names = ray.get(name_ref)
            g = pa.table({"c_nationkey": batch["c_nationkey"],
                          "rev_c": batch["rev_c"]}) \
                .group_by("c_nationkey").aggregate([("rev_c", "sum")])
            return pa.table({
                "n_name": pa.array([names[n] for n in
                                    g["c_nationkey"].to_pylist()], pa.string()),
                "revenue_cents": g["rev_c_sum"],
            })

        return _finish_grouped_sums(
            stream.map_batches(partial, batch_format="pyarrow"), ["n_name"])

    if supp_bytes <= broadcast_max_bytes:
        supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
        s_map = dict(zip(supp["s_suppkey"].to_pylist(),
                         supp["s_nationkey"].to_pylist()))
        sref = ray.put(s_map)

        def local_only(batch: pa.Table) -> pa.Table:
            lk = ray.get(sref)
            sn = pd.Series(batch["l_suppkey"].to_numpy(zero_copy_only=False)) \
                .map(lk).to_numpy(dtype="float64", na_value=np.nan)
            cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            mask = pa.array(sn == cn)  # NaN (unknown supplier) never equal
            return batch.filter(mask).select(["c_nationkey", "rev_c"])

        return finish_names(j.map_batches(local_only, batch_format="pyarrow"))

    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j2 = _inner_join(j, _map_pa(
        supp_ds,
        lambda t: pa.table({"s_suppkey": t["s_suppkey"],
                            "s_nationkey": pc.cast(t["s_nationkey"], pa.int64())})),
        num_partitions, ("l_suppkey",), ("s_suppkey",))

    def local_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["c_nationkey"],
                                     batch["s_nationkey"])) \
            .select(["c_nationkey", "rev_c"])

    return finish_names(j2.map_batches(local_filter, batch_format="pyarrow"))


# deterministic overlapping promo windows (a RANGE-JOIN interval
# table): window i starts T0 + i*STRIDE days and runs 90/120/150 days
# by i % 3, so a given order date falls inside 1-3 windows — a true
# interval join, not a tumbling bucket. Windows grow with TIME, not
# data, so the interval side is always the broadcast side.
RANGE_JOIN_T0_US = 788_918_400_000_000  # 1995-01-01 00:00:00 UTC
RANGE_JOIN_DAY_US = 86_400_000_000
RANGE_JOIN_STRIDE_DAYS = 60
RANGE_JOIN_N_WINDOWS = 40
RANGE_JOIN_LEN_DAYS = (90, 120, 150)  # by window_id % 3


def promo_windows() -> list[tuple[int, int, int]]:
    """(window_id, start_us, end_us) for the shared interval table."""
    out = []
    for i in range(RANGE_JOIN_N_WINDOWS):
        start = RANGE_JOIN_T0_US + i * RANGE_JOIN_STRIDE_DAYS * RANGE_JOIN_DAY_US
        end = start + RANGE_JOIN_LEN_DAYS[i % 3] * RANGE_JOIN_DAY_US
        out.append((i, start, end))
    return out


def orders_in_windows(sf_dir: str):
    """RANGE JOIN: orders (points) against the overlapping promo
    interval table — per window, how many orders landed inside it and
    their total value. The interval side is tiny and time-bounded, so
    the join is a broadcast interval join: each batch evaluates the
    K window predicates as K vectorized masks and folds straight into
    (window_id, n, sum) partials — the point side is never replicated
    through an exchange (compare ``events_hopping``, where uniform
    hops allow arithmetic bucketing; irregular/overlapping intervals
    need the predicate form). At 100 TB the same shape holds: windows
    grow with time, orders stream through once."""
    windows = promo_windows()
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        tus = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        price = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        ids, starts, ends, ns, sums = [], [], [], [], []
        for wid, s, e in windows:
            mask = (tus >= s) & (tus < e)
            n = int(mask.sum())
            if n:
                ids.append(wid); starts.append(s); ends.append(e)
                ns.append(n); sums.append(int(price[mask].sum()))
        return pa.table({"window_id": pa.array(ids, pa.int64()),
                         "window_start_us": pa.array(starts, pa.int64()),
                         "window_end_us": pa.array(ends, pa.int64()),
                         "n_orders": pa.array(ns, pa.int64()),
                         "revenue_cents": pa.array(sums, pa.int64())})

    return _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_id", "window_start_us", "window_end_us"])


ROLLING_WINDOW_DAYS = 7


def rolling_revenue(sf_dir: str, window_days: int = ROLLING_WINDOW_DAYS):
    """Trailing-window time series: per-day order count/revenue plus
    the trailing 7-day revenue sum (RANGE-frame window aggregate — the
    moving-average primitive, distinct from the tumbling/hopping
    COUNT-frame windows). Per-batch partials fold to one row per DAY
    (keys grow with time, not data), so the rolling pass runs on the
    tiny folded series: one cumsum + one searchsorted, exact integers.
    """
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000
    span_us = (window_days - 1) * day_us

    def partial(batch: pa.Table) -> pa.Table:
        tus = pc.cast(batch["o_orderdate"], pa.int64())
        day = pc.multiply(pc.divide(tus, day_us), day_us)
        return pa.table({
            "day_us": day,
            "price_c": pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100),
                                        round_mode="half_towards_infinity"),
                               pa.int64()),
        }).group_by("day_us").aggregate(
            [("price_c", "count"), ("price_c", "sum")]) \
            .rename_columns(["day_us", "n_orders", "revenue_cents"])

    folded = _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"), ["day_us"])

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day_us").reset_index(drop=True)
        days = df["day_us"].to_numpy()
        cs = df["revenue_cents"].to_numpy().cumsum()
        lo = np.searchsorted(days, days - span_us, side="left")
        df["rolling7_cents"] = cs - np.where(lo > 0, cs[lo - 1], 0)
        return df

    return folded.map_batches(rolling, batch_format="pandas",
                              batch_size=None)


def sales_cube(sf_dir: str):
    """ROLLUP multi-level aggregate: customer count + balance at three
    grains — (region, nation), (region, ALL), (ALL, ALL) — in ONE
    corpus pass. The leaf partials are bounded-enum keyed (region x
    nation), so every coarser grain derives from the folded leaf table
    on a single block; subtotal labels use 'ALL' (not NULL) so the
    value-hash gate stays clean. The DuckDB twin is GROUP BY ROLLUP
    with COALESCE'd labels."""
    import ray
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    r2name = dict(zip(region["r_regionkey"].to_pylist(),
                      region["r_name"].to_pylist()))
    n2rn = {nk: (r2name[rg], nm)
            for nk, nm, rg in zip(nation["n_nationkey"].to_pylist(),
                                  nation["n_name"].to_pylist(),
                                  nation["n_regionkey"].to_pylist())}
    ref = ray.put(n2rn)

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        g = pa.table({
            "c_nationkey": batch["c_nationkey"],
            "bal_c": pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        }).group_by("c_nationkey").aggregate(
            [("bal_c", "count"), ("bal_c", "sum")])
        names = [lk[n] for n in g["c_nationkey"].to_pylist()]
        return pa.table({
            "r_name": pa.array([x[0] for x in names], pa.string()),
            "n_name": pa.array([x[1] for x in names], pa.string()),
            "n_customers": g["bal_c_count"],
            "sum_acctbal_cents": g["bal_c_sum"],
        })

    leaf = _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["r_name", "n_name"])

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        by_region = df.groupby("r_name", as_index=False).agg(
            n_customers=("n_customers", "sum"),
            sum_acctbal_cents=("sum_acctbal_cents", "sum"))
        by_region["n_name"] = "ALL"
        grand = pd.DataFrame({
            "r_name": ["ALL"], "n_name": ["ALL"],
            "n_customers": [df["n_customers"].sum()],
            "sum_acctbal_cents": [df["sum_acctbal_cents"].sum()]})
        out = pd.concat([df, by_region, grand], ignore_index=True)
        out["n_customers"] = out["n_customers"].astype("int64")
        out["sum_acctbal_cents"] = out["sum_acctbal_cents"].astype("int64")
        return out[["r_name", "n_name", "n_customers", "sum_acctbal_cents"]] \
            .sort_values(["r_name", "n_name"]).reset_index(drop=True)

    return leaf.map_batches(rollup, batch_format="pandas", batch_size=None)


# exact integer moments hold in int64 while n * max_cents^2 < 2^63;
# the partial fold asserts it loudly instead of wrapping silently
VALUE_MOMENTS_INT64_GUARD = (1 << 63) - 1


def value_moments(sf_dir: str):
    """Sufficient statistics for per-type value distributions over the
    events log: n, sum, sum-of-squares (cents-scaled integers) plus
    min/max — everything a consumer needs for mean/variance/stddev
    without the engine ever doing a float division (divisions are the
    consumer's choice of precision, not a hash hazard). One pass,
    bounded-key partials; the int64 exactness bound is asserted, not
    assumed (DuckDB's HUGEINT side never wraps, so a silent engine
    wrap would flip the gate red — fail loud instead)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["value"], 100),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        sq = pc.multiply(cents, cents)
        t = pa.table({"event_type": batch["event_type"], "cents": cents,
                      "sq": sq})
        g = t.group_by("event_type").aggregate(
            [("cents", "count"), ("cents", "sum"), ("sq", "sum"),
             ("cents", "min"), ("cents", "max")])
        mx = pc.max(pc.abs(g["sq_sum"])).as_py() or 0
        assert mx < VALUE_MOMENTS_INT64_GUARD // 4, \
            "value_moments: sum of squares nearing int64 range; shard the fold"
        return g.rename_columns(["event_type", "n_events", "sum_cents",
                                 "sum_sq_cents2", "min_cents", "max_cents"])

    from .util import finish_grouped
    return finish_grouped(
        ds.map_batches(partial, batch_format="pyarrow"), ["event_type"],
        aggs={"n_events": "sum", "sum_cents": "sum", "sum_sq_cents2": "sum",
              "min_cents": "min", "max_cents": "max"})


CUME_VALUE_BUCKET_CENTS = 1 << 20  # ~$10.5k revenue per rank bucket


def revenue_cume_dist(sf_dir: str,
                      bucket_cents: int = CUME_VALUE_BUCKET_CENTS):
    """Global ORDER STATISTICS without a global sort: every customer's
    cumulative-distribution position by total revenue,
    ``cume_e6 = rows_with_revenue<=mine * 1e6 // n`` (the integer image
    of SQL ``cume_dist()`` — the float version is not hash-safe).

    Two-pass VALUE-range rank (the interleave_plan pattern turned from
    id-space onto value-space):

    - per-customer revenue partials → one groupby (row per customer);
    - pass A (tiny): counts per revenue-range bucket → driver
      exclusive prefix sums → broadcast. Bucket count is bounded by
      the VALUE DISTRIBUTION (max revenue / bucket width), not corpus
      size;
    - pass B: each value bucket folds vectorized (one argsort +
      searchsorted per bucket) and adds its broadcast below-count.
      Ties share a value, so they share a cume — deterministic.
    """
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "price_c": pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100),
                                        round_mode="half_towards_infinity"),
                               pa.int64()),
        }).group_by("o_custkey").aggregate([("price_c", "sum")]) \
            .rename_columns(["o_custkey", "revenue_cents"])

    # row-per-customer table, consumed by both passes — materialize
    # once (bounded by customer count, object-store-resident/spillable)
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("revenue_cents",
                                            alias_name="revenue_cents")) \
        .materialize()

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b = pc.divide(batch["revenue_cents"], bucket_cents)
        return pa.table({"bucket": b}).group_by("bucket").aggregate(
            [("bucket", "count")]).rename_columns(["bucket", "n"])

    parts = _finish_grouped_sums(
        agg.map_batches(bucket_counts, batch_format="pyarrow"),
        ["bucket"]).take_all()
    parts = sorted((int(r["bucket"]), int(r["n"])) for r in parts)
    n_total = sum(n for _, n in parts)
    below, acc = {}, 0
    for b, n in parts:
        below[b] = acc
        acc += n
    ref = ray.put(below)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pc.divide(batch["revenue_cents"], bucket_cents))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref)[int(df["bucket"].iat[0])]
        v = df["revenue_cents"].to_numpy()
        sv = np.sort(v, kind="stable")
        le = np.searchsorted(sv, v, side="right") + off
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "revenue_cents": df["revenue_cents"].astype("int64"),
            "cume_e6": (le * 1_000_000 // n_total).astype("int64"),
        })

    return agg.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas")


ACCTBAL_QUANTILES = ((25, "p25_cents"), (50, "p50_cents"),
                     (75, "p75_cents"), (90, "p90_cents"))


def _acctbal_hist(sf_dir: str):
    """Per-(segment, integer-cents) value-count histogram of customer
    balances — the SHARED bounded-domain sufficient statistic for
    every per-segment distribution operator (quantiles, MAD): acctbal
    has ~1.1M distinct cents, so the histogram converges regardless
    of corpus size and any robust statistic folds from it driver-side."""
    from .util import finish_grouped

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["c_acctbal"], 100),
                     round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"c_mktsegment": batch["c_mktsegment"],
                         "cents": cents}) \
            .group_by(["c_mktsegment", "cents"]) \
            .aggregate([("cents", "count")]) \
            .rename_columns(["c_mktsegment", "cents", "n"])

    return finish_grouped(ds.map_batches(partial, batch_format="pyarrow"),
                          ["c_mktsegment", "cents"])


def segment_acctbal_mad(sf_dir: str):
    """Per-segment robust location/scale: exact discrete median and
    MEDIAN ABSOLUTE DEVIATION of account balances in integer cents —
    the outlier-insensitive twin of mean/stddev (value_moments).
    Output: c_mktsegment, n_customers, median_cents, mad_cents.

    Shape at scale: one corpus scan builds the shared bounded
    (segment, cents) histogram (``_acctbal_hist``); the final fold
    takes the ceil-rank median, rewrites the histogram to
    |cents - median| (combining symmetric collisions), and takes the
    ceil-rank median again — both via ``util.disc_percentiles``, so
    the SQL twin (percentile_disc over the same derived column) is
    hash-exact. No second scan, no per-value exchange."""

    def final(df: pd.DataFrame) -> pd.DataFrame:
        from .util import disc_percentiles
        rows = []
        for seg, g in df.sort_values(["c_mktsegment", "cents"]) \
                         .groupby("c_mktsegment", sort=True):
            vals = g["cents"].to_numpy(dtype=np.int64)
            cnts = g["n"].to_numpy(dtype=np.int64)
            med = disc_percentiles(vals, cnts, [50])[0]
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="stable")
            dv = pd.DataFrame({"d": dev[order], "n": cnts[order]}) \
                .groupby("d", as_index=False)["n"].sum()
            mad = disc_percentiles(dv["d"].to_numpy(dtype=np.int64),
                                   dv["n"].to_numpy(dtype=np.int64),
                                   [50])[0]
            rows.append({"c_mktsegment": seg,
                         "n_customers": int(cnts.sum()),
                         "median_cents": med, "mad_cents": mad})
        out = pd.DataFrame(rows)
        for c in out.columns:
            if c != "c_mktsegment":
                out[c] = out[c].astype("int64")
        return out

    return _acctbal_hist(sf_dir).map_batches(final, batch_format="pandas",
                                             batch_size=None)


def segment_acctbal_quantiles(sf_dir: str):
    """Exact per-segment account-balance percentiles (discrete) via a
    bounded-domain value-count histogram.

    Output: c_mktsegment, n_customers, p25/p50/p75/p90_cents (int64).

    Rank rule: DuckDB ``percentile_disc(q)`` picks the smallest value
    whose cumulative count ≥ ceil(q·n) — verified against DuckDB for
    n = 1..300 at every q used here, and computed in exact integer
    arithmetic (``(n·q_num + 99) // 100``) so no float boundary can
    disagree with the oracle.

    At-scale shape: acctbal has a BOUNDED integer-cents domain
    (TPC-H: [-999.99, 9999.99] → ~1.1M distinct cents), so per-batch
    (segment, cents) value-count partials converge to a bounded
    histogram regardless of corpus size; the finish folds that small
    table once and selects each quantile with one cumsum +
    searchsorted per segment — no global sort, no per-value exchange.
    """
    folded = _acctbal_hist(sf_dir)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        from .util import disc_percentiles
        rows = []
        for seg, g in df.sort_values(["c_mktsegment", "cents"]) \
                         .groupby("c_mktsegment", sort=True):
            row = {"c_mktsegment": seg,
                   "n_customers": int(g["n"].sum())}
            ps = disc_percentiles(g["cents"].to_numpy(dtype=np.int64),
                                  g["n"].to_numpy(dtype=np.int64),
                                  [q for q, _ in ACCTBAL_QUANTILES])
            row.update({name: p for (_, name), p
                        in zip(ACCTBAL_QUANTILES, ps)})
            rows.append(row)
        out = pd.DataFrame(rows)
        for c in out.columns:
            if c != "c_mktsegment":
                out[c] = out[c].astype("int64")
        return out

    return folded.map_batches(final, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery (per-part avg threshold)
# ---------------------------------------------------------------------------

SMALL_QTY_BRAND = "Brand#23"
# filtered partkey sets up to this many bytes of part parquet broadcast
# as an Arrow value_set; above it (billions of parts) the semi-join
# runs co-bucketed: part keys and lineitem rows hash into the SAME
# partkey buckets and the membership test happens inside the fold
SMALL_QTY_PART_BROADCAST_MAX_BYTES = 256 << 20
SMALL_QTY_ROWS_PER_BUCKET = 1_000_000


def small_qty_revenue(sf_dir: str, brand: str = SMALL_QTY_BRAND,
                      broadcast_max_bytes: int = SMALL_QTY_PART_BROADCAST_MAX_BYTES,
                      num_buckets: int | None = None):
    """TPC-H Q17 shape: revenue from SMALL-quantity lineitems — rows
    whose quantity is under 0.2x their part's own average quantity,
    for parts of one brand. Output one row per part that has any:
    (l_partkey, n_small, small_revenue_cents).

    The correlated scalar subquery (``l_quantity < 0.2 * avg(...)``)
    is an exact INTEGER cross-multiply — ``5*q*cnt < sum_q``
    (quantities are integral) — so the engine and the DuckDB oracle
    agree bit-for-bit with no float-division epsilon.

    Shape at scale: the brand filter selects ~1/25 of parts. Below
    ``broadcast_max_bytes`` of part parquet the filtered partkeys ship
    once as a broadcast value_set and lineitem pre-filters per batch,
    so only matching rows (~4%) cross the exchange. Above it the
    semi-join is CO-BUCKETED: filtered part keys and (unfiltered)
    lineitem rows hash into the same partkey buckets and the
    membership test runs inside the bucket fold — no driver set, one
    exchange. Either way a part's lineitems all land in one bucket, so
    the per-part average and the small-row filter are bucket-local and
    exact; the per-part output never coalesces.
    """
    import os
    import ray
    from .util import bucket_count, parquet_num_rows

    n_line = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_line, SMALL_QTY_ROWS_PER_BUCKET)
    try:
        part_bytes = os.path.getsize(f"{sf_dir}/part.parquet")
    except OSError:
        part_bytes = 0

    def line_cols(batch: pa.Table) -> pa.Table:
        from .util import bucket_hash
        b = bucket_hash(
            batch["l_partkey"].to_numpy(zero_copy_only=False), num_buckets)
        return pa.table({
            "bucket": pa.array(b, pa.int64()),
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "q": pc.cast(batch["l_quantity"], pa.int64()),
            "price_c": pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100),
                                        round_mode="half_towards_infinity"),
                               pa.int64()),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out_schema = {"l_partkey": "int64", "n_small": "int64",
                      "small_revenue_cents": "int64"}
        if "kind" in df.columns:
            keys = df.loc[df["kind"] == 0, "l_partkey"].unique()
            df = df[(df["kind"] == 1) & df["l_partkey"].isin(keys)]
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_schema.items()})
        g = df.groupby("l_partkey", sort=False)["q"]
        small = df[5 * df["q"] * g.transform("size") < g.transform("sum")]
        out = small.groupby("l_partkey", as_index=False).agg(
            n_small=("q", "size"), small_revenue_cents=("price_c", "sum"))
        return out.astype(out_schema)

    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_quantity", "l_extendedprice"])

    if part_bytes <= broadcast_max_bytes:
        import pyarrow.parquet as pq
        keys = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand"])
        keys = keys.filter(pc.equal(keys["p_brand"], brand))["p_partkey"]
        ref = ray.put(pc.cast(keys.combine_chunks(), pa.int64()))

        def semi(batch: pa.Table) -> pa.Table:
            return line_cols(batch.filter(
                pc.is_in(batch["l_partkey"], value_set=ray.get(ref))))

        return lineitem.map_batches(semi, batch_format="pyarrow", batch_size=None) \
            .groupby("bucket").map_groups(fold, batch_format="pandas")

    # at-scale path: co-bucketed semi-join (kind 0 = part key row,
    # kind 1 = lineitem row; a part's rows all share one bucket)
    def tag(t: pa.Table, kind: int) -> pa.Table:
        return t.append_column("kind", pa.array([kind] * len(t), pa.int64()))

    def part_keys(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["p_brand"], brand))
        from .util import bucket_hash
        b = bucket_hash(
            batch["p_partkey"].to_numpy(zero_copy_only=False), num_buckets)
        n = len(batch)
        return tag(pa.table({
            "bucket": pa.array(b, pa.int64()),
            "l_partkey": pc.cast(batch["p_partkey"], pa.int64()),
            "q": pa.array(np.zeros(n, np.int64), pa.int64()),
            "price_c": pa.array(np.zeros(n, np.int64), pa.int64()),
        }), 0)

    parts = _read(sf_dir, "part", ["p_partkey", "p_brand"]) \
        .map_batches(part_keys, batch_format="pyarrow", batch_size=None)
    lines = lineitem.map_batches(
        lambda t: tag(line_cols(t), 1), batch_format="pyarrow",
        batch_size=None)
    return parts.union(lines).groupby("bucket") \
        .map_groups(fold, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING-filtered aggregate joined back + top-k
# ---------------------------------------------------------------------------

LARGE_ORDER_MIN_QTY = 200
LARGE_ORDER_TOPK = 100
LARGE_ORDER_ROWS_PER_BUCKET = 1_000_000
# HAVING survivors up to this many broadcast as a sorted numpy map
# (orderkey -> sum_qty) so the orders table never shuffles; above it
# the join falls back to the co-bucketed union exchange
LARGE_ORDER_SURVIVOR_BROADCAST_MAX = 5_000_000


def large_orders(sf_dir: str, min_qty: int = LARGE_ORDER_MIN_QTY,
                 k: int = LARGE_ORDER_TOPK,
                 num_buckets: int | None = None,
                 survivor_broadcast_max: int = LARGE_ORDER_SURVIVOR_BROADCAST_MAX):
    """TPC-H Q18 shape: the k highest-value orders whose total lineitem
    quantity exceeds ``min_qty`` (HAVING on an aggregate, joined back
    to the orders row). Output: (o_orderkey, o_custkey, o_orderdate_us,
    totalprice_cents, sum_qty), the global top-k by
    (totalprice_cents desc, o_orderkey asc).

    Shape at scale: per-BLOCK (o_orderkey, qty) partial sums (whole
    blocks, not 1024-row slivers — lineitem clusters by orderkey so a
    block collapses ~4x) hash into orderkey buckets and each bucket
    finishes the sum + HAVING filter. The surviving orderkeys are
    semantically rare, so below ``survivor_broadcast_max`` they
    broadcast once as a SORTED numpy map and the orders table is
    filtered per batch with one searchsorted — the fact-table join
    costs no exchange and each batch emits its local top-k. Above the
    gate the join falls back to the CO-BUCKETED union (orders rows and
    survivor partials share orderkey buckets); both paths end in a
    ≤ blocks x k global sort.
    """
    import ray
    from .util import bucket_count, parquet_num_rows

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_orders, LARGE_ORDER_ROWS_PER_BUCKET)

    def _bucket(key: np.ndarray) -> pa.Array:
        from .util import bucket_hash
        return pa.array(bucket_hash(key, num_buckets), pa.int64())

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": batch["l_orderkey"],
                      "q": pc.cast(batch["l_quantity"], pa.int64())})
        t = t.group_by("o_orderkey").aggregate([("q", "sum")]) \
            .rename_columns(["o_orderkey", "q_partial"])
        return t.append_column(
            "bucket", _bucket(t["o_orderkey"].to_numpy(zero_copy_only=False)))

    def survivor_fold(df: pd.DataFrame) -> pd.DataFrame:
        qty = df.groupby("o_orderkey", as_index=False)["q_partial"].sum() \
            .rename(columns={"q_partial": "sum_qty"})
        return qty[qty["sum_qty"] > min_qty].astype(
            {"o_orderkey": "int64", "sum_qty": "int64"})

    survivors = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
        .map_batches(qty_partial, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(survivor_fold, batch_format="pandas") \
        .materialize()

    OUT_COLS = ["o_orderkey", "o_custkey", "o_orderdate_us",
                "totalprice_cents", "sum_qty"]

    def order_cols(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "o_orderdate_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "totalprice_cents": pc.cast(
                pc.round(pc.multiply(batch["o_totalprice"], 100),
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["totalprice_cents", "o_orderkey"],
                              ascending=[False, True], kind="mergesort") \
            .head(k).reset_index(drop=True)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    if survivors.count() <= survivor_broadcast_max:
        surv = survivors.to_pandas()
        order = np.argsort(surv["o_orderkey"].to_numpy())
        sk = surv["o_orderkey"].to_numpy()[order]
        sq = surv["sum_qty"].to_numpy()[order]
        ref = ray.put((sk, sq))

        def join_batch(batch: pa.Table) -> pd.DataFrame:
            sk_, sq_ = ray.get(ref)
            t = order_cols(batch)
            ok_arr = t["o_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(sk_, ok_arr)
            pos_c = np.minimum(pos, max(len(sk_) - 1, 0))
            hit = (sk_[pos_c] == ok_arr) if len(sk_) \
                else np.zeros(len(ok_arr), bool)
            df = t.to_pandas()[hit]
            df["sum_qty"] = sq_[pos_c[hit]]
            return finish(df)[OUT_COLS].astype({c: "int64" for c in OUT_COLS})

        return orders.map_batches(join_batch, batch_format="pyarrow",
                                  batch_size=None) \
            .repartition(1).map_batches(finish, batch_format="pandas",
                                        batch_size=None)

    # at-scale fallback: co-bucketed union join (kind 0 = survivor
    # partial, kind 1 = orders row)
    def surv_rows(df: pd.DataFrame) -> pa.Table:
        from .util import bucket_hash
        b = bucket_hash(df["o_orderkey"].to_numpy(), num_buckets)
        n = len(df)
        # Arrow out: the union peer (order_rows) emits Arrow blocks and
        # the sort exchange's boundary sampler can't mix block types
        return pa.table({
            "bucket": pa.array(b, pa.int64()),
            "kind": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
            "sum_qty": pa.array(df["sum_qty"].to_numpy(), pa.int64()),
            "o_custkey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_orderdate_us": pa.array(np.zeros(n, np.int64), pa.int64()),
            "totalprice_cents": pa.array(np.zeros(n, np.int64), pa.int64())})

    def order_rows(batch: pa.Table) -> pa.Table:
        t = order_cols(batch)
        n = len(t)
        return pa.table({
            "bucket": _bucket(t["o_orderkey"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.ones(n, np.int64), pa.int64()),
            "o_orderkey": t["o_orderkey"],
            "sum_qty": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_custkey": t["o_custkey"],
            "o_orderdate_us": t["o_orderdate_us"],
            "totalprice_cents": t["totalprice_cents"],
        })

    def join_fold(df: pd.DataFrame) -> pd.DataFrame:
        qty = df[df["kind"] == 0].set_index("o_orderkey")["sum_qty"]
        o = df[df["kind"] == 1].drop(columns=["sum_qty"]) \
            .merge(qty, left_on="o_orderkey", right_index=True)
        return finish(o)[OUT_COLS].astype({c: "int64" for c in OUT_COLS})

    sp = survivors.map_batches(surv_rows, batch_format="pandas",
                               batch_size=None)
    orows = orders.map_batches(order_rows, batch_format="pyarrow",
                               batch_size=None)
    return sp.union(orows).groupby("bucket") \
        .map_groups(join_fold, batch_format="pandas") \
        .repartition(1).map_batches(finish, batch_format="pandas",
                                    batch_size=None)


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: aggregate-of-aggregate argmax with exact tie handling
# ---------------------------------------------------------------------------

TOP_SUPPLIER_START = "1996-01-01"
TOP_SUPPLIER_END = "1996-04-01"
TOP_SUPPLIER_ROWS_PER_BUCKET = 1_000_000


def top_supplier(sf_dir: str, start: str = TOP_SUPPLIER_START,
                 end: str = TOP_SUPPLIER_END,
                 num_buckets: int | None = None):
    """TPC-H Q15 shape: the supplier(s) with the MAXIMUM lineitem
    revenue in one ship-date quarter — an argmax over a grouped
    aggregate, ties kept (top-k can't express ties). Output:
    (l_suppkey, total_revenue_cents), one row per tied winner.

    Shape at scale: per-batch (suppkey, revenue) partial sums hash
    into suppkey buckets; each bucket finishes its suppliers' totals
    and emits only its LOCAL max row(s) — the global max is some
    bucket's max, so the driver-side finish sees ≤ buckets x ties
    rows, never the per-supplier table. All integer cents.
    """
    from .util import bucket_count, parquet_num_rows

    n_line = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_line, TOP_SUPPLIER_ROWS_PER_BUCKET)
    lo = pa.scalar(np.datetime64(start, "us"))
    hi = pa.scalar(np.datetime64(end, "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi)))
        rc = pc.cast(pc.round(
            pc.multiply(pc.multiply(batch["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                batch["l_discount"])), 100),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
                      "rc": rc}) \
            .group_by("l_suppkey").aggregate([("rc", "sum")]) \
            .rename_columns(["l_suppkey", "rc"])
        from .util import bucket_hash
        b = bucket_hash(t["l_suppkey"].to_numpy(zero_copy_only=False),
                        num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("l_suppkey", as_index=False)["rc"].sum()
        return tot[tot["rc"] == tot["rc"].max()]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"l_suppkey": pd.Series([], dtype="int64"),
                                 "total_revenue_cents": pd.Series([], dtype="int64")})
        out = df[df["rc"] == df["rc"].max()] \
            .rename(columns={"rc": "total_revenue_cents"}) \
            .sort_values("l_suppkey").reset_index(drop=True)
        return out.astype({"l_suppkey": "int64",
                           "total_revenue_cents": "int64"})

    return _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(bucket_max, batch_format="pandas") \
        .repartition(1).map_batches(finish, batch_format="pandas",
                                    batch_size=None)


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: two-level distinct aggregation across a dimension join
# ---------------------------------------------------------------------------

PSC_TYPES = ("ECONOMY", "STANDARD", "SMALL")
PSC_ROWS_PER_BUCKET = 1_000_000
# filtered part attribute maps up to this many bytes of part parquet
# broadcast as numpy arrays (searchsorted lookup per batch); above it
# the dimension join runs co-bucketed by partkey hash
PSC_PART_BROADCAST_MAX_BYTES = 256 << 20
# (brand x size groups) x suppliers bounds the distinct-tuple count;
# below this many the global dedup+count folds in ONE partition (a few
# MB of fixed-width tuples), above it tuples re-bucket by suppkey hash
PSC_DRIVER_FOLD_MAX_TUPLES = 5_000_000


def part_supplier_counts(sf_dir: str, types: tuple[str, ...] = PSC_TYPES,
                         num_buckets: int | None = None,
                         broadcast_max_bytes: int = PSC_PART_BROADCAST_MAX_BYTES,
                         driver_fold_max_tuples: int = PSC_DRIVER_FOLD_MAX_TUPLES):
    """TPC-H Q16 shape: DISTINCT supplier count per (p_brand, p_size)
    over the distinct (part, supplier) pairs observed in lineitem, for
    parts of the selected types. Output: (p_brand, p_size,
    supplier_cnt) — a two-level distinct aggregation (pair-distinct,
    then count-distinct) threaded through a dimension join.

    Three size-gated shapes (all tested for agreement):

    - part below ``broadcast_max_bytes``: the filtered
      partkey → (brand, size) map broadcasts once as SORTED numpy
      arrays and each lineitem batch resolves attributes with one
      ``searchsorted`` + emits its LOCAL distinct (brand, size,
      suppkey) tuples — the dimension join costs no exchange at all;
      brand travels as a small-int code, decoded only in the finish.
    - coalesced-tuple bound below ``driver_fold_max_tuples``: the
      already-collapsed tuples coalesce to ONE partition for the
      global dedup + count (a few MB fixed-width). The bound is
      min(lineitem rows, read blocks x groups x suppliers) — each
      BLOCK can emit up to the distinct-tuple bound, so the gate
      prices the block count too, not just distinct tuples.
    - above either gate: tuples re-bucket by SUPPKEY hash (every copy
      of a tuple shares its suppkey, so bucket-local dedup is globally
      exact) and the bounded-key partial counts sum in a tiny finish;
      a too-large part table falls back to the CO-BUCKETED union join
      (part attribute rows and per-batch distinct pairs hash into the
      same partkey buckets).
    """
    import os
    import ray
    from .util import bucket_count, parquet_num_rows

    n_line = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_line, PSC_ROWS_PER_BUCKET)
    type_set = pa.array(list(types), pa.string())
    try:
        part_bytes = os.path.getsize(f"{sf_dir}/part.parquet")
    except OSError:
        part_bytes = 0

    def _bucket(key: np.ndarray) -> pa.Array:
        from .util import bucket_hash
        return pa.array(bucket_hash(key, num_buckets), pa.int64())

    def count_fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["p_brand", "p_size", "l_suppkey"]].drop_duplicates()
        out = d.groupby(["p_brand", "p_size"], as_index=False).size() \
            .rename(columns={"size": "supplier_cnt"})
        return out.astype({"p_size": "int64", "supplier_cnt": "int64"})

    def _count_tuples(tuples, single_partition: bool, fold=count_fold):
        # tuples: (<brand col>, p_size, l_suppkey [, bucket2]) streams
        if single_partition:
            return tuples.repartition(1).map_batches(
                fold, batch_format="pandas", batch_size=None)
        return _finish_grouped_sums(
            tuples.groupby("bucket2").map_groups(fold,
                                                 batch_format="pandas"),
            ["p_brand", "p_size"])

    if part_bytes <= broadcast_max_bytes:
        import pyarrow.parquet as pq
        pt = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_type", "p_size"])
        pt = pt.filter(pc.is_in(pt["p_type"], value_set=type_set))
        order = pc.sort_indices(pt["p_partkey"])
        pk = pt["p_partkey"].take(order).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        brand_dict = pc.dictionary_encode(
            pt["p_brand"].take(order).combine_chunks())
        brands = brand_dict.chunk(0).dictionary.to_pylist() \
            if isinstance(brand_dict, pa.ChunkedArray) \
            else brand_dict.dictionary.to_pylist()
        bidx = (brand_dict.chunk(0).indices if isinstance(brand_dict, pa.ChunkedArray)
                else brand_dict.indices).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        size = pt["p_size"].take(order).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_groups = len({(b, s) for b, s in zip(bidx.tolist(), size.tolist())})
        n_supp = parquet_num_rows(f"{sf_dir}/supplier.parquet")
        # the one-partition coalesce holds per-BLOCK distinct tuples,
        # so bound blocks x (groups x suppliers), capped by total rows
        try:
            line_bytes = os.path.getsize(f"{sf_dir}/lineitem.parquet")
        except OSError:
            line_bytes = 0
        est_blocks = max(1, -(-line_bytes // (128 << 20)))
        single = min(n_line, est_blocks * n_groups * n_supp) \
            <= driver_fold_max_tuples
        ref = ray.put((pk, bidx, size))

        def tuples_batch(batch: pa.Table) -> pa.Table:
            pk_, bidx_, size_ = ray.get(ref)
            lp = batch["l_partkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ls = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos = np.searchsorted(pk_, lp)
            pos_c = np.minimum(pos, max(len(pk_) - 1, 0))
            ok = (pk_[pos_c] == lp) if len(pk_) else np.zeros(len(lp), bool)
            df = pd.DataFrame({"b": bidx_[pos_c[ok]], "p_size": size_[pos_c[ok]],
                               "l_suppkey": ls[ok]}).drop_duplicates()
            # brand stays an int CODE through the exchange (a third of
            # the bytes of the string); decoded only in the count fold
            t = pa.table({"b": pa.array(df["b"].to_numpy(), pa.int64()),
                          "p_size": pa.array(df["p_size"].to_numpy(), pa.int64()),
                          "l_suppkey": pa.array(df["l_suppkey"].to_numpy(),
                                                pa.int64())})
            if single:
                return t
            from .util import bucket_hash
            b2 = bucket_hash(df["l_suppkey"].to_numpy(), num_buckets)
            return t.append_column("bucket2", pa.array(b2, pa.int64()))

        def count_fold_codes(df: pd.DataFrame) -> pd.DataFrame:
            d = df[["b", "p_size", "l_suppkey"]].drop_duplicates()
            out = d.groupby(["b", "p_size"], as_index=False).size() \
                .rename(columns={"size": "supplier_cnt"})
            out["p_brand"] = np.asarray(brands, dtype=object)[
                out["b"].to_numpy()]
            return out[["p_brand", "p_size", "supplier_cnt"]] \
                .astype({"p_size": "int64", "supplier_cnt": "int64"})

        tuples = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
            .map_batches(tuples_batch, batch_format="pyarrow", batch_size=None)
        return _count_tuples(tuples, single, fold=count_fold_codes)

    # huge-part path: co-bucketed union join by partkey hash
    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
                      "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64())}) \
            .group_by(["l_partkey", "l_suppkey"]).aggregate([])
        n = len(t)
        return pa.table({
            "bucket": _bucket(t["l_partkey"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.ones(n, np.int64), pa.int64()),
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "p_brand": pa.array([""] * n, pa.string()),
            "p_size": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    def part_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["p_type"], value_set=type_set))
        n = len(batch)
        return pa.table({
            "bucket": _bucket(batch["p_partkey"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.zeros(n, np.int64), pa.int64()),
            "l_partkey": pc.cast(batch["p_partkey"], pa.int64()),
            "l_suppkey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "p_brand": batch["p_brand"],
            "p_size": pc.cast(batch["p_size"], pa.int64()),
        })

    def join_fold(df: pd.DataFrame) -> pd.DataFrame:
        attrs = df[df["kind"] == 0][["l_partkey", "p_brand", "p_size"]]
        pairs = df[df["kind"] == 1][["l_partkey", "l_suppkey"]] \
            .drop_duplicates()
        j = pairs.merge(attrs, on="l_partkey")
        tup = j[["p_brand", "p_size", "l_suppkey"]].drop_duplicates()
        from .util import bucket_hash
        tup = tup.copy()
        tup["bucket2"] = bucket_hash(tup["l_suppkey"].to_numpy(), num_buckets)
        return tup

    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
    parts = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(part_rows, batch_format="pyarrow", batch_size=None)
    tuples = parts.union(pairs).groupby("bucket") \
        .map_groups(join_fold, batch_format="pandas")
    return _count_tuples(tuples, single_partition=False)


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: per-order multi-entity uniqueness fold
# ---------------------------------------------------------------------------

LAGGARD_GRACE_DAYS = 30
LAGGARD_TOPK = 100
LAGGARD_ROWS_PER_BUCKET = 1_000_000
_US_PER_DAY = 86_400_000_000


def order_laggards(sf_dir: str, grace_days: int = LAGGARD_GRACE_DAYS,
                   k: int = LAGGARD_TOPK, num_buckets: int | None = None):
    """TPC-H Q21 shape: suppliers who were the SOLE laggard on
    multi-supplier orders — their first shipment left more than
    ``grace_days`` after the order's first shipment, and no other
    supplier on the order was late. Output: (l_suppkey, numwait), the
    top-k by (numwait desc, l_suppkey asc).

    Shape at scale, two bounded exchanges:
    1. per-batch (orderkey, suppkey, min_shipdate) partials — min is
       mergeable — hash into orderkey buckets; an order's rows all
       land in one bucket, so the per-order fold (distinct-supplier
       count, order min, laggard test, exactly-one filter) is
       bucket-local and exact, and each bucket emits tiny
       (suppkey, numwait) partial counts;
    2. partials re-bucket by suppkey hash, sum, and each bucket emits
       its LOCAL top-k — the final sort sees ≤ buckets x k rows.
    """
    from .util import bucket_count, parquet_num_rows

    n_line = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_line, LAGGARD_ROWS_PER_BUCKET)
    grace_us = grace_days * _US_PER_DAY

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                      "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
                      "smn": pc.cast(batch["l_shipdate"], pa.int64())}) \
            .group_by(["o_orderkey", "l_suppkey"]).aggregate([("smn", "min")]) \
            .rename_columns(["o_orderkey", "l_suppkey", "smn"])
        from .util import bucket_hash
        b = bucket_hash(t["o_orderkey"].to_numpy(zero_copy_only=False),
                        num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def order_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_orderkey", "l_suppkey"], as_index=False)["smn"].min()
        per_order = g.groupby("o_orderkey")["smn"]
        mn = per_order.transform("min")
        ns = per_order.transform("size")
        lag = g[(ns >= 2) & (g["smn"] > mn + grace_us)]
        only = lag.groupby("o_orderkey")["l_suppkey"].transform("size") == 1
        lag = lag[only]
        out = lag.groupby("l_suppkey", as_index=False).size() \
            .rename(columns={"size": "numwait"})
        from .util import bucket_hash
        out = out.copy()
        out["bucket2"] = bucket_hash(out["l_suppkey"].to_numpy(), num_buckets)
        return out

    def supp_fold(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("l_suppkey", as_index=False)["numwait"].sum()
        tot = tot.sort_values(["numwait", "l_suppkey"],
                              ascending=[False, True], kind="mergesort").head(k)
        return tot.astype({"l_suppkey": "int64", "numwait": "int64"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["numwait", "l_suppkey"],
                              ascending=[False, True], kind="mergesort") \
            .head(k).reset_index(drop=True)

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(order_fold, batch_format="pandas") \
        .groupby("bucket2").map_groups(supp_fold, batch_format="pandas") \
        .repartition(1).map_batches(finish, batch_format="pandas",
                                    batch_size=None)


# ---------------------------------------------------------------------------
# integer-exact anomaly flags over the event stream
# ---------------------------------------------------------------------------

# flag days with (n - mean)^2 > K2 * variance (population), upper side
EVENT_SPIKE_K2 = 2


def event_spike_days(sf_dir: str, k2: int = EVENT_SPIKE_K2):
    """Volume-anomaly detection over the event log: per event type,
    the days whose event count exceeds the type's mean by more than
    sqrt(k2) population standard deviations — WITHOUT any float or
    sqrt: ``(n - mu)^2 > k2 * sigma^2`` cross-multiplies to the exact
    integer test ``cnt*n > sum AND (cnt*n - sum)^2 >
    k2*(cnt*sumsq - sum^2)``. Output: (event_type, day_us, n) for
    flagged days only.

    Shape at scale: per-batch (event_type, day) partial counts fold
    through the bounded-key finish (types x days grows with TIME, not
    corpus size); the flag pass runs on that bounded table with
    Python ints — the squares exceed int64 at web-scale daily volumes,
    so the fold is arbitrary-precision exact (the pmi_bigrams
    precedent), and the DuckDB twin runs the same algebra in HUGEINT.
    """
    from .util import finish_grouped

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (ts // day_us) * day_us
        return pa.table({"event_type": batch["event_type"],
                         "day_us": pa.array(day, pa.int64())}) \
            .group_by(["event_type", "day_us"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "day_us", "n"])

    folded = finish_grouped(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "day_us"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        out_t, out_d, out_n = [], [], []
        for et, g in df.groupby("event_type", sort=True):
            ns = [int(x) for x in g["n"]]
            cnt, sm = len(ns), sum(ns)
            den = k2 * (cnt * sum(x * x for x in ns) - sm * sm)
            for day, nv in zip(g["day_us"].tolist(), ns):
                dev = cnt * nv - sm
                if dev > 0 and dev * dev > den:
                    out_t.append(et)
                    out_d.append(int(day))
                    out_n.append(nv)
        return pd.DataFrame({
            "event_type": pd.Series(out_t, dtype="object"),
            "day_us": pd.Series(out_d, dtype="int64"),
            "n": pd.Series(out_n, dtype="int64")})

    return folded.map_batches(flag, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# inter-arrival gap distribution (per-entity lag -> bounded histogram)
# ---------------------------------------------------------------------------

GAP_ROWS_PER_BUCKET = 1_000_000


def interorder_gaps(sf_dir: str, num_buckets: int | None = None):
    """Inter-arrival distribution: the histogram of DAY gaps between a
    customer's consecutive orders (ordered by date, orderkey) — the
    per-entity lag() folded to a global bounded histogram. Output:
    (gap_days, n), one row per observed gap length.

    Shape at scale: orders hash into ~1M-row custkey buckets (a
    customer's orders land in one bucket), each bucket sorts once and
    diffs vectorized over every customer at once (shift + same-key
    mask, never per customer); each bucket emits its own partial
    histogram, so the exchange out is bounded by the date range in
    days — time-bounded, not corpus-bounded.
    """
    from .util import bucket_count, bucket_hash, finish_grouped, parquet_num_rows

    day_us = 86_400_000_000
    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_orders, GAP_ROWS_PER_BUCKET)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(bucket_hash(key, num_buckets), pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "ts": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderkey": batch["o_orderkey"],
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "ts", "o_orderkey"],
                            kind="mergesort")
        cust = df["o_custkey"].to_numpy()
        ts = df["ts"].to_numpy()
        same = cust[1:] == cust[:-1]
        gaps = (ts[1:] - ts[:-1])[same] // day_us
        vals, counts = np.unique(gaps, return_counts=True)
        return pd.DataFrame({"gap_days": vals.astype("int64"),
                             "n": counts.astype("int64")})

    return finish_grouped(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
          .groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["gap_days"])


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share per ship month (integer num/den)
# ---------------------------------------------------------------------------

PROMO_TYPE = "PROMO"
PART_DIM_BROADCAST_MAX_BYTES = 256 << 20


def promo_revenue(sf_dir: str, promo_type: str = PROMO_TYPE,
                  broadcast_max_bytes: int = PART_DIM_BROADCAST_MAX_BYTES,
                  num_partitions: int | None = None):
    """TPC-H Q14 shape, per ship month: promo-part revenue share kept
    integer-exact as a (numerator, denominator) cent-sum pair —
    (ship_month, promo_cents, total_cents) — instead of the float
    percentage (transcendental-free oracle parity; divide at the edge).
    ship_month = year*100 + month of l_shipdate.

    Shape at scale: part is the small dim — below the byte gate the
    promo partkeys broadcast once as a SORTED numpy array and every
    lineitem batch flags membership with one searchsorted, so the fact
    table never shuffles; above the gate the flag attaches via a
    hash-partitioned ``Dataset.join`` on partkey. Either way each
    batch folds to <= |months| partial rows before the bounded-key
    finish, so the exchange out is time-bounded, not corpus-bounded.
    """
    import os
    import ray
    import pyarrow.parquet as pq

    def month_col(ship: pa.ChunkedArray) -> pa.Array:
        return pc.cast(pc.add(pc.multiply(pc.year(ship), 100),
                              pc.month(ship)), pa.int64())

    def rev_col(batch: pa.Table) -> pa.Array:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pc.cast(pc.round(pc.multiply(rev, 100),
                                round_mode="half_towards_infinity"),
                       pa.int64())

    def fold_partial(month, rev_c, is_promo) -> pa.Table:
        t = pa.table({
            "ship_month": month,
            "total_c": rev_c,
            "promo_c": pc.if_else(is_promo, rev_c, pa.scalar(0, pa.int64())),
        })
        g = t.group_by("ship_month").aggregate(
            [("promo_c", "sum"), ("total_c", "sum")])
        return g.rename_columns(["ship_month", "promo_cents", "total_cents"])

    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])
    try:
        part_bytes = os.path.getsize(f"{sf_dir}/part.parquet")
    except OSError:
        part_bytes = 0

    if part_bytes <= broadcast_max_bytes:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
        promo = np.sort(part.filter(pc.equal(part["p_type"], promo_type))
                        ["p_partkey"].to_numpy(zero_copy_only=False))
        pref = ray.put(promo)

        def partial(batch: pa.Table) -> pa.Table:
            pk_sorted = ray.get(pref)
            pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(pk_sorted, pk)
            pos_c = np.minimum(pos, max(len(pk_sorted) - 1, 0))
            hit = (pk_sorted[pos_c] == pk) if len(pk_sorted) \
                else np.zeros(len(pk), bool)
            return fold_partial(month_col(batch["l_shipdate"]),
                                rev_col(batch), pa.array(hit))

        return _finish_grouped_sums(
            lineitem.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None), ["ship_month"])

    # at-scale fallback: hash-partitioned flag join on partkey —
    # partition count sized by BOTH join inputs (the lineitem side
    # dominates the exchange, not the dim)
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            li_bytes = os.path.getsize(f"{sf_dir}/lineitem.parquet")
        except OSError:
            li_bytes = 0
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-(part_bytes + li_bytes) // (128 << 20))))

    def li_project(batch: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": batch["l_partkey"],
                         "ship_month": month_col(batch["l_shipdate"]),
                         "rev_c": rev_col(batch)})

    part_ds = _map_pa(
        _read(sf_dir, "part", ["p_partkey", "p_type"]),
        lambda t: pa.table({
            "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "is_promo": pc.equal(t["p_type"], promo_type)}))
    j = _inner_join(_map_pa(lineitem, li_project),
                    part_ds, num_partitions,
                    ("l_partkey",), ("p_partkey",))

    def partial_joined(batch: pa.Table) -> pa.Table:
        return fold_partial(batch["ship_month"], batch["rev_c"],
                            batch["is_promo"])

    return _finish_grouped_sums(
        j.map_batches(partial_joined, batch_format="pyarrow",
                      batch_size=None), ["ship_month"])


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: priority-class line counts per lineitem flag
# ---------------------------------------------------------------------------

RFP_FLAGS = ("R", "A")
RFP_HIGH = ("1-URGENT", "2-HIGH")
RFP_FROM = "1996-01-01"
RFP_TO = "1997-01-01"
RFP_ROWS_PER_BUCKET = 1_000_000


def returnflag_priority(sf_dir: str, flags=RFP_FLAGS, high=RFP_HIGH,
                        date_from: str = RFP_FROM, date_to: str = RFP_TO,
                        num_buckets: int | None = None):
    """TPC-H Q12 shape (shipmode -> l_returnflag: the synthetic
    lineitem has no shipmode/commitdate columns): per return flag in
    ``flags``, how many lineitems shipped in [date_from, date_to)
    belong to HIGH-priority orders (o_orderpriority in ``high``) vs
    all others. Output: (l_returnflag, high_line_count,
    low_line_count) sorted by flag — the CASE-pivot join shape of
    ref Q12 (reference has no SQL engine; shape from the TPC-H spec).

    Shape at scale: the lineitem side folds to per-batch
    (orderkey, flag, n) count partials with the shipdate window
    pushed into the scan; the orders side ships (orderkey, is_high)
    — one bit of payload per row, no text, no wide columns. Both
    co-bucket on the orderkey hash, each bucket joins vectorized and
    emits <= |flags| partial rows, and the finish sums a bounded key
    set driver-side. The only exchange carries fixed-width ints.
    """
    from .util import bucket_count, bucket_hash, parquet_num_rows

    lo_us = int(np.datetime64(date_from, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_to, "us").astype(np.int64))

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_orders, RFP_ROWS_PER_BUCKET)

    def _bucket(key: np.ndarray) -> pa.Array:
        return pa.array(bucket_hash(key, num_buckets), pa.int64())

    # union schema: bucket, kind (0 = lineitem count partial,
    # 1 = order row), o_orderkey, l_returnflag, n, is_high
    def li_partial(batch: pa.Table) -> pa.Table:
        sd = pc.cast(batch["l_shipdate"], pa.int64())
        mask = pc.and_(
            pc.and_(pc.greater_equal(sd, pa.scalar(lo_us)),
                    pc.less(sd, pa.scalar(hi_us))),
            pc.is_in(batch["l_returnflag"],
                     value_set=pa.array(list(flags), pa.string())))
        t = pa.table({"o_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                      "l_returnflag": batch["l_returnflag"]}).filter(mask)
        t = t.append_column("n", pa.array(np.ones(len(t), np.int64)))
        t = t.group_by(["o_orderkey", "l_returnflag"]) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["o_orderkey", "l_returnflag", "n"])
        k = len(t)
        return pa.table({
            "bucket": _bucket(t["o_orderkey"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.zeros(k, np.int64), pa.int64()),
            "o_orderkey": t["o_orderkey"],
            "l_returnflag": t["l_returnflag"],
            "n": t["n"],
            "is_high": pa.array(np.zeros(k, np.int64), pa.int64()),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        ok = pc.cast(batch["o_orderkey"], pa.int64())
        ish = pc.cast(pc.is_in(batch["o_orderpriority"],
                               value_set=pa.array(list(high), pa.string())),
                      pa.int64())
        k = len(batch)
        return pa.table({
            "bucket": _bucket(ok.to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.ones(k, np.int64), pa.int64()),
            "o_orderkey": ok,
            "l_returnflag": pa.array([""] * k, pa.string()),
            "n": pa.array(np.zeros(k, np.int64), pa.int64()),
            "is_high": ish,
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        li = df[df["kind"] == 0]
        if not len(li):
            return pd.DataFrame({
                "l_returnflag": pd.Series([], dtype=object),
                "high_line_count": pd.Series([], dtype="int64"),
                "low_line_count": pd.Series([], dtype="int64")})
        hi = df[df["kind"] == 1].set_index("o_orderkey")["is_high"]
        # every lineitem has its order in the same bucket (FK); the
        # fillna only guards a malformed corpus
        got = li["o_orderkey"].map(hi).fillna(0).to_numpy(dtype=np.int64)
        n = li["n"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({
            "l_returnflag": li["l_returnflag"].to_numpy(),
            "high_line_count": np.where(got == 1, n, 0).astype(np.int64),
            "low_line_count": np.where(got == 1, 0, n).astype(np.int64)})
        return out.groupby("l_returnflag", as_index=False).sum()

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"],
               window=("l_shipdate", np.datetime64(date_from, "us"),
                       np.datetime64(date_to, "us"))) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=None)
    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .map_batches(order_rows, batch_format="pyarrow", batch_size=None)
    return _finish_grouped_sums(
        li.union(o).groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["l_returnflag"])


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join — orders with a late lineitem
# ---------------------------------------------------------------------------

LATE_GRACE_DAYS = 90
LATE_FROM = "1996-01-01"
LATE_TO = "1996-07-01"
LATE_ROWS_PER_BUCKET = 1_000_000


def late_shipment_priority(sf_dir: str, date_from: str = LATE_FROM,
                           date_to: str = LATE_TO,
                           grace_days: int = LATE_GRACE_DAYS,
                           num_buckets: int | None = None):
    """TPC-H Q4 shape: per order priority, how many orders placed in
    [date_from, date_to) had at least ONE lineitem shipped more than
    ``grace_days`` after the order date (EXISTS semi-join). Output:
    (o_orderpriority, n_orders, n_late) — window order count and late
    order count, so the late rate is an integer pair.

    Shape at scale: EXISTS(l_shipdate > o_orderdate + g) is equivalent
    to max(l_shipdate) > o_orderdate + g, so the lineitem side folds
    to one (orderkey, max_ship) partial per batch — and lineitems with
    l_shipdate <= date_from + g are pruned at the read since no window
    order can be flagged by them. Partials and window orders co-bucket
    on the orderkey hash (``util.bucket_hash``), each bucket finishes
    the max + left merge + per-priority count vectorized, and the
    finish sums <= |priorities| keys.
    """
    from .util import bucket_count, bucket_hash, parquet_num_rows

    day_us = 86_400_000_000
    lo_us = int(np.datetime64(date_from, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_to, "us").astype(np.int64))
    grace_us = grace_days * day_us

    n_orders = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_orders, LATE_ROWS_PER_BUCKET)

    def _bucket(key: np.ndarray) -> pa.Array:
        return pa.array(bucket_hash(key, num_buckets), pa.int64())

    # union schema: bucket, kind (0 = lineitem max partial, 1 = order
    # row), o_orderkey, ms_us, odate_us, o_orderpriority
    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": batch["l_orderkey"],
                      "ms_us": pc.cast(batch["l_shipdate"], pa.int64())})
        # prune: a shipment at or before date_from + grace can never
        # flag a window order (o_orderdate >= date_from)
        t = t.filter(pc.greater(t["ms_us"], pa.scalar(lo_us + grace_us)))
        t = t.group_by("o_orderkey").aggregate([("ms_us", "max")]) \
            .rename_columns(["o_orderkey", "ms_us"])
        n = len(t)
        return pa.table({
            "bucket": _bucket(t["o_orderkey"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "ms_us": t["ms_us"],
            "odate_us": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_orderpriority": pa.array([""] * n, pa.string()),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        od = pc.cast(batch["o_orderdate"], pa.int64())
        t = pa.table({"o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                      "odate_us": od,
                      "o_orderpriority": batch["o_orderpriority"]})
        t = t.filter(pc.and_(pc.greater_equal(t["odate_us"], pa.scalar(lo_us)),
                             pc.less(t["odate_us"], pa.scalar(hi_us))))
        n = len(t)
        return pa.table({
            "bucket": _bucket(t["o_orderkey"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.ones(n, np.int64), pa.int64()),
            "o_orderkey": t["o_orderkey"],
            "ms_us": pa.array(np.zeros(n, np.int64), pa.int64()),
            "odate_us": t["odate_us"],
            "o_orderpriority": t["o_orderpriority"],
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # re-max the block-level partials (a batch never sees a whole
        # orderkey run), left-merge onto the window orders, flag late
        ms = df[df["kind"] == 0].groupby("o_orderkey")["ms_us"].max()
        o = df[df["kind"] == 1]
        if not len(o):
            return pd.DataFrame({"o_orderpriority": pd.Series([], dtype=object),
                                 "n_orders": pd.Series([], dtype="int64"),
                                 "n_late": pd.Series([], dtype="int64")})
        got = o["o_orderkey"].map(ms)
        late = (got.fillna(np.iinfo(np.int64).min).to_numpy()
                > o["odate_us"].to_numpy() + grace_us)
        out = pd.DataFrame({"o_orderpriority": o["o_orderpriority"].to_numpy(),
                            "n_orders": np.ones(len(o), np.int64),
                            "n_late": late.astype(np.int64)})
        return out.groupby("o_orderpriority", as_index=False).sum()

    import pyarrow.dataset as pds
    # strict > stays the scan predicate; the window check is inclusive
    # on lo, i.e. conservative for this bound
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"],
               predicate=pds.field("l_shipdate")
               > np.datetime64(lo_us + grace_us, "us"),
               window=("l_shipdate", np.datetime64(lo_us + grace_us, "us"),
                       None)) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=None)
    o = _read(sf_dir, "orders",
              ["o_orderkey", "o_orderdate", "o_orderpriority"],
              window=("o_orderdate",
                                 np.datetime64(date_from, "us"),
                                 np.datetime64(date_to, "us"))) \
        .map_batches(order_rows, batch_format="pyarrow", batch_size=None)
    return _finish_grouped_sums(
        li.union(o).groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["o_orderpriority"])


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: cross-nation trade volume by year
# ---------------------------------------------------------------------------

TRADE_NATION_A = "NATION_1"
TRADE_NATION_B = "NATION_2"
TRADE_FROM = "1995-01-01"
TRADE_TO = "1997-01-01"


def nation_trade_volume(sf_dir: str, nation_a: str = TRADE_NATION_A,
                        nation_b: str = TRADE_NATION_B,
                        date_from: str = TRADE_FROM, date_to: str = TRADE_TO,
                        broadcast_max_bytes: int = CUSTOMER_DIM_BROADCAST_MAX_BYTES,
                        num_partitions: int | None = None):
    """TPC-H Q7 shape: revenue shipped between two nations by year —
    lineitems whose SUPPLIER sits in one nation and whose ordering
    CUSTOMER sits in the other, l_shipdate in [date_from, date_to),
    grouped by (supp_nation, cust_nation, l_year). Revenue is per-row
    cents (round half-away) so the DuckDB oracle sums identically.

    Shape at scale: both dimension attaches (supplier nation onto
    lineitem, customer nation onto orders) broadcast a sorted-numpy
    key->nation map RESTRICTED to the two nations below the byte gate
    (the fact scan filters to ~2/|nations| of rows with one
    searchsorted, no exchange) and fall back to a hash-partitioned
    ``Dataset.join`` above it. The one unavoidable large-large
    exchange is lineitem⋈orders on the orderkey — both sides already
    filtered to the nation pair and the date window before it moves.
    Partials fold to <= 2*2*|years| rows before the bounded-key finish.
    """
    import os
    import ray
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = {nm: k for k, nm in zip(nation["n_nationkey"].to_pylist(),
                                 nation["n_name"].to_pylist())
          if nm in (nation_a, nation_b)}
    if len(nk) != 2:
        raise ValueError(f"nations not found: {nation_a}, {nation_b}")
    names = {v: k for k, v in nk.items()}
    allowed = np.sort(np.array(list(names), np.int64))
    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            nbytes = os.path.getsize(f"{sf_dir}/lineitem.parquet") \
                + os.path.getsize(f"{sf_dir}/orders.parquet")
        except OSError:
            nbytes = 0
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-nbytes // (128 << 20))))

    def li_project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi)))
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "l_year": pc.cast(pc.year(batch["l_shipdate"]), pa.int64()),
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    li = _attach_dim_value(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
               "l_shipdate"],
              window=("l_shipdate",
                                 np.datetime64(date_from, "us"),
                                 np.datetime64(date_to, "us"))),
        sf_dir, "supplier", "s_suppkey", "s_nationkey", "l_suppkey", "s_nat",
        broadcast_max_bytes, num_partitions, allowed=allowed,
        project=li_project)

    def o_project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
        })

    o = _attach_dim_value(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        sf_dir, "customer", "c_custkey", "c_nationkey", "o_custkey", "c_nat",
        broadcast_max_bytes, num_partitions, allowed=allowed,
        project=o_project)

    j = _inner_join(li, o, num_partitions,
                    ("l_orderkey",), ("o_orderkey",))
    name_ref = ray.put(dict(names))

    def partial(batch: pa.Table) -> pa.Table:
        nm = ray.get(name_ref)
        batch = batch.filter(pc.not_equal(batch["s_nat"], batch["c_nat"]))
        g = pa.table({"s_nat": batch["s_nat"], "c_nat": batch["c_nat"],
                      "l_year": batch["l_year"], "rev_c": batch["rev_c"]}) \
            .group_by(["s_nat", "c_nat", "l_year"]) \
            .aggregate([("rev_c", "sum")])
        return pa.table({
            "supp_nation": pa.array([nm[s] for s in g["s_nat"].to_pylist()],
                                    pa.string()),
            "cust_nation": pa.array([nm[c] for c in g["c_nat"].to_pylist()],
                                    pa.string()),
            "l_year": g["l_year"],
            "revenue_cents": g["rev_c_sum"],
        })

    return _finish_grouped_sums(
        j.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["supp_nation", "cust_nation", "l_year"])


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region, by order year
# ---------------------------------------------------------------------------

MKT_REGION = "EUROPE"
MKT_PART_TYPE = "ECONOMY"
MKT_NATION = "NATION_7"
MKT_FROM = "1995-01-01"
MKT_TO = "1997-01-01"


def market_share(sf_dir: str, region: str = MKT_REGION,
                 part_type: str = MKT_PART_TYPE, nation: str = MKT_NATION,
                 date_from: str = MKT_FROM, date_to: str = MKT_TO,
                 broadcast_max_bytes: int = CUSTOMER_DIM_BROADCAST_MAX_BYTES,
                 num_partitions: int | None = None):
    """TPC-H Q8 shape: of the revenue for one part type sold to
    customers in one region (orders in [date_from, date_to)), what
    share came from suppliers of one nation — kept integer-exact as
    (o_year, nation_cents, total_cents) instead of the float share
    (divide at the edge).

    Shape at scale: three gated dimension attaches
    (``_attach_dim_value``) — part membership (type filter, semi-join
    on partkey), supplier nation (attach, compare to the target key),
    customer region membership (semi-join on the region's nationkeys)
    — each broadcast-searchsorted below the byte gate, hash join
    above. The one large-large exchange is lineitem⋈orders on the
    orderkey, both sides pre-filtered. Partials fold to <= |years|
    rows before the bounded-key finish.
    """
    import os
    import ray
    import pyarrow.parquet as pq

    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {rk for rk, rn in zip(region_t["r_regionkey"].to_pylist(),
                                  region_t["r_name"].to_pylist())
             if rn == region}
    region_nations = np.sort(np.array(
        [nk for nk, rg in zip(nation_t["n_nationkey"].to_pylist(),
                              nation_t["n_regionkey"].to_pylist())
         if rg in rkeys], np.int64))
    target = [nk for nk, nm in zip(nation_t["n_nationkey"].to_pylist(),
                                   nation_t["n_name"].to_pylist())
              if nm == nation]
    if not target or not len(region_nations):
        raise ValueError(f"unknown nation {nation!r} / region {region!r}")
    target_key = int(target[0])
    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            nbytes = os.path.getsize(f"{sf_dir}/lineitem.parquet") \
                + os.path.getsize(f"{sf_dir}/orders.parquet")
        except OSError:
            nbytes = 0
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-nbytes // (128 << 20))))

    def li_project(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    # part side: membership of the one type. The string p_type can't
    # ride the int64 helper, so gate by hand: below the byte gate the
    # matching partkeys read once driver-side and broadcast as a
    # sorted array (one searchsorted per batch); above it the dim
    # stream filters by p_type and semi-joins on the partkey.
    li_raw = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_suppkey",
                    "l_extendedprice", "l_discount"])
    try:
        part_bytes = os.path.getsize(f"{sf_dir}/part.parquet")
    except OSError:
        part_bytes = 0

    if part_bytes <= broadcast_max_bytes:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
        type_keys = np.sort(
            part.filter(pc.equal(part["p_type"], part_type))
            ["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        tref = ray.put(type_keys)

        def part_semi(batch: pa.Table) -> pa.Table:
            ks = ray.get(tref)
            t = li_project(batch)
            fk = t["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ks, fk), max(len(ks) - 1, 0))
            hit = (ks[pos] == fk) if len(ks) else np.zeros(len(fk), bool)
            return t.filter(pa.array(hit))

        li = _map_pa(li_raw, part_semi)
    else:
        part_ds = _map_pa(
            _read(sf_dir, "part", ["p_partkey", "p_type"]),
            lambda t: pa.table({
                "p_partkey": pc.cast(t["p_partkey"], pa.int64())})
            .filter(pc.equal(t["p_type"], part_type)))
        li = _inner_join(
            _map_pa(li_raw, li_project),
            part_ds, num_partitions, ("l_partkey",), ("p_partkey",))

    li = _attach_dim_value(
        li, sf_dir, "supplier", "s_suppkey", "s_nationkey", "l_suppkey",
        "s_nat", broadcast_max_bytes, num_partitions)

    def o_project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo),
            pc.less(batch["o_orderdate"], hi)))
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
        })

    o = _attach_dim_value(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
              window=("o_orderdate",
                                 np.datetime64(date_from, "us"),
                                 np.datetime64(date_to, "us"))),
        sf_dir, "customer", "c_custkey", "c_nationkey", "o_custkey", None,
        broadcast_max_bytes, num_partitions, allowed=region_nations,
        project=o_project)

    j = _inner_join(li, o, num_partitions,
                    ("l_orderkey",), ("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        is_t = pc.equal(batch["s_nat"], pa.scalar(target_key, pa.int64()))
        t = pa.table({
            "o_year": batch["o_year"],
            "nation_cents": pc.if_else(is_t, batch["rev_c"],
                                       pa.scalar(0, pa.int64())),
            "total_cents": batch["rev_c"],
        })
        return t.group_by("o_year").aggregate(
            [("nation_cents", "sum"), ("total_cents", "sum")]) \
            .rename_columns(["o_year", "nation_cents", "total_cents"])

    return _finish_grouped_sums(
        j.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["o_year"])


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: OR-of-ANDs predicate revenue (brand x qty x size bands)
# ---------------------------------------------------------------------------

# (brand, qty_lo, qty_hi, size_lo, size_hi) — all bounds inclusive
BRAND_QTY_RULES = (("Brand#12", 1, 11, 1, 5),
                   ("Brand#23", 10, 20, 1, 10),
                   ("Brand#34", 20, 30, 1, 15))


def brand_qty_revenue(sf_dir: str, rules=BRAND_QTY_RULES,
                      broadcast_max_bytes: int = PART_DIM_BROADCAST_MAX_BYTES,
                      num_partitions: int | None = None):
    """TPC-H Q19 shape: revenue from lineitems matching an OR of
    (brand, quantity band, size band) conjunctions, reported per brand
    — (p_brand, revenue_cents).

    Shape at scale: below the byte gate the part dim broadcasts once
    as sorted partkeys + (rule_code, size) payload arrays (only parts
    of the listed brands ship); each lineitem batch resolves its rule
    with one searchsorted and evaluates every band mask vectorized,
    folding to <= |rules| partial rows — the fact table never
    shuffles. Above the gate the (code, size) payload attaches via a
    hash-partitioned ``Dataset.join`` and the same vectorized masks
    run post-join.
    """
    import os
    import ray
    import pyarrow.parquet as pq

    brands = [r[0] for r in rules]

    def rev_col(batch: pa.Table) -> np.ndarray:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pc.cast(pc.round(pc.multiply(rev, 100),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy(zero_copy_only=False)

    def fold_partial(code: np.ndarray, size: np.ndarray, qty: np.ndarray,
                     rev_c: np.ndarray) -> pd.DataFrame:
        out_b, out_r = [], []
        for i, (brand, qlo, qhi, slo, shi) in enumerate(rules):
            m = ((code == i) & (qty >= qlo) & (qty <= qhi)
                 & (size >= slo) & (size <= shi))
            if m.any():
                out_b.append(brand)
                out_r.append(int(rev_c[m].sum()))
        return pd.DataFrame({"p_brand": pd.Series(out_b, dtype=object),
                             "revenue_cents": pd.Series(out_r, dtype="int64")})

    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"])
    try:
        part_bytes = os.path.getsize(f"{sf_dir}/part.parquet")
    except OSError:
        part_bytes = 0

    if part_bytes <= broadcast_max_bytes:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand", "p_size"])
        brand_idx = {b: i for i, b in enumerate(brands)}
        codes = np.array([brand_idx.get(b, -1)
                          for b in part["p_brand"].to_pylist()], np.int64)
        keep = codes >= 0
        keys = part["p_partkey"].to_numpy(zero_copy_only=False)[keep]
        order = np.argsort(keys)
        ref = ray.put((keys[order], codes[keep][order],
                       part["p_size"].to_numpy(zero_copy_only=False)
                       .astype(np.int64)[keep][order]))

        def partial(batch: pa.Table) -> pd.DataFrame:
            ks, cs, ss = ray.get(ref)
            fk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ks, fk), max(len(ks) - 1, 0))
            hit = (ks[pos] == fk) if len(ks) else np.zeros(len(fk), bool)
            qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[hit]
            return fold_partial(cs[pos[hit]], ss[pos[hit]], qty,
                                rev_col(batch)[hit])

        return _finish_grouped_sums(
            lineitem.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None), ["p_brand"])

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            li_bytes = os.path.getsize(f"{sf_dir}/lineitem.parquet")
        except OSError:
            li_bytes = 0
        # both join inputs ride the exchange — size on their sum
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-(part_bytes + li_bytes) // (128 << 20))))

    def dim_project(t: pa.Table) -> pa.Table:
        code = np.full(len(t), -1, np.int64)
        pb = t["p_brand"].to_numpy(zero_copy_only=False)
        for i, b in enumerate(brands):
            code[pb == b] = i
        out = pa.table({"p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                        "code": pa.array(code, pa.int64()),
                        "p_size64": pc.cast(t["p_size"], pa.int64())})
        return out.filter(pc.greater_equal(out["code"],
                                           pa.scalar(0, pa.int64())))

    def li_project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "qty": batch["l_quantity"],
            "rev_c": pa.array(rev_col(batch), pa.int64()),
        })

    part_ds = _map_pa(
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]),
        dim_project)
    j = _inner_join(_map_pa(lineitem, li_project),
                    part_ds, num_partitions,
                    ("l_partkey",), ("p_partkey",))

    def partial_joined(batch: pa.Table) -> pd.DataFrame:
        return fold_partial(
            batch["code"].to_numpy(zero_copy_only=False),
            batch["p_size64"].to_numpy(zero_copy_only=False),
            batch["qty"].to_numpy(zero_copy_only=False),
            batch["rev_c"].to_numpy(zero_copy_only=False))

    return _finish_grouped_sums(
        j.map_batches(partial_joined, batch_format="pyarrow",
                      batch_size=None), ["p_brand"])


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: single filtered scalar aggregate
# ---------------------------------------------------------------------------

REVCHG_FROM = "1996-01-01"
REVCHG_TO = "1997-01-01"
REVCHG_DISC_LO = 0.03
REVCHG_DISC_HI = 0.07
REVCHG_MAX_QTY = 24


def revenue_change(sf_dir: str, date_from: str = REVCHG_FROM,
                   date_to: str = REVCHG_TO,
                   disc_lo: float = REVCHG_DISC_LO,
                   disc_hi: float = REVCHG_DISC_HI,
                   max_qty: int = REVCHG_MAX_QTY):
    """TPC-H Q6 shape: the forecast revenue-change scalar — what
    revenue was given away as discount on small-quantity lines shipped
    inside one year and a discount band. Output is exactly ONE row
    (revenue_cents, n_lines); per-row cents round half-away so the
    DuckDB oracle sums identically, and the float band endpoints
    compare as the same IEEE doubles on both sides.

    Shape at scale: the textbook streaming aggregate — read-pruned to
    four columns, every batch folds to a single partial row, the
    finish sums |blocks| rows. No shuffle, no driver loop.
    """
    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
               window=("l_shipdate", np.datetime64(date_from, "us"),
                                  np.datetime64(date_to, "us")))

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(batch["l_discount"],
                                         pa.scalar(disc_lo)),
                        pc.less_equal(batch["l_discount"],
                                      pa.scalar(disc_hi))),
                pc.less(batch["l_quantity"], pa.scalar(float(max_qty)))))
        batch = batch.filter(keep)
        given = pc.cast(pc.round(
            pc.multiply(pc.multiply(batch["l_extendedprice"],
                                    batch["l_discount"]), 100),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"k": pa.array([0], pa.int64()),
                         "revenue_cents": pa.array(
                             [pc.sum(given).as_py() or 0], pa.int64()),
                         "n_lines": pa.array([len(batch)], pa.int64())})

    out = _finish_grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["k"])
    return out.map_batches(lambda t: t.drop_columns(["k"]),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# part-name semi-join: shared by product_type_profit / excess_qty_suppliers
# ---------------------------------------------------------------------------


def _semi_join_part(ds, sf_dir: str, pred_columns: list[str], part_pred,
                    broadcast_max_bytes: int,
                    num_partitions: int | None, project):
    """Keep only fact rows whose ``l_partkey`` belongs to a part row
    satisfying ``part_pred`` — an arbitrary predicate
    ``part_pred(part_table) -> pyarrow boolean mask`` evaluated over
    ``pred_columns`` (the only part columns read). ``project(batch) ->
    pa.Table`` prepares the fact columns (must include ``l_partkey``).

    Below the byte gate the matching partkeys broadcast once as a
    sorted numpy array and every fact batch resolves membership with
    one searchsorted — the fact table never shuffles. Above it, a
    hash-partitioned inner ``Dataset.join`` against the pre-filtered
    part dim (the dim shrinks to matching keys BEFORE the exchange).
    ``_attach_dim_value`` cannot express this (its ``allowed`` filter
    is over int64 values, not a row predicate) — keep this helper the
    single implementation of predicate semi-joins on the part dim.
    """
    import os
    import ray
    import pyarrow.parquet as pq
    import ray.data as rd
    from .util import known_empty_table, mark_known_empty

    seed = known_empty_table(ds)
    if seed is not None:
        # plan-time-empty fact (fully-pruned windowed read): the
        # semi-join keeps nothing — short-circuit with the projected
        # empty schema, marked for downstream _inner_join call sites
        t = project(seed)
        return mark_known_empty(rd.from_arrow(t), t)

    try:
        part_bytes = os.path.getsize(f"{sf_dir}/part.parquet")
    except OSError:
        part_bytes = 0

    if part_bytes <= broadcast_max_bytes:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey"] + pred_columns)
        match = np.sort(part.filter(part_pred(part))
                        ["p_partkey"].to_numpy(zero_copy_only=False))
        ref = ray.put(match)

        def attach(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            t = project(batch)
            fk = t["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, fk)
            pos_c = np.minimum(pos, max(len(ks) - 1, 0))
            hit = (ks[pos_c] == fk) if len(ks) else np.zeros(len(fk), bool)
            return t.filter(pa.array(hit))

        return _map_pa(ds, attach)

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            li_bytes = os.path.getsize(f"{sf_dir}/lineitem.parquet")
        except OSError:
            li_bytes = 0
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-(part_bytes + li_bytes) // (128 << 20))))

    def dim_project(t: pa.Table) -> pa.Table:
        t = t.filter(part_pred(t))
        return pa.table({"p_partkey": pc.cast(t["p_partkey"], pa.int64())})

    part_ds = _map_pa(_read(sf_dir, "part", ["p_partkey"] + pred_columns),
                      dim_project)
    j = _inner_join(_map_pa(ds, project), part_ds, num_partitions,
                    ("l_partkey",), ("p_partkey",))

    def cleanup(t: pa.Table) -> pa.Table:
        drop = [c for c in ("p_partkey",) if c in t.column_names]
        return t.drop_columns(drop) if drop else t

    return _map_pa(j, cleanup)


def _semi_join_part_name(ds, sf_dir: str, name_token: str,
                         broadcast_max_bytes: int,
                         num_partitions: int | None, project):
    """Name-predicate semi-join (SQL ``p_name LIKE '%token%'``) — the
    thin wrapper over ``_semi_join_part`` the Q9/Q20 shapes share."""
    return _semi_join_part(
        ds, sf_dir, ["p_name"],
        lambda t: pc.match_substring(t["p_name"], name_token),
        broadcast_max_bytes, num_partitions, project)


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by supplier nation and ship year
# ---------------------------------------------------------------------------

PROFIT_NAME_TOKEN = "red"


def product_type_profit(sf_dir: str, name_token: str = PROFIT_NAME_TOKEN,
                        broadcast_max_bytes: int = PART_DIM_BROADCAST_MAX_BYTES,
                        num_partitions: int | None = None):
    """TPC-H Q9 shape (partsupp-free variant): revenue of lineitems
    whose part name contains ``name_token``, grouped by the SUPPLIER's
    nation and the SHIP year — (nation, l_year, profit_cents). The
    testdata has no partsupp table, so profit is discounted revenue
    (no supply-cost term) and the year comes from l_shipdate (no
    orders join) — both divergences from stock Q9 are intentional and
    mirrored in the oracle.

    Shape at scale: two gated dim attaches and zero fact shuffles on
    the broadcast path — the part-name semi-join prunes first (one
    searchsorted per batch), the supplier nation attaches second on
    the surviving ~1/|tokens| of rows, and each batch folds to
    <= |nations|x|years| partial rows before the bounded-key finish.
    Nation names map onto the TINY grouped result at the very end.
    """
    import ray
    import pyarrow.parquet as pq

    def li_project(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "l_year": pc.cast(pc.year(batch["l_shipdate"]), pa.int64()),
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    li = _semi_join_part_name(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
               "l_shipdate"]),
        sf_dir, name_token, broadcast_max_bytes, num_partitions,
        project=li_project)

    if num_partitions is None:
        import os
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            nbytes = os.path.getsize(f"{sf_dir}/supplier.parquet") \
                + os.path.getsize(f"{sf_dir}/lineitem.parquet")
        except OSError:
            nbytes = 0
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-nbytes // (128 << 20))))

    li = _attach_dim_value(li, sf_dir, "supplier", "s_suppkey",
                           "s_nationkey", "l_suppkey", "s_nat",
                           broadcast_max_bytes, num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"s_nat": batch["s_nat"], "l_year": batch["l_year"],
                         "rev_c": batch["rev_c"]}) \
            .group_by(["s_nat", "l_year"]).aggregate([("rev_c", "sum")]) \
            .rename_columns(["s_nat", "l_year", "profit_cents"])

    grouped = _finish_grouped_sums(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["s_nat", "l_year"])

    # nation is the one always-tiny table (25 rows in stock TPC-H):
    # map key -> name on the <= |nations|x|years| grouped result
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    names = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    name_ref = ray.put(names)

    def attach_name(t: pa.Table) -> pa.Table:
        nm = ray.get(name_ref)
        return pa.table({
            "nation": pa.array([nm[k] for k in t["s_nat"].to_pylist()],
                               pa.string()),
            "l_year": t["l_year"],
            "profit_cents": t["profit_cents"],
        })

    return grouped.map_batches(attach_name, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue report, top-k customers
# ---------------------------------------------------------------------------

RETURNED_FROM = "1996-01-01"
RETURNED_TO = "1996-04-01"  # one quarter
RETURNED_TOPK = 20
ORDERS_WINDOW_BROADCAST_MAX_BYTES = 256 << 20


def returned_item_report(sf_dir: str, date_from: str = RETURNED_FROM,
                         date_to: str = RETURNED_TO,
                         k: int = RETURNED_TOPK,
                         broadcast_max_bytes: int = ORDERS_WINDOW_BROADCAST_MAX_BYTES,
                         num_partitions: int | None = None):
    """TPC-H Q10 shape: customers who returned the most revenue —
    lineitems with l_returnflag='R' whose order was placed inside one
    quarter, revenue summed per customer, top-k by (revenue desc,
    custkey asc), enriched with c_name / acctbal_cents / nation name.

    Shape at scale:
    - the orders side filters to ONE quarter before it moves; below
      the byte gate the (orderkey -> custkey) window map broadcasts
      once as sorted numpy arrays and every lineitem batch attaches
      custkey with one searchsorted (no fact shuffle); above it a
      hash-partitioned inner ``Dataset.join`` on the orderkey;
    - the per-customer aggregate pre-folds per batch, so the groupby
      exchange moves one row per custkey per block, not line rows;
    - top-k is per-block partial top-k then a k-row finisher (the
      aggregate emits each custkey once, so top-k of top-ks is exact);
    - the <= k winners broadcast as a tiny key set and the CUSTOMER
      table streams once through a searchsorted semi-filter (column-
      pruned, no shuffle) to pick up name/balance/nation. Assumes
      orders.o_custkey FK-references customer (stock TPC-H guarantees
      it); a dangling winner key would drop instead of promoting the
      next customer the way the SQL inner join does.
    """
    import os
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def li_project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = 0

    if orders_bytes <= broadcast_max_bytes:
        o = pq.read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey", "o_orderdate"])
        o = o.filter(pc.and_(pc.greater_equal(o["o_orderdate"], lo),
                             pc.less(o["o_orderdate"], hi)))
        ok = o["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = o["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ok)
        ref = ray.put((ok[order], ck[order]))

        def attach_cust(batch: pa.Table) -> pa.Table:
            ks, cs = ray.get(ref)
            t = li_project(batch)
            fk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, fk)
            pos_c = np.minimum(pos, max(len(ks) - 1, 0))
            hit = (ks[pos_c] == fk) if len(ks) else np.zeros(len(fk), bool)
            t = t.filter(pa.array(hit))
            return t.append_column("o_custkey",
                                   pa.array(cs[pos_c[hit]], pa.int64()))

        joined = li.map_batches(attach_cust, batch_format="pyarrow")
    else:
        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            try:
                li_bytes = os.path.getsize(f"{sf_dir}/lineitem.parquet")
            except OSError:
                li_bytes = 0
            num_partitions = min(
                max(2, cpus // 2),
                max(2, -(-(orders_bytes + li_bytes) // (128 << 20))))

        def o_project(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                                 pc.less(t["o_orderdate"], hi)))
            return pa.table({
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64())})

        o_ds = _map_pa(
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"],
                  window=("o_orderdate",
                          np.datetime64(date_from, "us"),
                          np.datetime64(date_to, "us"))),
            o_project)
        joined = _inner_join(
            _map_pa(li, li_project), o_ds,
            num_partitions, ("l_orderkey",), ("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch["o_custkey"],
                         "rev_c": batch["rev_c"]}) \
            .group_by("o_custkey").aggregate([("rev_c", "sum")]) \
            .rename_columns(["o_custkey", "revenue_cents"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "o_custkey"],
                              ascending=[False, True]).head(k)

    winners = agg.map_batches(rank, batch_format="pandas") \
        .repartition(1).map_batches(rank, batch_format="pandas").take_all()
    if not winners:
        return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                             "c_name": pd.Series([], dtype=object),
                             "revenue_cents": pd.Series([], dtype="int64"),
                             "acctbal_cents": pd.Series([], dtype="int64"),
                             "n_name": pd.Series([], dtype=object)})

    win_keys = np.sort(np.array([w["o_custkey"] for w in winners], np.int64))
    wref = ray.put(win_keys)

    def cust_filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(wref)
        fk = pc.cast(batch["c_custkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, fk)
        pos_c = np.minimum(pos, max(len(ks) - 1, 0))
        hit = ks[pos_c] == fk
        t = batch.filter(pa.array(hit))
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_name": t["c_name"],
            "acctbal_cents": pc.cast(pc.round(
                pc.multiply(t["c_acctbal"], 100),
                round_mode="half_towards_infinity"), pa.int64()),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
        })

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow").take_all()
    attrs = {c["c_custkey"]: c for c in cust}

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    names = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))

    rows = [w for w in winners if w["o_custkey"] in attrs]
    return pd.DataFrame({
        "c_custkey": pd.Series([w["o_custkey"] for w in rows], dtype="int64"),
        "c_name": [attrs[w["o_custkey"]]["c_name"] for w in rows],
        "revenue_cents": pd.Series([w["revenue_cents"] for w in rows],
                                   dtype="int64"),
        "acctbal_cents": pd.Series(
            [attrs[w["o_custkey"]]["acctbal_cents"] for w in rows],
            dtype="int64"),
        "n_name": [names[attrs[w["o_custkey"]]["c_nationkey"]] for w in rows],
    })


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers who shipped excess quantity of a part family
# ---------------------------------------------------------------------------

EXCESS_NAME_TOKEN = "blue"
EXCESS_FROM = "1996-01-01"
EXCESS_TO = "1997-01-01"
EXCESS_MIN_QTY_CENTS = 5000  # > 50 units of one part in the year
SUPPLIER_DIM_BROADCAST_MAX_BYTES = 256 << 20


def excess_qty_suppliers(sf_dir: str, name_token: str = EXCESS_NAME_TOKEN,
                         date_from: str = EXCESS_FROM,
                         date_to: str = EXCESS_TO,
                         min_qty_cents: int = EXCESS_MIN_QTY_CENTS,
                         broadcast_max_bytes: int = SUPPLIER_DIM_BROADCAST_MAX_BYTES,
                         num_partitions: int | None = None):
    """TPC-H Q20 shape (partsupp-free variant): suppliers who shipped
    MORE than ``min_qty_cents`` (quantity x100, integer-exact) of any
    single part whose name contains ``name_token`` inside one year —
    (s_suppkey, s_name), each supplier once. Stock Q20 thresholds on
    partsupp.ps_availqty which the testdata lacks; a fixed shipped-
    quantity threshold keeps the EXISTS-over-grouped-pairs shape.

    Shape at scale: the part-name semi-join prunes the fact stream
    with one searchsorted per batch (``_semi_join_part_name``, gated);
    the (suppkey, partkey) aggregate pre-folds per batch so the 2-key
    exchange moves pair partials, not line rows; qualifying pairs
    collapse to distinct suppkeys with a second pre-folded groupby;
    and the supplier name attaches gated — broadcast dict below the
    byte gate, hash-partitioned join above.
    """
    import os
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum, Count

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    def li_project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi)))
        return pa.table({
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "qty_c": pc.cast(pc.round(pc.multiply(batch["l_quantity"], 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    li = _semi_join_part_name(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
              window=("l_shipdate",
                                 np.datetime64(date_from, "us"),
                                 np.datetime64(date_to, "us"))),
        sf_dir, name_token, broadcast_max_bytes, num_partitions,
        project=li_project)

    from .util import known_empty_table
    if known_empty_table(li) is not None:
        # fully-pruned ship-date window: no pair can clear the
        # threshold — the empty report, without feeding a plan-time
        # empty side into the groupby/join chain (see _inner_join)
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object")})

    def pair_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": batch["l_suppkey"],
                         "l_partkey": batch["l_partkey"],
                         "qty_c": batch["qty_c"]}) \
            .group_by(["l_suppkey", "l_partkey"]) \
            .aggregate([("qty_c", "sum")]) \
            .rename_columns(["l_suppkey", "l_partkey", "qty_c"])

    pairs = li.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["l_suppkey", "l_partkey"]) \
        .aggregate(Sum("qty_c", alias_name="qty_c"))

    def qualify(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["qty_c"],
                                    pa.scalar(min_qty_cents, pa.int64())))
        return pa.table({"s_suppkey": pc.unique(
            t["l_suppkey"].combine_chunks())})

    supps = pairs.map_batches(qualify, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])

    try:
        supp_bytes = os.path.getsize(f"{sf_dir}/supplier.parquet")
    except OSError:
        supp_bytes = 0

    if supp_bytes <= broadcast_max_bytes:
        supplier = pq.read_table(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_name"])
        lookup = dict(zip(supplier["s_suppkey"].to_pylist(),
                          supplier["s_name"].to_pylist()))
        ref = ray.put(lookup)

        def attach_name(df: pd.DataFrame) -> pd.DataFrame:
            lk = ray.get(ref)
            # inner-join semantics: unknown suppkeys drop, like the SQL
            df = df[df["s_suppkey"].isin(lk.keys())].copy()
            df["s_name"] = [lk[s] for s in df["s_suppkey"]]
            return df.sort_values("s_suppkey").reset_index(drop=True)

        return supps.repartition(1).map_batches(attach_name,
                                                batch_format="pandas")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = min(max(2, cpus // 2),
                             max(2, -(-supp_bytes // (128 << 20))))
    supp_ds = _map_pa(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        lambda t: pa.table({
            "sk": pc.cast(t["s_suppkey"], pa.int64()),
            "s_name": t["s_name"]}))
    from .util import set_seed_schema
    set_seed_schema(supps, pa.schema(
        [("s_suppkey", pa.int64())]).empty_table())
    j = _inner_join(supps, supp_ds, num_partitions,
                    ("s_suppkey",), ("sk",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df[["s_suppkey", "s_name"]].sort_values("s_suppkey") \
            .reset_index(drop=True)

    return j.repartition(1).map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: per-key aggregate gated by a share-of-global threshold
# ---------------------------------------------------------------------------

IMPORTANT_NATION = "NATION_15"
# stock Q11's threshold FRACTION scales with SF (0.0001/SF); mirror
# that: share_den = max(1, n_lineitem // IMPORTANT_ROWS_PER_DEN), read
# from the parquet footer on BOTH the engine and the oracle side (the
# oracle interpolates the same integer), keeping the survivor set a
# meaningful slice at every scale instead of emptying as parts dilute
IMPORTANT_ROWS_PER_DEN = 60
# survivors are bounded by share_den - 1 (each holds > total/den); up
# to this den the final ordering folds on the driver partition, above
# it a distributed ds.sort orders the survivor stream
IMPORTANT_DRIVER_SORT_MAX_DEN = 1_000_000
IMPORTANT_ROWS_PER_BUCKET = 1_000_000
IMPORTANT_SUPP_BROADCAST_MAX_BYTES = 256 << 20


def important_share_den(sf_dir: str) -> int:
    """The SF-scaled Q11 threshold denominator (footer-only read)."""
    from .util import parquet_num_rows

    n = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    return max(1, n // IMPORTANT_ROWS_PER_DEN)


def important_parts(sf_dir: str, nation: str = IMPORTANT_NATION,
                    share_den: int | None = None,
                    broadcast_max_bytes: int = IMPORTANT_SUPP_BROADCAST_MAX_BYTES,
                    num_buckets: int | None = None,
                    num_partitions: int | None = None,
                    driver_sort_max_den: int = IMPORTANT_DRIVER_SORT_MAX_DEN):
    """TPC-H Q11 shape (partsupp-free variant): per-part "stock value"
    — discounted revenue cents over lineitems supplied by ONE nation's
    suppliers — kept only where the part's value exceeds a fixed
    fraction (1/``share_den``) of the global total. Output
    (l_partkey, value_cents), value desc / partkey asc. Mirrors
    ``ref:`` Q11's HAVING-over-scalar-subquery; value is revenue (the
    testdata has no partsupp supply-cost column).

    The threshold compare is exact integer arithmetic on both sides:
    for positive ints, ``value * den > total  ⟺  value > total // den``
    — no overflow (no multiply), bit-parity with DuckDB's ``//``.

    Shape at scale: two fact passes, one exchange.

    1. Global total: supplier membership attaches via the gated
       ``_attach_dim_value`` semi-join (broadcast searchsorted below
       the byte gate / hash join above); per-batch SCALAR cent sums
       fold to one row — no exchange.
    2. Per-part values: same membership filter, per-batch (partkey,
       cents) Arrow partials hash into ~1M-row partkey buckets; each
       bucket fold is ONE vectorized pandas groupby that applies the
       broadcast threshold BEFORE emitting — at most ``share_den - 1``
       rows leave the fold. The final ordering is gated on that bound:
       driver-partition sort below ``driver_sort_max_den``, a
       distributed ``ds.sort`` over the survivor stream above it
       (survivors at scale are a meaningful slice of the part table,
       never a constant).
    """
    import ray

    from .util import bucket_count, bucket_hash, parquet_num_rows

    if share_den is None:
        share_den = important_share_den(sf_dir)
    nationkey = _nation_key(sf_dir, nation)
    allowed = np.array([nationkey], dtype=np.int64)

    def li_project(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "rev_c": pc.cast(pc.round(pc.multiply(rev, 100),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    def member_stream():
        li = _read(sf_dir, "lineitem",
                   ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
        return _attach_dim_value(
            li, sf_dir, "supplier", "s_suppkey", "s_nationkey",
            fact_key="l_suppkey", out_col=None,
            broadcast_max_bytes=broadcast_max_bytes,
            num_partitions=num_partitions or _default_partitions(sf_dir,
                                                                 "lineitem"),
            allowed=allowed, project=li_project)

    # pass 1: exact global cent total (scalar partials, no exchange)
    def total_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([0], pa.int64()),
                         "total": pa.array(
                             [pc.sum(batch["rev_c"]).as_py() or 0],
                             pa.int64())})

    tot_rows = _finish_grouped_sums(
        member_stream().map_batches(total_partial, batch_format="pyarrow"),
        ["k"]).take_all()
    total = tot_rows[0]["total"] if tot_rows else 0
    threshold = total // share_den  # survivors: value > threshold

    # pass 2: bucketed per-part fold, threshold applied inside
    n_line = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_line, IMPORTANT_ROWS_PER_BUCKET)

    def part_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": batch["l_partkey"],
                      "rev_c": batch["rev_c"]}) \
            .group_by("l_partkey").aggregate([("rev_c", "sum")]) \
            .rename_columns(["l_partkey", "rev_c"])
        b = bucket_hash(t["l_partkey"].to_numpy(zero_copy_only=False),
                        num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        v = df.groupby("l_partkey", as_index=False)["rev_c"].sum() \
            .rename(columns={"rev_c": "value_cents"})
        return v[v["value_cents"] > threshold]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                                 "value_cents": pd.Series([], dtype="int64")})
        return df.sort_values(["value_cents", "l_partkey"],
                              ascending=[False, True]) \
            .reset_index(drop=True) \
            .astype({"l_partkey": "int64", "value_cents": "int64"})

    surv = member_stream() \
        .map_batches(part_partial, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(bucket_fold, batch_format="pandas")
    if share_den <= driver_sort_max_den:
        return surv.repartition(1).map_batches(finish, batch_format="pandas",
                                               batch_size=None)
    # the survivor-count bound (share_den - 1) no longer fits one
    # partition: distributed sort — (value desc, partkey asc) matches
    # the driver arm block-for-block when concatenated in order
    return surv.map_batches(
        lambda t: pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "value_cents": pc.cast(t["value_cents"], pa.int64())}),
        batch_format="pyarrow") \
        .sort(["value_cents", "l_partkey"], descending=[True, False])


def _nation_key(sf_dir: str, nation: str) -> int:
    """nationkey for a nation name (bounded dim, driver read)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"])
    for k, nm in zip(t["n_nationkey"].to_pylist(), t["n_name"].to_pylist()):
        if nm == nation:
            return int(k)
    raise KeyError(f"nation {nation!r} not in {sf_dir}/nation.parquet")


def _default_partitions(sf_dir: str, *tables: str) -> int:
    """Hash-join partition count sized DOWN by input bytes
    (~128 MB/aggregator) and capped at cpus//2 — see CLAUDE.md."""
    import os
    import ray

    nbytes = 0
    for t in tables:
        try:
            nbytes += os.path.getsize(f"{sf_dir}/{t}.parquet")
        except OSError:
            pass
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return min(max(2, cpus // 2), max(2, -(-nbytes // (128 << 20))))


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: per-part argmin over filtered suppliers, enriched winners
# ---------------------------------------------------------------------------

MCS_REGION = "EUROPE"
MCS_TYPE = "ECONOMY"
MCS_MAX_SIZE = 10
MCS_TOPK = 100
MCS_ROWS_PER_BUCKET = 1_000_000
MCS_BROADCAST_MAX_BYTES = 256 << 20


def min_cost_supplier(sf_dir: str, region: str = MCS_REGION,
                      p_type: str = MCS_TYPE, max_size: int = MCS_MAX_SIZE,
                      k: int = MCS_TOPK,
                      broadcast_max_bytes: int = MCS_BROADCAST_MAX_BYTES,
                      num_buckets: int | None = None,
                      num_partitions: int | None = None):
    """TPC-H Q2 shape (partsupp-free variant): for every part of one
    type with size <= ``max_size``, the supplier(s) in ``region``
    offering the MINIMUM observed price — cost(part, supp) =
    min lineitem ``l_extendedprice`` cents — ties kept, winners
    enriched with supplier account balance / name / nation, global
    top-``k`` by (s_acctbal desc, n_name, s_name, l_partkey). The
    (partkey, suppkey) pair is unique within the winner set and
    supplier names are unique, so the ordering is total and the LIMIT
    deterministic. Mirrors stock Q2's correlated-min + detail join;
    "supply cost" is the best offered price (no partsupp table).

    Shape at scale: facts filter by TWO broadcast/gated semi-joins
    (part predicate via ``_semi_join_part``, region suppliers via
    ``_attach_dim_value`` on the nationkey enum) — the fact table
    never shuffles for either dim. Per-batch (part, supp, min cents)
    Arrow partials hash into ~1M-row partkey buckets; each bucket fold
    finishes pair minima and per-part winners vectorized (one pandas
    groupby + a transform-min mask). Winner enrichment is gated:
    sorted-numpy searchsorted broadcast below the supplier byte gate,
    hash join above. Per-block partial top-k bounds the final
    ``repartition(1)`` merge at blocks x k rows.
    """
    import os
    import ray
    import pyarrow.parquet as pq

    from .util import bucket_count, bucket_hash, parquet_num_rows

    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {rk for rk, rn in zip(region_t["r_regionkey"].to_pylist(),
                                  region_t["r_name"].to_pylist())
             if rn == region}
    nation_name = {int(nk): nm for nk, nm, rg in zip(
        nation_t["n_nationkey"].to_pylist(), nation_t["n_name"].to_pylist(),
        nation_t["n_regionkey"].to_pylist()) if rg in rkeys}
    allowed_nations = np.array(sorted(nation_name), dtype=np.int64)

    def li_project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "price_c": pc.cast(pc.round(
                pc.multiply(batch["l_extendedprice"], 100),
                round_mode="half_towards_infinity"), pa.int64()),
        })

    if num_partitions is None:
        num_partitions = _default_partitions(sf_dir, "lineitem", "part")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])
    li = _semi_join_part(
        li, sf_dir, ["p_type", "p_size"],
        lambda t: pc.and_(pc.equal(t["p_type"], p_type),
                          pc.less_equal(pc.cast(t["p_size"], pa.int64()),
                                        max_size)),
        broadcast_max_bytes, num_partitions, li_project)
    li = _attach_dim_value(
        li, sf_dir, "supplier", "s_suppkey", "s_nationkey",
        fact_key="l_suppkey", out_col=None,
        broadcast_max_bytes=broadcast_max_bytes,
        num_partitions=num_partitions, allowed=allowed_nations)

    n_line = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    if num_buckets is None:
        num_buckets = bucket_count(n_line, MCS_ROWS_PER_BUCKET)

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_partkey", "l_suppkey", "price_c"]) \
            .group_by(["l_partkey", "l_suppkey"]) \
            .aggregate([("price_c", "min")]) \
            .rename_columns(["l_partkey", "l_suppkey", "price_c"])
        b = bucket_hash(t["l_partkey"].to_numpy(zero_copy_only=False),
                        num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_winners(df: pd.DataFrame) -> pd.DataFrame:
        pair = df.groupby(["l_partkey", "l_suppkey"],
                          as_index=False)["price_c"].min()
        mn = pair.groupby("l_partkey")["price_c"].transform("min")
        out = pair[pair["price_c"] == mn] \
            .rename(columns={"price_c": "cost_cents"})
        return out.reset_index(drop=True)

    winners = li \
        .map_batches(pair_partial, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(bucket_winners, batch_format="pandas")

    # winner enrichment: supplier acctbal/name + nation name (gated)
    try:
        supp_bytes = os.path.getsize(f"{sf_dir}/supplier.parquet")
    except OSError:
        supp_bytes = 0
    nname_ref = ray.put(nation_name)

    def order_topk(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["s_acctbal_cents", "s_name", "n_name", "l_partkey",
                "s_suppkey", "cost_cents"]
        if not len(df):
            return pd.DataFrame({
                "s_acctbal_cents": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype="object"),
                "n_name": pd.Series([], dtype="object"),
                "l_partkey": pd.Series([], dtype="int64"),
                "s_suppkey": pd.Series([], dtype="int64"),
                "cost_cents": pd.Series([], dtype="int64")})
        out = df.sort_values(
            ["s_acctbal_cents", "n_name", "s_name", "l_partkey"],
            ascending=[False, True, True, True]).head(k)
        return out[cols].reset_index(drop=True).astype(
            {"s_acctbal_cents": "int64", "l_partkey": "int64",
             "s_suppkey": "int64", "cost_cents": "int64"})

    if supp_bytes <= broadcast_max_bytes:
        supp = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
        sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(sk)
        bal_c = pc.cast(pc.round(pc.multiply(supp["s_acctbal"], 100),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)[order]
        snat = pc.cast(supp["s_nationkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[order]
        snames = supp["s_name"].to_numpy(zero_copy_only=False)[order]
        ref = ray.put((sk[order], bal_c, snat, snames))

        def enrich(df: pd.DataFrame) -> pd.DataFrame:
            ks, bal, nat, nm = ray.get(ref)
            names = ray.get(nname_ref)
            fk = df["l_suppkey"].to_numpy()
            pos = np.searchsorted(ks, fk)  # winners came FROM the dim:
            out = df.rename(columns={"l_suppkey": "s_suppkey"}).copy()
            out["s_acctbal_cents"] = bal[pos]
            out["s_name"] = nm[pos]
            out["n_name"] = [names[n] for n in nat[pos]]
            return order_topk(out)

        enriched = winners.map_batches(enrich, batch_format="pandas")
    else:
        supp_ds = _map_pa(
            _read(sf_dir, "supplier",
                  ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            lambda t: pa.table({
                "sk": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": t["s_name"],
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "s_acctbal_cents": pc.cast(
                    pc.round(pc.multiply(t["s_acctbal"], 100),
                             round_mode="half_towards_infinity"), pa.int64()),
            }))
        j = _inner_join(winners, supp_ds, num_partitions,
                        ("l_suppkey",), ("sk",))

        def name_topk(df: pd.DataFrame) -> pd.DataFrame:
            names = ray.get(nname_ref)
            out = df.rename(columns={"l_suppkey": "s_suppkey"}).copy()
            out["n_name"] = out["s_nationkey"].map(names)
            return order_topk(out)

        enriched = j.map_batches(name_topk, batch_format="pandas")

    return enriched.repartition(1).map_batches(order_topk,
                                               batch_format="pandas",
                                               batch_size=None)


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnostics: per-key-domain fanout distribution
# ---------------------------------------------------------------------------

# (domain label, table, key column) — the join/groupby keys every
# pipeline in this repo partitions by; the report says whether each is
# safe to hash-shuffle at scale (n_keys, max fanout, fanout quantiles)
SKEW_DOMAINS = (
    ("events_user", "events", "user_id"),
    ("lineitem_partkey", "lineitem", "l_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey"),
    ("orders_custkey", "orders", "o_custkey"),
)
SKEW_QUANTILES = ((50, "p50"), (90, "p90"), (99, "p99"))
SKEW_ROWS_PER_BUCKET = 1_000_000


def key_skew_report(sf_dir: str, num_buckets: int | None = None):
    """Per-key-domain skew report for the engine's shuffle keys: how
    many distinct keys, total rows, the heaviest key's fanout, and
    exact discrete fanout percentiles. This is the planning primitive
    behind every 'is this groupby key safe / does this hot key need
    salting' decision CLAUDE.md's invariants call out. Output: one row
    per domain — (domain, n_keys, n_rows, max_per_key, p50, p90, p99),
    all counts int64, sorted by domain.

    Shape at scale: per-batch (key, n) count partials hash into
    domain-pure buckets (bucket id = domain_idx * B + key hash — ONE
    exchange for all domains, and lineitem contributes both of its
    domains from a single scan). Each bucket finishes its keys' sums
    and emits a fanout HISTOGRAM partial (per_key_n, n_keys) — fanout
    values are Zipf-bounded, so the histogram stays tiny no matter the
    corpus. The bounded-key finish folds the histograms once and takes
    each percentile with the verified ceil-rank rule
    ((n*q + 99) // 100, searchsorted on the cumulative histogram) —
    exactly ``segment_acctbal_quantiles``'s DuckDB-verified
    percentile_disc arithmetic. No global sort, no per-key exchange
    wider than (key, n)."""
    from .util import bucket_count, bucket_hash, finish_grouped, \
        parquet_num_rows

    if num_buckets is None:
        rows = max(parquet_num_rows(f"{sf_dir}/{t}.parquet")
                   for _, t, _ in SKEW_DOMAINS)
        num_buckets = bucket_count(rows, SKEW_ROWS_PER_BUCKET)
    dom_idx = {d: i for i, (d, _, _) in enumerate(SKEW_DOMAINS)}

    def partial_for(domain: str, col: str):
        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({"key": pc.cast(batch[col], pa.int64())})
            t = t.append_column("n", pa.array(np.ones(len(t), np.int64)))
            t = t.group_by("key").aggregate([("n", "sum")]) \
                .rename_columns(["key", "n"])
            b = bucket_hash(t["key"].to_numpy(zero_copy_only=False),
                            num_buckets) + dom_idx[domain] * num_buckets
            # no domain column: buckets are domain-pure by
            # construction (domain == bucket // num_buckets), so the
            # fold recovers the name for free and the exchange stays
            # exactly (bucket, key, n) — 24 B/row, no replicated string
            return pa.table({
                "bucket": pa.array(b, pa.int64()),
                "key": t["key"],
                "n": t["n"],
            })
        return partial

    def li_partial(batch: pa.Table) -> pa.Table:
        # one lineitem scan feeds both of its key domains
        return pa.concat_tables([
            partial_for("lineitem_partkey", "l_partkey")(batch),
            partial_for("lineitem_suppkey", "l_suppkey")(batch)])

    streams = [
        _read(sf_dir, "events", ["user_id"]).map_batches(
            partial_for("events_user", "user_id"),
            batch_format="pyarrow", batch_size=None),
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
            li_partial, batch_format="pyarrow", batch_size=None),
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            partial_for("orders_custkey", "o_custkey"),
            batch_format="pyarrow", batch_size=None),
    ]
    u = streams[0].union(*streams[1:])

    doms = [d for d, _, _ in SKEW_DOMAINS]

    def hist_fold(df: pd.DataFrame) -> pd.DataFrame:
        # domain recovered from the pure bucket id, never shipped
        dom = doms[int(df["bucket"].iat[0]) // num_buckets]
        per_key = df.groupby("key")["n"].sum()
        vc = per_key.value_counts()
        return pd.DataFrame({
            "domain": [dom] * len(vc),
            "per_key_n": vc.index.to_numpy(dtype=np.int64),
            "n_keys": vc.to_numpy(dtype=np.int64)})

    hist = finish_grouped(
        u.groupby("bucket").map_groups(hist_fold, batch_format="pandas"),
        ["domain", "per_key_n"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        from .util import disc_percentiles
        rows = []
        for dom, g in df.sort_values(["domain", "per_key_n"]) \
                         .groupby("domain", sort=True):
            fan = g["per_key_n"].to_numpy(dtype=np.int64)
            cnt = g["n_keys"].to_numpy(dtype=np.int64)
            row = {"domain": dom, "n_keys": int(cnt.sum()),
                   "n_rows": int((fan * cnt).sum()),
                   "max_per_key": int(fan[-1])}
            ps = disc_percentiles(fan, cnt,
                                  [q for q, _ in SKEW_QUANTILES])
            row.update({name: p for (_, name), p
                        in zip(SKEW_QUANTILES, ps)})
            rows.append(row)
        out = pd.DataFrame(rows)
        for c in out.columns:
            if c != "domain":
                out[c] = out[c].astype("int64")
        return out

    return hist.map_batches(final, batch_format="pandas", batch_size=None)
