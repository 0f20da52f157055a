"""Dual-path agreement + invariants for the r4 relational operators
(window fn / anti-join / pivot / multi-way join / range join). The
value-vs-oracle gate lives in test_driver_contract; these tests pin
the size-gated at-scale paths (forced with zero-byte gates) and the
operator-level invariants the oracle can't see."""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def test_idle_customers_paths_agree(ray_session):
    """Broadcast value_set anti-join and the forced left_outer
    Dataset.join anti-join keep the identical per-nation rollup."""
    from pdf_context_extractor_agent_ray.functions.relational import idle_customers

    fast = idle_customers(SF).to_pandas() \
        .sort_values("n_nationkey").reset_index(drop=True)
    slow = idle_customers(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values("n_nationkey").reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert (fast["numcust"] > 0).all() and (fast["totacctbal_cents"] > 0).all()


def test_local_supplier_volume_paths_agree(ray_session):
    """Broadcast customer/supplier maps vs forced hash-partitioned
    Dataset.joins (zero-byte gate forces BOTH dimension joins) emit
    the identical per-nation revenue."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        local_supplier_volume)

    fast = local_supplier_volume(SF).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    slow = local_supplier_volume(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    assert len(fast) and fast.equals(slow)


def test_running_totals_window_invariants(ray_session):
    """The bucketed cumsum is a real partition-ordered running sum:
    per customer the max running value equals the customer's total,
    row count equals the orders table, and the running sequence is
    nondecreasing in (date, orderkey) order (prices are positive)."""
    from pdf_context_extractor_agent_ray.functions.relational import running_totals

    out = running_totals(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert len(out) == len(orders)

    cents = np.floor(np.abs(orders["o_totalprice"].to_numpy()) * 100 + 0.5)
    totals = pd.DataFrame({"o_custkey": orders["o_custkey"],
                           "c": cents.astype("int64")}) \
        .groupby("o_custkey")["c"].sum()
    got = out.groupby("o_custkey")["running_cents"].max()
    assert got.sort_index().equals(totals.sort_index())

    s = out.sort_values(["o_custkey", "o_orderdate_us", "o_orderkey"])
    diffs = s.groupby("o_custkey")["running_cents"].diff().dropna()
    assert (diffs > 0).all()


def test_running_totals_bucket_invariance(ray_session):
    """Bucket count must not change values (a customer's orders always
    co-locate): 1 bucket vs 7 buckets, identical table."""
    from pdf_context_extractor_agent_ray.functions.relational import running_totals

    key = ["o_custkey", "o_orderkey"]
    a = running_totals(SF, num_buckets=1).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = running_totals(SF, num_buckets=7).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    assert len(a) and a.equals(b)


def test_orders_in_windows_is_a_real_interval_join(ray_session):
    """Every emitted window count matches a direct numpy recount, the
    windows genuinely overlap (total joined rows exceed the number of
    distinct orders covered), and irregular lengths show up (three
    distinct window widths)."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        orders_in_windows, promo_windows)

    out = orders_in_windows(SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    tus = o["o_orderdate"].cast("int64").to_numpy()
    price = np.floor(np.abs(o["o_totalprice"].to_numpy()) * 100 + 0.5).astype("int64")

    by_id = out.set_index("window_id")
    covered = np.zeros(len(tus), dtype=bool)
    for wid, s, e in promo_windows():
        mask = (tus >= s) & (tus < e)
        n = int(mask.sum())
        if n == 0:
            assert wid not in by_id.index
            continue
        row = by_id.loc[wid]
        assert row["n_orders"] == n
        assert row["revenue_cents"] == int(price[mask].sum())
        assert row["window_end_us"] - row["window_start_us"] in \
            (90 * 86_400_000_000, 120 * 86_400_000_000, 150 * 86_400_000_000)
        covered |= mask
    assert out["n_orders"].sum() > covered.sum()  # overlap: points join >1 window
    widths = (out["window_end_us"] - out["window_start_us"]).unique()
    assert len(widths) == 3


def test_order_priority_matrix_margins(ray_session):
    """Pivot row totals equal the per-priority order counts and the
    grand total equals the table row count."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        order_priority_matrix)

    out = order_priority_matrix(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderpriority"]).to_pandas()
    counts = orders["o_orderpriority"].value_counts()
    assert out["n_total"].sum() == len(orders)
    for _, r in out.iterrows():
        assert r["n_total"] == counts[r["o_orderpriority"]]
        assert r["n_f"] + r["n_o"] + r["n_p"] == r["n_total"]


def test_sales_cube_grains_consistent(ray_session):
    """Subtotal grains re-derive from the leaf grain: each region's
    ALL row equals the sum of its nation rows, and the grand-total row
    equals the customer table row count."""
    from pdf_context_extractor_agent_ray.functions.relational import sales_cube

    out = sales_cube(SF).to_pandas()
    leaf = out[(out["r_name"] != "ALL") & (out["n_name"] != "ALL")]
    reg = out[(out["r_name"] != "ALL") & (out["n_name"] == "ALL")]
    grand = out[(out["r_name"] == "ALL")]
    assert len(grand) == 1
    n_cust = pq.ParquetFile(f"{SF}/customer.parquet").metadata.num_rows
    assert grand["n_customers"].iloc[0] == n_cust == leaf["n_customers"].sum()
    for _, r in reg.iterrows():
        sub = leaf[leaf["r_name"] == r["r_name"]]
        assert r["n_customers"] == sub["n_customers"].sum()
        assert r["sum_acctbal_cents"] == sub["sum_acctbal_cents"].sum()


def test_value_moments_variance_derivable(ray_session):
    """The sufficient statistics reproduce an independent recount and
    yield a nonnegative variance for every event type."""
    from pdf_context_extractor_agent_ray.functions.relational import value_moments

    out = value_moments(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["c"] = np.floor(np.abs(ev["value"].to_numpy()) * 100 + 0.5).astype("int64") \
        * np.sign(ev["value"]).astype("int64")
    g = ev.groupby("event_type")["c"]
    for _, r in out.iterrows():
        s = g.get_group(r["event_type"])
        assert r["n_events"] == len(s)
        assert r["sum_cents"] == s.sum()
        assert r["sum_sq_cents2"] == (s.astype(object) ** 2).sum()
        assert r["min_cents"] == s.min() and r["max_cents"] == s.max()
        var_num = r["n_events"] * r["sum_sq_cents2"] - r["sum_cents"] ** 2
        assert var_num >= 0


def test_doc_label_mix_paths_agree(ray_session):
    """Broadcast (vec_id->label) map vs forced hash-partitioned join
    roll up to the identical (lang, label) audit, and the audit's doc
    mass equals the joined-row count."""
    from pdf_context_extractor_agent_ray.functions.simsearch import doc_label_mix

    fast = doc_label_mix(SF).to_pandas() \
        .sort_values(["lang", "label"]).reset_index(drop=True)
    slow = doc_label_mix(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values(["lang", "label"]).reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    n_emb = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert fast["n_docs"].sum() == n_emb  # 1:1 id correspondence here


def test_revenue_cume_dist_order_statistics(ray_session):
    """cume positions are a valid distribution function: monotone in
    revenue, max == 1e6 exactly, ties share a cume, bucket width must
    not change a single value, and every value re-derives from a
    direct driver-side recount."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        revenue_cume_dist)

    out = revenue_cume_dist(SF).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    tiny = revenue_cume_dist(SF, bucket_cents=1 << 14).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    assert len(out) and out.equals(tiny)

    v = out["revenue_cents"].to_numpy()
    n = len(out)
    le = np.searchsorted(np.sort(v), v, side="right")
    assert (out["cume_e6"].to_numpy() == le * 1_000_000 // n).all()
    assert out["cume_e6"].max() == 1_000_000
    s = out.sort_values("revenue_cents")
    assert (np.diff(s["cume_e6"].to_numpy()) >= 0).all()
    dup = out[out.duplicated("revenue_cents", keep=False)]
    if len(dup):
        assert (dup.groupby("revenue_cents")["cume_e6"].nunique() == 1).all()


def test_small_qty_revenue_paths_agree(ray_session):
    """Broadcast partkey value_set semi-join and the forced
    co-bucketed union semi-join emit the identical per-part
    small-quantity revenue."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        small_qty_revenue)

    fast = small_qty_revenue(SF).to_pandas() \
        .sort_values("l_partkey").reset_index(drop=True)
    slow = small_qty_revenue(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values("l_partkey").reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert (fast["n_small"] >= 1).all()
    assert (fast["small_revenue_cents"] > 0).all()


def test_q15_q18_q21_bucket_invariance(ray_session):
    """The co-bucketed folds are bucket-count independent: 1 bucket
    (everything in one group) and the default bucketing produce the
    identical result for the HAVING join-back (Q18), the argmax with
    ties (Q15) and the sole-laggard fold (Q21)."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        large_orders, order_laggards, top_supplier)

    for fn, sort_cols in ((large_orders, ["o_orderkey"]),
                          (top_supplier, ["l_suppkey"]),
                          (order_laggards, ["l_suppkey"])):
        a = fn(SF).to_pandas().sort_values(sort_cols).reset_index(drop=True)
        b = fn(SF, num_buckets=1).to_pandas() \
            .sort_values(sort_cols).reset_index(drop=True)
        assert len(a) and a.equals(b), fn.__name__

    # Q18's survivor-broadcast join vs the forced co-bucketed union
    # fallback (zero survivor gate) emit the identical top-k
    a = large_orders(SF).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    c = large_orders(SF, survivor_broadcast_max=0).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    assert len(a) and a.equals(c)


def test_part_supplier_counts_paths_agree(ray_session):
    """All three size-gated shapes — broadcast part map + one-partition
    fold (default at test scale), broadcast map + suppkey-hash tuple
    dedup (tuple gate forced to 0), and the co-bucketed union join
    (broadcast gate forced to 0) — emit identical distinct counts,
    including at 1 bucket."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        part_supplier_counts)

    def run(**kw):
        return part_supplier_counts(SF, **kw).to_pandas() \
            .sort_values(["p_brand", "p_size"]).reset_index(drop=True)

    a = run()
    assert len(a) and (a["supplier_cnt"] > 0).all()
    for kw in ({"driver_fold_max_tuples": 0},
               {"broadcast_max_bytes": 0},
               {"broadcast_max_bytes": 0, "num_buckets": 1}):
        b = run(**kw)
        assert a.equals(b), kw


def test_promo_revenue_paths_agree(ray_session):
    """Broadcast sorted-partkey membership vs the forced
    hash-partitioned flag join emit identical month pairs, and the
    promo numerator never exceeds the total denominator."""
    from pdf_context_extractor_agent_ray.functions.relational import promo_revenue

    fast = promo_revenue(SF).to_pandas() \
        .sort_values("ship_month").reset_index(drop=True)
    slow = promo_revenue(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values("ship_month").reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert (fast["promo_cents"] <= fast["total_cents"]).all()
    assert (fast["promo_cents"] >= 0).all()


def test_nation_trade_volume_paths_agree(ray_session):
    """Broadcast nation-restricted dim maps vs the forced
    Dataset.joins (zero gate forces BOTH supplier and customer
    attaches) keep the identical (supp, cust, year) revenue, and only
    the two cross-nation directions appear."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        TRADE_NATION_A, TRADE_NATION_B, nation_trade_volume)

    keys = ["supp_nation", "cust_nation", "l_year"]
    fast = nation_trade_volume(SF).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    slow = nation_trade_volume(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    dirs = set(zip(fast["supp_nation"], fast["cust_nation"]))
    assert dirs <= {(TRADE_NATION_A, TRADE_NATION_B),
                    (TRADE_NATION_B, TRADE_NATION_A)}


def test_late_shipment_priority_bucket_invariance(ray_session):
    """The co-bucketed EXISTS fold is bucket-count invariant (block
    partials re-max correctly across any bucketing) and n_late is
    bounded by the window order count per priority."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        LATE_FROM, LATE_TO, late_shipment_priority)

    one = late_shipment_priority(SF, num_buckets=1).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    many = late_shipment_priority(SF, num_buckets=7).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    assert len(one) and one.equals(many)
    assert (one["n_late"] <= one["n_orders"]).all()

    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderdate"]).to_pandas()
    lo, hi = np.datetime64(LATE_FROM), np.datetime64(LATE_TO)
    in_win = ((orders["o_orderdate"] >= lo) & (orders["o_orderdate"] < hi)).sum()
    assert one["n_orders"].sum() == in_win


def test_interorder_gaps_bucket_invariance(ray_session):
    """Per-bucket partial histograms merge to the same global
    histogram at any bucket count, and the total gap count is exactly
    (orders - customers-with-orders)."""
    from pdf_context_extractor_agent_ray.functions.relational import interorder_gaps

    one = interorder_gaps(SF, num_buckets=1).to_pandas() \
        .sort_values("gap_days").reset_index(drop=True)
    many = interorder_gaps(SF, num_buckets=11).to_pandas() \
        .sort_values("gap_days").reset_index(drop=True)
    assert len(one) and one.equals(many)

    o = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"]).to_pandas()
    assert one["n"].sum() == len(o) - o["o_custkey"].nunique()


def test_event_user_overlap_bucket_invariance(ray_session):
    """User-disjoint buckets make the bitmask pair counts mergeable:
    any bucket count yields the same overlap table, and every overlap
    is bounded by the smaller audience."""
    from pdf_context_extractor_agent_ray.functions.streamops import event_user_overlap

    keys = ["type_a", "type_b"]
    one = event_user_overlap(SF, num_buckets=1).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    many = event_user_overlap(SF, num_buckets=5).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    assert len(one) and one.equals(many)
    assert (one["type_a"] < one["type_b"]).all()
    assert (one["n_both"] <= one[["n_users_a", "n_users_b"]].min(axis=1)).all()


def test_market_share_paths_agree(ray_session):
    """All three gated dimension attaches (part semi, supplier attach,
    customer region semi) agree between the broadcast arm and the
    forced Dataset.join arm, and the numerator is bounded by the
    denominator."""
    from pdf_context_extractor_agent_ray.functions.relational import market_share

    fast = market_share(SF).to_pandas() \
        .sort_values("o_year").reset_index(drop=True)
    slow = market_share(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values("o_year").reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert (fast["nation_cents"] <= fast["total_cents"]).all()
    assert (fast["nation_cents"] >= 0).all()


def test_brand_qty_revenue_paths_agree(ray_session):
    """Broadcast (partkey -> rule code, size) payload vs the forced
    Dataset.join arm emit the identical per-brand revenue, covering
    every listed brand with positive cents."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        BRAND_QTY_RULES, brand_qty_revenue)

    fast = brand_qty_revenue(SF).to_pandas() \
        .sort_values("p_brand").reset_index(drop=True)
    slow = brand_qty_revenue(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values("p_brand").reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert set(fast["p_brand"]) <= {r[0] for r in BRAND_QTY_RULES}
    assert (fast["revenue_cents"] > 0).all()


def test_revenue_change_scalar_invariants(ray_session):
    """The single-row streaming aggregate counts exactly the rows a
    direct pyarrow filter keeps, with strictly positive give-back."""
    import pyarrow.compute as pc
    from pdf_context_extractor_agent_ray.functions.relational import (
        REVCHG_DISC_HI, REVCHG_DISC_LO, REVCHG_FROM, REVCHG_MAX_QTY,
        REVCHG_TO, revenue_change)

    out = revenue_change(SF).to_pandas()
    assert len(out) == 1
    assert out["revenue_cents"].iloc[0] > 0

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_shipdate", "l_discount", "l_quantity"])
    keep = pc.and_(
        pc.and_(pc.greater_equal(li["l_shipdate"],
                                 np.datetime64(REVCHG_FROM, "us")),
                pc.less(li["l_shipdate"], np.datetime64(REVCHG_TO, "us"))),
        pc.and_(pc.and_(pc.greater_equal(li["l_discount"], REVCHG_DISC_LO),
                        pc.less_equal(li["l_discount"], REVCHG_DISC_HI)),
                pc.less(li["l_quantity"], float(REVCHG_MAX_QTY))))
    assert out["n_lines"].iloc[0] == pc.sum(keep).as_py()


def test_product_type_profit_paths_agree(ray_session):
    """The gated part-name semi-join (broadcast searchsorted vs forced
    hash-partitioned Dataset.join) and the gated supplier attach agree
    on the per-(nation, year) profit."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        product_type_profit)

    keys = ["nation", "l_year"]
    fast = product_type_profit(SF).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    slow = product_type_profit(SF, broadcast_max_bytes=0).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert (fast["profit_cents"] > 0).all()


def test_returned_item_report_paths_agree(ray_session):
    """The gated orders-window attach (broadcast (orderkey, custkey)
    arrays vs forced Dataset.join) keeps the identical top-k report,
    k rows at most, strictly ranked (revenue desc, custkey asc)."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        RETURNED_TOPK, returned_item_report)

    fast = returned_item_report(SF).reset_index(drop=True)
    slow = returned_item_report(SF, broadcast_max_bytes=0) \
        .reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert len(fast) <= RETURNED_TOPK
    rank = list(zip(-fast["revenue_cents"], fast["c_custkey"]))
    assert rank == sorted(rank)


def test_excess_qty_suppliers_paths_agree(ray_session):
    """Part semi-join and supplier-name attach agree between the
    broadcast arm and the forced Dataset.join arm; suppliers are
    unique and sorted."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        excess_qty_suppliers)

    fast = excess_qty_suppliers(SF).to_pandas().reset_index(drop=True)
    slow = excess_qty_suppliers(SF, broadcast_max_bytes=0).to_pandas() \
        .reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert fast["s_suppkey"].is_unique
    assert fast["s_suppkey"].is_monotonic_increasing


def test_read_predicate_pushdown_matches_batch_filter(ray_session):
    """_read's scan-level predicate keeps exactly the rows the
    equivalent in-batch filter keeps (callers keep both — the batch
    filter stays the semantic guard, the predicate only prunes)."""
    import pyarrow.compute as pc
    from pdf_context_extractor_agent_ray.functions.relational import (
        _between, _read)

    lo, hi = np.datetime64("1996-01-01", "us"), np.datetime64("1997-01-01", "us")
    pushed = _read(SF, "lineitem", ["l_shipdate"],
                   predicate=_between("l_shipdate", lo, hi)).count()
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_shipdate"])
    expect = pc.sum(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                            pc.less(t["l_shipdate"], hi))).as_py()
    assert pushed == expect > 0
    # the window= spelling (what the Q-shape callers use) agrees
    windowed = _read(SF, "lineitem", ["l_shipdate"],
                     window=("l_shipdate", lo, hi)).count()
    assert windowed == expect


def test_read_all_pruned_window_seeds_schema(ray_session):
    """A window that prunes EVERY row group must still yield a
    schema-carrying (0-row) block — a zero-block read starves Ray's
    hash-join aggregators of their schema broadcast and acero fails
    with a schemaless empty partition (seen at sf0.001, whose
    Q7/Q8-shape date windows hold no rows)."""
    from pdf_context_extractor_agent_ray.functions.relational import _read

    ds = _read(SF, "lineitem", ["l_orderkey", "l_shipdate"],
               window=("l_shipdate", np.datetime64("2190-01-01", "us"),
                       np.datetime64("2191-01-01", "us")))
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == \
        ["l_orderkey", "l_shipdate"]


def test_windowed_join_queries_run_on_empty_window(ray_session):
    """Regression: the fact-fact joins must survive a scale where the
    date window holds zero rows (sf0.001) — they previously crashed in
    HashShuffleAggregator.finalize (Ray drops 0-row blocks before the
    join schema broadcast). The empty result must also agree with
    DuckDB."""
    import duckdb
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, oss = e.queries(), e.oracle_sql()
    for name in ("nation_trade_volume", "market_share"):
        got = qs[name](sf).to_pandas()
        want = con.execute(oss[name]).fetchdf()
        assert len(got) == len(want), (name, len(got), len(want))


def test_windowed_queries_forced_empty_window_and_join_arm(ray_session):
    """Every date-windowed query must survive a window that prunes the
    whole table, ON THE HASH-JOIN ARM (broadcast gate forced to 0) —
    the shape a 100 TB run hits when one partition's date range holds
    no data. Expected: empty results (idle_customers: every rich
    customer survives the anti-join, same as the broadcast arm)."""
    from pdf_context_extractor_agent_ray.functions import relational as R

    far = ("2190-01-01", "2191-01-01")
    empties = [
        lambda: R.nation_trade_volume(SF, date_from=far[0], date_to=far[1],
                                      broadcast_max_bytes=0),
        lambda: R.market_share(SF, date_from=far[0], date_to=far[1],
                               broadcast_max_bytes=0),
        lambda: R.local_supplier_volume(SF, date_from=far[0], date_to=far[1],
                                        broadcast_max_bytes=0),
        lambda: R.returned_item_report(SF, date_from=far[0], date_to=far[1],
                                       broadcast_max_bytes=0),
        lambda: R.excess_qty_suppliers(SF, date_from=far[0], date_to=far[1],
                                       broadcast_max_bytes=0),
        lambda: R.revenue_change(SF, date_from=far[0], date_to=far[1]),
    ]
    for fn in empties:
        out = fn()
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert len(df) <= 1, df  # revenue_change is a 1-row scalar

    # idle_customers: empty window => all rich customers kept; the
    # forced-join arm must agree with the broadcast arm
    a = R.idle_customers(SF, cutoff=far[0]).to_pandas()
    b = R.idle_customers(SF, cutoff=far[0],
                         broadcast_max_bytes=0).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(a.columns.tolist()).reset_index(drop=True),
        b.sort_values(b.columns.tolist()).reset_index(drop=True))
    assert len(a) > 0


def test_important_parts_paths_agree(ray_session):
    """Q11: broadcast supplier-membership arm == forced-join arm; the
    1/DEN threshold bounds survivors below DEN; ordering is (value
    desc, partkey asc); every survivor strictly exceeds total//DEN of
    the UNFILTERED per-part sum (recomputed here from the facts)."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        IMPORTANT_NATION, important_parts, important_share_den)

    den = important_share_den(SF)
    fast = important_parts(SF).to_pandas().reset_index(drop=True)
    slow = important_parts(SF, broadcast_max_bytes=0).to_pandas() \
        .reset_index(drop=True)
    dist_sort = important_parts(SF, driver_sort_max_den=0).to_pandas() \
        .reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert fast.equals(dist_sort)
    assert len(fast) < den
    assert fast["value_cents"].is_monotonic_decreasing
    # recompute total + per-part sums sequentially from parquet
    import duckdb
    total, = duckdb.sql(f"""
        SELECT CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100)
                             AS BIGINT)) AS BIGINT)
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        JOIN '{SF}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = '{IMPORTANT_NATION}'""").fetchone()
    assert (fast["value_cents"] > total // den).all()


def test_min_cost_supplier_paths_agree(ray_session):
    """Q2: broadcast part/supplier arms == forced-join arms; winner
    (partkey, suppkey) pairs are unique; each winner's cost equals the
    per-part minimum within the result's own pair set; ordering key is
    (acctbal desc, n_name, s_name, partkey)."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        min_cost_supplier)

    fast = min_cost_supplier(SF).to_pandas().reset_index(drop=True)
    slow = min_cost_supplier(SF, broadcast_max_bytes=0).to_pandas() \
        .reset_index(drop=True)
    assert len(fast) and fast.equals(slow)
    assert not fast.duplicated(["l_partkey", "s_suppkey"]).any()
    per_part_min = fast.groupby("l_partkey")["cost_cents"].transform("min")
    assert (fast["cost_cents"] == per_part_min).all()
    key = list(zip(-fast["s_acctbal_cents"], fast["n_name"],
                   fast["s_name"], fast["l_partkey"]))
    assert key == sorted(key)


def test_key_skew_report_bucket_invariance(ray_session):
    """The fanout report is identical under a degenerate single-bucket
    layout and a 64-way layout (the histogram partials must merge
    exactly), and its totals recount: n_rows == the table row counts,
    bounded by n_keys * max_per_key."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        key_skew_report)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows)

    one = key_skew_report(SF, num_buckets=1).to_pandas()
    many = key_skew_report(SF, num_buckets=64).to_pandas()
    assert len(one) == 4 and one.equals(many)

    rows = {t: parquet_num_rows(f"{SF}/{t}.parquet")
            for t in ("events", "lineitem", "orders")}
    got = one.set_index("domain")["n_rows"]
    assert got["events_user"] == rows["events"]
    assert got["lineitem_partkey"] == rows["lineitem"]
    assert got["lineitem_suppkey"] == rows["lineitem"]
    assert got["orders_custkey"] == rows["orders"]
    assert (one["n_keys"] * one["max_per_key"] >= one["n_rows"]).all()
    assert (one["p50"] <= one["p90"]).all() and (one["p90"] <= one["p99"]).all()
    assert (one["p99"] <= one["max_per_key"]).all()
