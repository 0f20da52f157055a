"""Invariants for the r4 text operators (weighted_sample, postings)
beyond the oracle value gate in test_driver_contract."""
import hashlib

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"
NORM = "trim(regexp_replace(text, '[ \t\r\n\f\v]+', ' ', 'g'), ' ')"


def _docs():
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.util import strip_schema_metadata
    return strip_schema_metadata(rd.read_parquet(f"{SF}/documents.parquet"))


def test_weighted_sample_is_length_biased_and_deterministic(ray_session):
    """Kept docs are re-derivable row-for-row from the documented hash
    rule, and the keep RATE of above-median-length docs exceeds the
    below-median rate (the whole point of length weighting)."""
    from pdf_context_extractor_agent_ray.functions.text import (
        WEIGHTED_PPM_PER_TOKEN, WEIGHTED_SALT, WEIGHTED_TOKEN_CAP,
        token_stats_batch, weighted_sample_batch)

    out = _docs().map_batches(weighted_sample_batch,
                              batch_format="pyarrow").to_pandas()
    toks = _docs().map_batches(token_stats_batch,
                               batch_format="pyarrow").to_pandas() \
        .set_index("doc_id")["n_tokens"]

    expect = set()
    for i, n in toks.items():
        t = min(min(int(n), WEIGHTED_TOKEN_CAP) * WEIGHTED_PPM_PER_TOKEN,
                1_000_000)
        h = int.from_bytes(
            hashlib.md5(f"{i}#{WEIGHTED_SALT}".encode()).digest()[:8], "big")
        if h % 1_000_000 < t:
            expect.add(i)
    assert set(out["doc_id"]) == expect and len(expect)

    med = toks.median()
    kept = toks.index.isin(out["doc_id"])
    long_rate = kept[toks >= med].mean()
    short_rate = kept[toks < med].mean()
    assert long_rate > short_rate


def test_postings_df_exact_and_head_is_prefix(ray_session):
    """Every emitted df equals an independent DuckDB recount, and each
    posting head is exactly the first K sorted doc_ids of the TRUE
    full posting list (the head-K merge across batches loses nothing)."""
    from pdf_context_extractor_agent_ray.functions.text import (
        POSTINGS_HEAD_K, postings)

    out = postings(_docs(), n_docs=500).to_pandas()
    con = duckdb.connect()
    truth = con.execute(f"""
        WITH t AS (SELECT DISTINCT doc_id, tok
                   FROM (SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok
                         FROM read_parquet('{SF}/documents.parquet')))
        SELECT tok, count(*) AS df,
               list(doc_id ORDER BY doc_id) AS ids
        FROM t GROUP BY 1
    """).fetchdf().set_index("tok")

    assert sorted(out["token"]) == sorted(truth.index)
    for _, r in out.iterrows():
        tr = truth.loc[r["token"]]
        assert r["df"] == tr["df"]
        head = [int(x) for x in r["posting"].split(",")]
        assert head == list(tr["ids"][:POSTINGS_HEAD_K])


def test_postings_bucket_invariance(ray_session):
    """Bucket count changes the plan, never the index: 1 vs 5 buckets
    emit the identical (token, df, posting) table. Forcing multiple
    read blocks up front also exercises the cross-batch head merge."""
    from pdf_context_extractor_agent_ray.functions.text import postings

    a = postings(_docs(), num_buckets=1).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    b = postings(_docs().repartition(7), num_buckets=5).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    assert len(a) and a.equals(b)


def test_rolling_revenue_matches_pandas_rolling(ray_session):
    """The trailing 7-day RANGE window equals an independent pandas
    recount (time-indexed rolling sum over the daily series)."""
    import pyarrow.parquet as pq
    from pdf_context_extractor_agent_ray.functions.relational import (
        ROLLING_WINDOW_DAYS, rolling_revenue)

    out = rolling_revenue(SF).to_pandas().sort_values("day_us") \
        .reset_index(drop=True)
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"]).to_pandas()
    import numpy as np
    o["day"] = o["o_orderdate"].dt.floor("D")
    o["cents"] = np.floor(np.abs(o["o_totalprice"].to_numpy()) * 100
                          + 0.5).astype("int64")
    daily = o.groupby("day")["cents"].sum().sort_index()
    roll = daily.rolling(f"{ROLLING_WINDOW_DAYS}D").sum().astype("int64")
    assert len(out) == len(daily)
    assert out["revenue_cents"].tolist() == daily.tolist()
    assert out["rolling7_cents"].tolist() == roll.tolist()
    assert (out["rolling7_cents"] >= out["revenue_cents"]).all()


def test_pmi_bigrams_paths_agree_and_rank_sane(ray_session):
    """Broadcast unigram map vs forced double hash join emit the
    identical top-k, every returned bigram clears the support
    threshold, and each pmi_e6 re-derives from its own row's counts
    plus the independently recomputed corpus totals."""
    import duckdb
    from pdf_context_extractor_agent_ray.functions.text import (
        PMI_MIN_COUNT, pmi_bigrams)

    fast = pmi_bigrams(_docs(), n_docs=500).to_pandas().reset_index(drop=True)
    slow = pmi_bigrams(_docs(), broadcast_max_vocab=0).to_pandas() \
        .reset_index(drop=True)  # n_docs=None: groupby counts + joins
    assert len(fast) and fast.equals(slow)
    assert (fast["c_xy"] >= PMI_MIN_COUNT).all()

    con = duckdb.connect()
    n_uni, n_pairs = con.execute(f"""
        WITH t AS (SELECT string_split({NORM}, ' ') AS tk
                   FROM read_parquet('{SF}/documents.parquet'))
        SELECT (SELECT sum(len(tk)) FROM t),
               (SELECT sum(greatest(len(tk) - 1, 0)) FROM t)
    """).fetchone()
    n_uni, n_pairs = int(n_uni), int(n_pairs)
    for _, r in fast.iterrows():
        expect = (int(r["c_xy"]) * n_uni * n_uni * 1_000_000) \
            // (n_pairs * int(r["c_x"]) * int(r["c_y"]))
        assert int(r["pmi_e6"]) == expect


def test_vocab_growth_curve_invariants(ray_session):
    """cum_vocab is strictly increasing, its last value equals the
    corpus distinct-token count, new_tokens sums to it, and bucket ids
    map back to the documented width."""
    import __ray_entry__ as e
    from pdf_context_extractor_agent_ray.functions.text import (
        VOCAB_GROWTH_BUCKETS, vocab_growth)

    n_ids = e._max_doc_id(SF) + 1
    width = -(-n_ids // VOCAB_GROWTH_BUCKETS)
    df = vocab_growth(_docs(), n_ids).to_pandas()

    assert (df["bucket"].to_numpy() ==
            df["bucket_start_id"].to_numpy() // width).all()
    assert df["bucket"].is_monotonic_increasing
    assert (df["new_tokens"] > 0).all()
    assert (df["new_tokens"].cumsum() == df["cum_vocab"]).all()

    n_vocab = duckdb.sql(
        f"SELECT count(DISTINCT tok) FROM (SELECT unnest(string_split("
        f"{NORM}, ' ')) AS tok FROM read_parquet('{SF}/documents.parquet'))"
    ).fetchone()[0]
    assert int(df["cum_vocab"].iloc[-1]) == n_vocab


def test_segment_acctbal_quantiles_rank_rule(ray_session, tmp_path):
    """The engine's integer ceil(q*n) rank matches DuckDB
    percentile_disc on a crafted corpus that distinguishes ceil(q*n)
    from floor(q*(n-1))+1 (n=12 at q=0.9) and exercises .5-cent
    rounding."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_context_extractor_agent_ray.functions.relational import (
        segment_acctbal_quantiles)

    # segment A: 12 customers (0.9*12 = 10.8 -> rank 11, not 10);
    # values include a .005 half-cent boundary
    bal_a = [1.005, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0]
    bal_b = [-1.0, 0.0, 2.5]
    t = pa.table({
        "c_custkey": pa.array(range(len(bal_a) + len(bal_b)), pa.int64()),
        "c_name": pa.array(["x"] * (len(bal_a) + len(bal_b))),
        "c_nationkey": pa.array([0] * (len(bal_a) + len(bal_b)), pa.int32()),
        "c_acctbal": pa.array(bal_a + bal_b, pa.float64()),
        "c_mktsegment": pa.array(["A"] * len(bal_a) + ["B"] * len(bal_b)),
    })
    pq.write_table(t, str(tmp_path / "customer.parquet"))

    got = {r["c_mktsegment"]: r
           for r in segment_acctbal_quantiles(str(tmp_path)).take_all()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{tmp_path}/customer.parquet')")
    import __ray_entry__ as e
    exp = con.execute(e.oracle_sql()["segment_acctbal_quantiles"]).fetchdf()
    for _, row in exp.iterrows():
        g = got[row["c_mktsegment"]]
        for c in ("n_customers", "p25_cents", "p50_cents",
                  "p75_cents", "p90_cents"):
            assert g[c] == row[c], (row["c_mktsegment"], c, g[c], row[c])
    # the distinguishing cell: rank 11 of segment A -> 1100 cents
    assert got["A"]["p90_cents"] == 1100
    # half-away rounding of 1.005 -> 101 cents at p25 of the 12-row set?
    # rank ceil(0.25*12)=3 -> 300; check the boundary value survives as min
    assert got["A"]["p25_cents"] == 300


def test_doc_novelty_paths_and_invariants(ray_session):
    """Driver merge and the forced co-bucketed union merge agree
    row-for-row; novelty partitions exactly (every distinct shingle
    has exactly one first owner, so sum(n_novel) == global distinct
    shingle count); the minimum doc_id is 100% novel."""
    from pdf_context_extractor_agent_ray.functions.dedup import (
        _shingle_hash_rows)
    from pdf_context_extractor_agent_ray.functions.text import doc_novelty
    from pdf_context_extractor_agent_ray.functions.util import parquet_num_rows

    n_docs = parquet_num_rows(f"{SF}/documents.parquet")
    fast = doc_novelty(_docs(), n_docs=n_docs)
    fast = fast if isinstance(fast, pd.DataFrame) else fast.to_pandas()
    fast = fast.sort_values("doc_id").reset_index(drop=True)
    slow = doc_novelty(_docs(), n_docs=n_docs, driver_merge_max_docs=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(fast) == n_docs and fast.equals(slow)
    assert (fast["n_novel"] <= fast["n_shingles"]).all()
    first = fast.iloc[0]
    assert first["doc_id"] == fast["doc_id"].min()
    assert first["n_novel"] == first["n_shingles"]
    # exact partition: one first-owner per distinct shingle hash
    sh = _docs().map_batches(_shingle_hash_rows,
                             batch_format="pyarrow").to_pandas()
    n_distinct = len(sh[["h0", "h1"]].drop_duplicates())
    assert int(fast["n_novel"].sum()) == n_distinct


def test_doc_novelty_replication_attributes_to_first_copy(ray_session):
    """On a corpus unioned with a doc_id-shifted copy of itself, every
    shingle's first owner stays in the original range: the copies get
    n_novel == 0 and the originals keep exactly their standalone
    novelty (min-doc attribution is deterministic, not order-lucky)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf_context_extractor_agent_ray.functions.text import doc_novelty
    from pdf_context_extractor_agent_ray.functions.util import parquet_num_rows

    n_docs = parquet_num_rows(f"{SF}/documents.parquet")
    OFF = 10_000_000

    def shift(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("doc_id"), "doc_id",
            pc.add(batch["doc_id"], OFF))

    base = doc_novelty(_docs(), n_docs=n_docs)
    base = (base if isinstance(base, pd.DataFrame) else base.to_pandas()) \
        .sort_values("doc_id").reset_index(drop=True)
    both = _docs().union(_docs().map_batches(shift, batch_format="pyarrow"))
    rep = doc_novelty(both, n_docs=2 * n_docs)
    rep = (rep if isinstance(rep, pd.DataFrame) else rep.to_pandas())
    lo = rep[rep["doc_id"] < OFF].sort_values("doc_id").reset_index(drop=True)
    hi = rep[rep["doc_id"] >= OFF]
    assert len(lo) == len(hi) == n_docs
    assert (hi["n_novel"] == 0).all()
    assert lo.equals(base)


def test_doc_novelty_survives_mid_doc_block_splits(ray_session):
    """Ray's dynamic block splitting can slice the materialized
    shingle stream MID-DOC, turning per-doc totals into several
    partial rows; the merge must re-sum them (regression: a 64 KB
    block cap once produced 24 partial rows for one doc and
    n_novel > n_shingles)."""
    from ray.data import DataContext

    from pdf_context_extractor_agent_ray.functions.text import doc_novelty
    from pdf_context_extractor_agent_ray.functions.util import parquet_num_rows

    n_docs = parquet_num_rows(f"{SF}/documents.parquet")
    base = doc_novelty(_docs(), n_docs=n_docs)
    base = (base if isinstance(base, pd.DataFrame) else base.to_pandas()) \
        .sort_values("doc_id").reset_index(drop=True)

    ctx = DataContext.get_current()
    saved = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        split = doc_novelty(_docs(), n_docs=n_docs)
        split = (split if isinstance(split, pd.DataFrame)
                 else split.to_pandas()) \
            .sort_values("doc_id").reset_index(drop=True)
        split_union = doc_novelty(_docs(), n_docs=n_docs,
                                  driver_merge_max_docs=0).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    finally:
        ctx.target_max_block_size = saved
    assert len(split) == n_docs and split.equals(base)
    assert split_union.equals(base)


def test_source_quality_gate_matches_per_doc_recompute(ray_session):
    """The bounded-histogram fold reproduces a direct per-doc pandas
    recompute of the percentile_disc rule (threshold = smallest score
    with cum count >= ceil(q*n)), and the kept counts are the suffix
    sums of that same distribution."""
    import numpy as np
    from pdf_context_extractor_agent_ray.functions.text import (
        QUALITY_GATE_Q_NUM, STOPWORD_RES, TOKEN_RE, source_quality_gate)

    out = source_quality_gate(_docs()).to_pandas() \
        .sort_values("source").reset_index(drop=True)

    docs = _docs().to_pandas()
    import re
    tok = re.compile(TOKEN_RE)
    stop = re.compile(STOPWORD_RES["en"])
    docs["n_chars"] = docs["text"].str.len()
    docs["score"] = [
        len(stop.findall(t)) * 1000 // max(len(tok.findall(t)), 1)
        for t in docs["text"]]
    rows = []
    for source, g in docs.groupby("source", sort=True):
        vals = np.sort(g["score"].to_numpy(np.int64))
        n = len(vals)
        thr = int(vals[(n * QUALITY_GATE_Q_NUM + 99) // 100 - 1])
        kept = g[g["score"] >= thr]
        rows.append({"source": source, "n_docs": n,
                     "threshold_permille": thr, "n_kept": len(kept),
                     "kept_chars": int(kept["n_chars"].sum())})
    expect = pd.DataFrame(rows)
    for c in expect.columns:
        if c != "source":
            expect[c] = expect[c].astype("int64")
    assert len(out) and out.equals(expect)
    assert (out["n_kept"] <= out["n_docs"]).all()
    # the gate keeps at least (100 - q)% of every source by definition
    assert (out["n_kept"] * 100 >= out["n_docs"]
            * (100 - QUALITY_GATE_Q_NUM)).all()


def test_token_budget_plan_sums_exactly(ray_session):
    """Largest-remainder apportionment: allocations are integers that
    sum EXACTLY to the budget for budgets that do and do not divide
    evenly; each source's allocation is within 1 unit of its exact
    proportional quota; repeat_e6 floors alloc*1e6/n_tokens."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import (
        source_weight_permille, token_budget_plan)
    from pdf_context_extractor_agent_ray.functions.util import (
        strip_schema_metadata)

    docs = strip_schema_metadata(
        rd.read_parquet(f"{SF}/documents.parquet"))
    for budget in (10_000_000, 9_999_997, 101):
        plan = token_budget_plan(docs, budget=budget).to_pandas()
        assert len(plan) > 1
        assert int(plan["alloc_tokens"].sum()) == budget
        w = plan["source"].map(source_weight_permille)
        assert (plan["weight_permille"] == w).all()
        sw = int(w.sum())
        exact_lo = (budget * w) // sw
        assert ((plan["alloc_tokens"] - exact_lo).isin([0, 1])).all()
        assert (plan["repeat_e6"] ==
                (plan["alloc_tokens"] * 1_000_000) // plan["n_tokens"]).all()
        assert list(plan["source"]) == sorted(plan["source"])
        docs = strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))


def test_recrawl_delta_paths_and_residue_counts(ray_session):
    """Broadcast driver fold == forced co-bucketed union fold; the
    class totals equal the residue-class cardinalities by construction
    (every changed-residue id fingerprints differently because the
    marker is PREPENDED inside the fingerprint prefix)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import (
        SNAP_ADDED_RESIDUE, SNAP_CHANGED_RESIDUE, SNAP_DELETED_RESIDUE,
        SNAP_MOD, recrawl_delta, snapshot_new, snapshot_old)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")
    fast = recrawl_delta(snapshot_old(docs()), snapshot_new(docs()),
                         n_docs=n)
    slow = recrawl_delta(snapshot_old(docs()), snapshot_new(docs()),
                         n_docs=n, broadcast_max_docs=0).to_pandas() \
        .reset_index(drop=True)
    assert len(fast) and fast.equals(slow)

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"] \
        .to_numpy(zero_copy_only=False)
    r = ids % SNAP_MOD
    assert int(fast["n_changed"].sum()) == int((r == SNAP_CHANGED_RESIDUE).sum())
    assert int(fast["n_added"].sum()) == int((r == SNAP_ADDED_RESIDUE).sum())
    assert int(fast["n_deleted"].sum()) == int((r == SNAP_DELETED_RESIDUE).sum())
    assert int(fast["n_unchanged"].sum()) == int(
        (~np.isin(r, [SNAP_CHANGED_RESIDUE, SNAP_ADDED_RESIDUE,
                      SNAP_DELETED_RESIDUE])).sum())


def test_heavy_hitters_partitioning_independent_and_exact(ray_session):
    """The candidate+verify result is identical under 1 block and
    under an adversarial 37-way repartition (pigeonhole candidates
    differ per partitioning; the exact verify must erase that), equals
    a driver-side exact recount, and the 1/K bar actually bites (the
    corpus has sub-threshold tokens)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import (
        HH_K, heavy_hitters, norm_expr)
    from pdf_context_extractor_agent_ray.functions.util import (
        strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    one = heavy_hitters(docs().repartition(1)).to_pandas()
    many = heavy_hitters(docs().repartition(37)).to_pandas()
    assert len(one) and one.equals(many)

    # driver-side exact recount (plain Counter over the same norm)
    from collections import Counter
    texts = docs().map_batches(
        lambda b: {"t": norm_expr(b["text"]).to_pylist()},
        batch_format="pyarrow").to_pandas()["t"]
    c = Counter()
    for s in texts:
        c.update(s.split(" "))
    n = sum(c.values())
    truth = sorted(((tok, cnt) for tok, cnt in c.items() if cnt * HH_K > n),
                   key=lambda kv: (-kv[1], kv[0]))
    assert list(map(tuple, one[["token", "n_occurrences"]].to_numpy())) \
        == truth
    assert len(truth) < len(c)  # the bar excludes part of the vocab
