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
