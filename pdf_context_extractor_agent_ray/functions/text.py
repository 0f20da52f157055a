"""Text-analysis operators over flat document tables.

All hot paths are vectorized pyarrow.compute kernels (RE2 — the same
regex engine DuckDB uses, which is what makes the SQL oracles
value-exact). Regex constants are shared with the SQL strings in
``__ray_entry__.oracle_sql`` — keep them in lockstep.
"""
from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .util import table_from_pandas

# shared with the SQL oracles (RE2 syntax on both sides)
WS_RE = r"[ \t\r\n\f\v]+"
TOKEN_RE = r"[^ ]+"
PUNCT_RE = r"[.,!?;:]"
DIGIT_RE = r"[0-9]"
STOPWORD_RES = {
    "en": r"\b(the|and|of|to|in|a|is|it|for|on)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu|den|mit)\b",
    "fr": r"\b(le|la|les|et|est|un|une|des|en|du)\b",
}
LANG_ORDER = ["en", "de", "fr"]  # deterministic tie-break: first wins
FINGERPRINT_PREFIX = 30

# quality thresholds for the keep flag
MIN_CHARS = 80
MAX_PUNCT_RATIO_PCT = 20



def norm_expr(col):
    """THE whitespace-collapse + trim normalization — single engine-side
    definition mirroring the SQL ``_NORM`` macro (keep in lockstep)."""
    return pc.utf8_trim(pc.replace_substring_regex(col, WS_RE, " "), " ")

def normalize_batch(batch: pa.Table) -> pa.Table:
    """doc_id, norm_text, n_chars — whitespace collapse + space trim
    (the engine's analogue of the reference cell clean,
    src/table_extractor.py:343-345)."""
    norm = norm_expr(batch["text"])
    return pa.table({
        "doc_id": batch["doc_id"],
        "norm_text": norm,
        "n_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
    })


def token_stats_batch(batch: pa.Table) -> pa.Table:
    norm = norm_expr(batch["text"])
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pc.cast(pc.count_substring_regex(norm, TOKEN_RE), pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality features + keep flag (length / punctuation /
    stopword heuristics, all int-valued for exact oracle hashing)."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64())
    n_digits = pc.cast(pc.count_substring_regex(text, DIGIT_RE), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(text, STOPWORD_RES["en"]), pa.int64())
    keep = pc.and_(
        pc.greater_equal(n_chars, MIN_CHARS),
        pc.less_equal(pc.multiply(n_punct, 100),
                      pc.multiply(pc.max_element_wise(n_chars, 1), MAX_PUNCT_RATIO_PCT)),
    )
    return pa.table({
        "doc_id": batch["doc_id"], "n_chars": n_chars, "n_punct": n_punct,
        "n_digits": n_digits, "n_tokens": n_tokens, "n_stopwords": n_stop,
        "keep": keep,
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    """n-gram/stopword language ID: per-language marker-word counts,
    argmax with deterministic tie-break (LANG_ORDER)."""
    text = batch["text"]
    scores = {lang: pc.count_substring_regex(text, rx).to_numpy(zero_copy_only=False)
              for lang, rx in STOPWORD_RES.items()}
    import numpy as np
    mat = np.stack([scores[lang] for lang in LANG_ORDER])  # first axis wins ties
    best = mat.argmax(axis=0)
    pred = np.array(LANG_ORDER, dtype=object)[best]
    pred[mat.max(axis=0) == 0] = "und"
    return pa.table({
        "doc_id": batch["doc_id"],
        "pred_lang": pa.array(list(pred), pa.string()),
        "score": pa.array(mat.max(axis=0), pa.int64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint: md5 of the first FINGERPRINT_PREFIX chars of
    the normalized text (document fingerprinting for exact dedup)."""
    norm = norm_expr(batch["text"])
    prefixes = pc.utf8_slice_codeunits(norm, 0, FINGERPRINT_PREFIX).to_pylist()
    hashes = [hashlib.md5(p.encode()).hexdigest() for p in prefixes]
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_hash": pa.array(hashes, pa.string()),
    })


# BPE-ish pretokenizer (GPT-2-style classes, RE2-compatible on both
# pyarrow and DuckDB): letter runs / digit runs / other-symbol runs,
# each optionally preceded by one space.
BPE_TOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N} ]+"

SPLIT_SALT = "split-v1"
SPLIT_BOUNDARIES = (80, 90)  # train < 80 <= val < 90 <= test


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """Subword-ish token budget estimate: whitespace tokens + BPE-style
    pretokenizer runs (the cheap proxy for tokenizer cost used when
    budgeting training corpora)."""
    text = batch["text"]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_ws_tokens": pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64()),
        "n_bpe_tokens": pc.cast(pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int64()),
    })


def dataset_split_batch(batch: pa.Table) -> pa.Table:
    """Deterministic train/val/test assignment by content-independent
    hash bucketing: bucket = md5(doc_id + salt)[0:8] mod 100. Stable
    under re-runs, partitioning, and corpus growth — the standard
    at-scale split mechanism (no RNG, no shuffle)."""
    ids = batch["doc_id"].to_pylist()
    buckets = [int.from_bytes(
        hashlib.md5(f"{i}#{SPLIT_SALT}".encode()).digest()[:8], "big") % 100
        for i in ids]
    lo, hi = SPLIT_BOUNDARIES
    splits = ["train" if b < lo else "val" if b < hi else "test" for b in buckets]
    return pa.table({
        "doc_id": batch["doc_id"],
        "bucket": pa.array(buckets, pa.int64()),
        "split": pa.array(splits, pa.string()),
    })


SAMPLE_SALT = "sample-v1"
SAMPLE_PERMILLE = 100  # 10% per stratum


def stratified_sample_batch(batch: pa.Table) -> pa.Table:
    """Deterministic stratified sampling: keep a doc iff
    md5(doc_id+salt) mod 1000 < rate, independently within every
    ``source`` stratum — reproducible across runs/partitions and
    proportionally representative per stratum (hash sampling, the
    at-scale replacement for RNG sampling)."""
    ids = batch["doc_id"].to_pylist()
    keep = [int.from_bytes(hashlib.md5(f"{i}#{SAMPLE_SALT}".encode()).digest()[:8],
                           "big") % 1000 < SAMPLE_PERMILLE for i in ids]
    return pa.table({
        "doc_id": batch["doc_id"],
        "source": batch["source"],
        "lang": batch["lang"],
    }).filter(pa.array(keep, pa.bool_()))


MIX_SALT = "mix-v1"
MIX_WEIGHT_MOD = 901     # weight_permille ranges over [100, 1000]
MIX_WEIGHT_MIN = 100


def source_weight_permille(source: str) -> int:
    """Deterministic per-source mixture weight (keep-rate in permille).
    Derived from the source name so the demo needs no side-channel
    config; a real pipeline passes its mixture weights as a dict the
    same broadcast-tiny way."""
    return (int.from_bytes(hashlib.md5(source.encode()).digest()[:8], "big")
            % MIX_WEIGHT_MOD + MIX_WEIGHT_MIN)


def mixture_sample_batch(batch: pa.Table) -> pa.Table:
    """Weighted source mixing (the training-data mixer primitive —
    sample each source stratum at its mixture weight): keep a doc iff
    md5(doc_id+salt) mod 1000 < weight_permille(source). Hash sampling,
    not RNG — the sample is identical under re-runs, repartitioning and
    corpus growth, and needs no shuffle or interleave pass: the weights
    table is O(#sources) and ships with the closure."""
    ids = batch["doc_id"].to_pylist()
    srcs = batch["source"].to_pylist()
    w = {s: source_weight_permille(s) for s in set(srcs)}
    weights = [w[s] for s in srcs]
    keep = [int.from_bytes(hashlib.md5(f"{i}#{MIX_SALT}".encode()).digest()[:8],
                           "big") % 1000 < wp for i, wp in zip(ids, weights)]
    return pa.table({
        "doc_id": batch["doc_id"],
        "source": batch["source"],
        "weight_permille": pa.array(weights, pa.int64()),
    }).filter(pa.array(keep, pa.bool_()))


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality features per document over the
    normalized token stream: token count, distinct-token count, the
    top token's occurrence count, and the e6-scaled duplicate-token /
    top-token fractions (round-half-away to match the SQL oracle).
    Doc-local and stateless — one pandas groupby per batch, no
    exchange."""
    import numpy as np
    import pandas as pd
    from .util import round_half_away_e

    norm = norm_expr(batch["text"]).to_pylist()
    doc_idx, toks = [], []
    for k, s in enumerate(norm):
        tk = s.split(" ")
        doc_idx.extend([k] * len(tk))
        toks.append(tk)
    flat = pd.DataFrame({"d": np.asarray(doc_idx, dtype=np.int64),
                         "t": [t for tk in toks for t in tk]})
    per = flat.groupby(["d", "t"], sort=False).size().rename("c").reset_index()
    agg = per.groupby("d", sort=True).agg(
        n_tokens=("c", "sum"), n_distinct_tokens=("c", "size"),
        top_token_count=("c", "max"))
    n = agg["n_tokens"].to_numpy(dtype=np.int64)
    nd = agg["n_distinct_tokens"].to_numpy(dtype=np.int64)
    top = agg["top_token_count"].to_numpy(dtype=np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n, pa.int64()),
        "n_distinct_tokens": pa.array(nd, pa.int64()),
        "top_token_count": pa.array(top, pa.int64()),
        # Multiply-FIRST to mirror the oracle's round(1e6*d/n) operand
        # order: (d/n)*1e6 differs by 1 at exact .5 boundaries (e.g.
        # n=640, d=41 -> 64062 vs 64063). int*1e6 is exact in float64
        # for counts < 2^53/1e6, so multiply-first matches DuckDB
        # bit-for-bit.
        "dup_token_frac_e6": pa.array(
            round_half_away_e(1e6 * (n - nd) / n, scale=1.0), pa.int64()),
        "top_token_frac_e6": pa.array(
            round_half_away_e(1e6 * top / n, scale=1.0), pa.int64()),
    })


INTERLEAVE_BUCKET_DOCS = 1_000_000   # doc_id-range docs per rank bucket
INTERLEAVE_SCALE = 1_000_000         # integer key scale: rank*SCALE // weight


def interleave_plan(ds):
    """Deterministic weighted interleave of source streams (the
    interleaved-datasets training primitive): each doc gets its rank
    within its source (doc_id order) and an integer
    ``interleave_key = (src_rank + 1) * SCALE // weight_permille``;
    reading in (interleave_key, source, doc_id) order replays the
    weighted round-robin in which every source advances at a rate
    proportional to its mixture weight. Output: doc_id, source,
    src_rank, interleave_key — keys only; consumers sort or
    range-partition by the key, the docs themselves never shuffle.

    The per-source rank is a distributed two-pass range-rank:

    - pass A (tiny exchange): per-batch counts per (source,
      doc_id-range bucket) → driver-side per-source exclusive prefix
      sums → broadcast. The driver table is O(#sources × #buckets)
      with buckets of ``INTERLEAVE_BUCKET_DOCS`` ids — corpus/1M rows,
      NOT corpus rows (raise the bucket width at 100 TB to keep it
      bounded).
    - pass B: ``groupby(bucket).map_groups`` folds each range bucket
      vectorized (one argsort + per-source cumcount per ~1M-row
      bucket, never one call per source or per doc) and adds the
      broadcast offsets. The exchange ships fixed-width
      (doc_id, source-enum) keys, never text.

    int64 bound: src_rank*SCALE caps at ~9.2e18, safe through ~10^12
    docs per source at SCALE=1e6.
    """
    import numpy as np
    import pandas as pd
    import ray

    B = INTERLEAVE_BUCKET_DOCS

    def counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pylist(),
            "bucket": batch["doc_id"].to_numpy(zero_copy_only=False) // B,
        })
        agg = df.groupby(["source", "bucket"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return table_from_pandas(agg)

    parts = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    tot = parts.groupby(["source", "bucket"], as_index=False)["n"].sum() \
        .sort_values(["source", "bucket"])
    tot["offset"] = tot.groupby("source")["n"].cumsum() - tot["n"]
    offsets = {(s, int(b)): int(o) for s, b, o in
               zip(tot["source"], tot["bucket"], tot["offset"])}
    ref = ray.put(offsets)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"], "source": batch["source"],
            "bucket": pa.array((ids // B).astype(np.int64), pa.int64()),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref)
        b = int(df["bucket"].iat[0])
        df = df.sort_values("doc_id", kind="stable")
        rank = df.groupby("source").cumcount().to_numpy(dtype=np.int64)
        srcs = df["source"]
        base = srcs.map({s: off[(s, b)] for s in srcs.unique()}) \
            .to_numpy(dtype=np.int64)
        weight = srcs.map({s: source_weight_permille(s)
                           for s in srcs.unique()}).to_numpy(dtype=np.int64)
        src_rank = base + rank
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": srcs,
            "src_rank": src_rank,
            "interleave_key": (src_rank + 1) * INTERLEAVE_SCALE // weight,
        })

    return ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas")


DOC_FREQ_K = 20


def doc_freq_batch(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL document frequencies: each doc contributes its
    DISTINCT tokens once (docs are whole within a batch, so per-batch
    set-per-doc then sum is exact), one row per distinct token per
    batch — the exchange moves vocabulary keys, not token streams."""
    from collections import Counter
    counts: Counter = Counter()
    for s in norm_expr(batch["text"]).to_pylist():
        counts.update(set(s.split(" ")))
    return pa.table({"token": pa.array(list(counts.keys()), pa.string()),
                     "df": pa.array(list(counts.values()), pa.int64())})


def doc_freq(ds, k: int = DOC_FREQ_K):
    """Global top-k tokens by DOCUMENT frequency (the df side of
    tf-idf / vocabulary pruning): partial per-batch distinct-per-doc
    counts → groupby-sum → per-block partial top-k → tiny final top-k.
    Same Zipf-bounded exchange shape as ``top_ngrams``; deterministic
    tie-break (df desc, token asc) matches the SQL oracle at the k
    boundary."""
    import pandas as pd
    from ray.data.aggregate import Sum

    agg = ds.map_batches(doc_freq_batch, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["df", "token"], ascending=[False, True]).head(k)

    return agg.map_batches(final, batch_format="pandas") \
        .repartition(1).map_batches(final, batch_format="pandas")


def length_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch sufficient statistics for per-source length moments
    (n, sum, sum of squares — integers, so mean/stddev derive exactly
    downstream and the oracle hashes identically)."""
    n_chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
    return pa.table({
        "source": batch["source"],
        "n_chars": n_chars,
        "n_chars_sq": pc.multiply(n_chars, n_chars),
    })


def length_stats(ds):
    """Per-source length moments: per-batch partial (count/sum/sumsq
    per source) then the bounded-key finish (sources are a small
    enum)."""
    from .util import finish_grouped

    def partial(batch: pa.Table) -> pa.Table:
        return length_stats_batch(batch).group_by("source").aggregate(
            [("n_chars", "count"), ("n_chars", "sum"),
             ("n_chars_sq", "sum")]) \
            .rename_columns(["source", "n", "sum_chars", "sum_chars_sq"])

    return finish_grouped(ds.map_batches(partial, batch_format="pyarrow"),
                          ["source"])


QUALITY_GATE_Q_NUM = 25  # keep docs at/above the per-source p25 score


def source_quality_gate(ds, q_num: int = QUALITY_GATE_Q_NUM):
    """Per-source quality-percentile gate in ONE distributed pass:
    score each doc with an integer stopword-density permille
    (``n_stopwords * 1000 // max(n_tokens, 1)``), take the exact
    per-source ``percentile_disc(q_num/100)`` threshold, and report
    how much of each source survives a ``score >= threshold`` filter
    — (source, n_docs, threshold_permille, n_kept, kept_chars).

    At-scale shape: the score domain is BOUNDED ([0, 1000]), so
    per-batch (source, score) value-count partials (n docs, sum chars)
    converge to a <= 1001 x |sources| histogram regardless of corpus
    size; the finish folds that tiny table and derives the threshold
    with one cumsum + searchsorted per source — no global sort, no
    second corpus scan for the kept counts (they are suffix sums of
    the same histogram). Rank rule matches DuckDB ``percentile_disc``
    (smallest value with cumulative count >= ceil(q*n), computed as
    the exact integer ``(n*q_num + 99) // 100`` — the rule verified
    against DuckDB n=1..300 in relational.segment_acctbal_quantiles).
    """
    from .util import finish_grouped

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                           pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(text, STOPWORD_RES["en"]),
                         pa.int64())
        score = pc.divide(pc.multiply(n_stop, 1000),
                          pc.max_element_wise(n_tokens, 1))
        return pa.table({"source": batch["source"], "score": score,
                         "n_chars": n_chars}) \
            .group_by(["source", "score"]) \
            .aggregate([("n_chars", "count"), ("n_chars", "sum")]) \
            .rename_columns(["source", "score", "n", "sum_chars"])

    folded = finish_grouped(ds.map_batches(partial, batch_format="pyarrow"),
                            ["source", "score"])

    def final(df):
        import numpy as np
        import pandas as pd
        rows = []
        for source, g in df.sort_values(["source", "score"]) \
                           .groupby("source", sort=True):
            n = int(g["n"].sum())
            cum = g["n"].to_numpy(dtype=np.int64).cumsum()
            vals = g["score"].to_numpy(dtype=np.int64)
            idx = int(np.searchsorted(cum, (n * q_num + 99) // 100,
                                      side="left"))
            kept_below = int(cum[idx - 1]) if idx else 0
            rows.append({
                "source": source, "n_docs": n,
                "threshold_permille": int(vals[idx]),
                "n_kept": n - kept_below,
                "kept_chars": int(g["sum_chars"].iloc[idx:].sum()),
            })
        out = pd.DataFrame(rows)
        for c in out.columns:
            if c != "source":
                out[c] = out[c].astype("int64")
        return out

    return folded.map_batches(final, batch_format="pandas", batch_size=None)


def rolling_fingerprint_batch(batch: pa.Table, window: int = 16) -> pa.Table:
    """Rolling-hash document fingerprint: min md5 over sliding
    character windows of the normalized text (a robust-to-edit
    fingerprint; windowed analogue of winnowing)."""
    norm = norm_expr(batch["text"]).to_pylist()
    out = []
    for s in norm:
        if len(s) <= window:
            out.append(hashlib.md5(s.encode()).hexdigest())
        else:
            out.append(min(hashlib.md5(s[i:i + window].encode()).hexdigest()
                           for i in range(0, len(s) - window + 1, 4)))
    return pa.table({"doc_id": batch["doc_id"],
                     "rolling_hash": pa.array(out, pa.string())})


# every doc whose doc_id is divisible by this is "benchmark" content;
# decontamination drops every corpus doc sharing its fingerprint
DECONTAM_MODULUS = 50


DECONTAM_BROADCAST_MAX = 10_000_000  # benchmark hashes broadcast below this


def decontaminate(ds, broadcast_max_hashes: int = DECONTAM_BROADCAST_MAX):
    """Benchmark decontamination: drop every document whose content
    fingerprint collides with the benchmark set.

    Size-gated like every other anti-join in the engine: up to
    ``broadcast_max_hashes`` benchmark fingerprint rows the blocklist
    is a broadcast set (``ray.put`` once, ``pc.is_in`` per batch) —
    the classic decontamination shape, since real benchmark sets are
    tiny and static. Above the gate (a benchmark side that somehow
    scales with the corpus — here the synthetic one is 1/50 of it) the
    corpus fingerprints anti-join the blocklist hash-partitioned on
    text_hash, so the driver never materializes a corpus-proportional
    set. Output: doc_id, text_hash for surviving docs.
    """
    import ray

    def blocklist(batch: pa.Table) -> pa.Table:
        import numpy as np
        # select the 1/MODULUS benchmark rows FIRST — fingerprinting
        # (regex normalize + md5) on the other 98% would be thrown away
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = fingerprint_batch(batch.filter(
            pa.array(ids % DECONTAM_MODULUS == 0)))
        # per-batch distinct: the exchange/broadcast moves unique hashes
        return pa.table({"bench_hash": pc.unique(t["text_hash"])})

    # the benchmark side is filtered DISTRIBUTED; materialized because
    # the size gate AND the chosen path both consume it
    bench = ds.map_batches(blocklist, batch_format="pyarrow").materialize()

    if bench.count() <= broadcast_max_hashes:
        ref = ray.put(pa.array(
            sorted({r["bench_hash"] for r in bench.take_all()}), pa.string()))

        def drop_contaminated(batch: pa.Table) -> pa.Table:
            bl = ray.get(ref)
            t = fingerprint_batch(batch)
            return t.filter(pc.invert(pc.is_in(t["text_hash"], value_set=bl)))

        return ds.map_batches(drop_contaminated, batch_format="pyarrow")

    # at-scale path: hash-partitioned anti-join on text_hash. Right-side
    # duplicate hashes only multiply rows that are dropped anyway.
    cpus = int(ray.cluster_resources().get("CPU", 4))
    marked = bench.map_batches(
        lambda b: pa.table({"bench_hash": b["bench_hash"],
                            "_m": pa.array([1] * len(b), pa.int8())}),
        batch_format="pyarrow")
    fps = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    j = fps.join(marked, "left_outer", num_partitions=max(2, cpus // 2),
                 on=("text_hash",), right_on=("bench_hash",))

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_null(batch["_m"]))
        return pa.table({"doc_id": t["doc_id"], "text_hash": t["text_hash"]})

    return j.map_batches(keep_unmatched, batch_format="pyarrow")


DECONTAM_NGRAM_TOKENS = 13  # the published n-gram-overlap window


def _ngram_hashes(norm: str, n: int) -> set[str]:
    """Distinct md5 hex hashes of a doc's n-token shingles; a doc
    shorter than n tokens contributes its whole token stream as one
    shingle (mirrors dedup._shingles / the SQL slice idiom)."""
    tk = norm.split(" ")
    if len(tk) <= n:
        grams = [" ".join(tk)]
    else:
        grams = [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]
    return {hashlib.md5(g.encode()).hexdigest() for g in grams}


def decontaminate_ngram(ds, broadcast_max_shingles: int = DECONTAM_BROADCAST_MAX,
                        broadcast_max_drops: int = DECONTAM_BROADCAST_MAX):
    """N-gram-overlap benchmark decontamination (the published 13-gram
    method): drop every document sharing at least one
    ``DECONTAM_NGRAM_TOKENS``-token shingle with a benchmark document
    — strictly stronger than ``decontaminate``'s whole-prefix
    fingerprint (partial inclusions of benchmark text are caught).
    Output: doc_id survivors.

    Size-gated like every anti-join in the engine: the benchmark
    shingle-hash set broadcasts below the gate (real benchmark suites
    are a few million shingles, static); above it, corpus shingle rows
    inner-join the benchmark set hash-partitioned on the shingle hash
    and the distinct contaminated doc_ids anti-join the corpus through
    the shared ``_keep_ids_except``. Hex md5 strings keep both paths
    simple at sandbox scale; at 100 TB ship the two int64 md5 halves
    instead (the identity ``dedup._shingle_hash_rows`` already uses)
    to halve exchange bytes. Benchmark-side distinct is per batch —
    residual duplicates across blocks only multiply rows that are
    dropped anyway.
    """
    import numpy as np
    import ray

    from .dedup import _keep_ids_except, _norm

    n = DECONTAM_NGRAM_TOKENS

    def bench_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(ids % DECONTAM_MODULUS == 0))
        out: set[str] = set()
        for s in _norm(sel["text"]):
            out |= _ngram_hashes(s, n)
        return pa.table({"h": pa.array(sorted(out), pa.string())})

    bench = ds.map_batches(bench_shingles, batch_format="pyarrow").materialize()

    if bench.count() <= broadcast_max_shingles:
        ref = ray.put(pa.array(
            sorted({r["h"] for r in bench.take_all()}), pa.string()))

        def survivors(batch: pa.Table) -> pa.Table:
            bl = ray.get(ref)
            idx: list[int] = []
            hs: list[str] = []
            for k, s in enumerate(_norm(batch["text"])):
                g = _ngram_hashes(s, n)
                idx.extend([k] * len(g))
                hs.extend(g)
            hit = pc.is_in(pa.array(hs, pa.string()), value_set=bl) \
                .to_numpy(zero_copy_only=False)
            bad = np.zeros(len(batch), dtype=bool)
            bad[np.asarray(idx, dtype=np.int64)[hit]] = True
            return pa.table({"doc_id": batch["doc_id"]}) \
                .filter(pa.array(~bad, pa.bool_()))

        return ds.map_batches(survivors, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 4))

    def corpus_shingles(batch: pa.Table) -> pa.Table:
        out_d: list[int] = []
        out_h: list[str] = []
        for d, s in zip(batch["doc_id"].to_pylist(), _norm(batch["text"])):
            g = _ngram_hashes(s, n)
            out_d.extend([d] * len(g))
            out_h.extend(g)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "h": pa.array(out_h, pa.string())})

    rows = ds.map_batches(corpus_shingles, batch_format="pyarrow")
    marked = bench.map_batches(
        lambda b: pa.table({"h": b["h"],
                            "_m": pa.array([1] * len(b), pa.int8())}),
        batch_format="pyarrow")
    j = rows.join(marked, "inner", num_partitions=max(2, cpus // 2),
                  on=("h",))
    drops = j.map_batches(
        lambda b: pa.table({"drop_id": pc.unique(b["doc_id"])}),
        batch_format="pyarrow")
    return _keep_ids_except(ds, drops, broadcast_max_drops)


TOP_NGRAMS_K = 20
NGRAM_N = 2


def top_ngrams_batch(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL n-gram counts (one row per distinct n-gram per
    batch) so the global groupby moves distinct keys, not token
    streams."""
    from collections import Counter
    norm = norm_expr(batch["text"])
    counts: Counter = Counter()
    for s in norm.to_pylist():
        toks = s.split(" ") if s else []
        for i in range(len(toks) - NGRAM_N + 1):
            counts[" ".join(toks[i:i + NGRAM_N])] += 1
    return pa.table({"ngram": pa.array(list(counts.keys()), pa.string()),
                     "n": pa.array(list(counts.values()), pa.int64())})


def top_ngrams(ds, k: int = TOP_NGRAMS_K):
    """Global top-k token bigrams: per-batch partial counts →
    groupby-sum over distinct n-grams → tiny final top-k. Deterministic
    tie-break (count desc, ngram asc) matches the SQL oracle exactly at
    the k boundary.

    Scale note: the exchange moves each batch's DISTINCT bigrams —
    Zipf-bounded, far below the token stream, and the groupby is
    hash-uniform. If the 100-TB vocabulary still overwhelms the
    exchange, the standard degradation is lossy counting per batch
    (drop local count-1 tail) at a documented accuracy bound — the
    same sketch-over-exact trade ``functions.sketches`` makes for
    distinct counts."""
    import pandas as pd
    from ray.data.aggregate import Sum

    agg = ds.map_batches(top_ngrams_batch, batch_format="pyarrow") \
        .groupby("ngram").aggregate(Sum("n", alias_name="n"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "ngram"], ascending=[False, True]).head(k)

    # per-block partial top-k first: each distinct ngram appears once
    # after the aggregate, so top-k of per-block top-ks is exact and
    # the single partition never holds the whole vocabulary
    return agg.map_batches(final, batch_format="pandas") \
        .repartition(1).map_batches(final, batch_format="pandas")


HH_K = 30  # heavy-hitter bar: global token frequency > 1/HH_K


def _hh_tokens(batch: pa.Table) -> pa.Array:
    """The flat Arrow token stream of a batch (norm + single-space
    split), chunk-combined so value_counts sees one array."""
    toks = pc.list_flatten(pc.split_pattern(norm_expr(batch["text"]), " "))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def heavy_hitters(ds, k: int = HH_K):
    """EXACT corpus heavy hitters — tokens whose global count clears
    ``count * k > n_tokens`` (frequency strictly above 1/k) — via the
    two-pass candidate-generation + verify pattern, the exact-result
    counterpart of the lossy-counting degradation ``top_ngrams``
    documents for vocabularies that overwhelm a distinct-key exchange.

    Pass 1 (pigeonhole candidates): a token with global count > n/k
    must have batch count > n_b/k in at least one batch (else summing
    the per-batch bound gives count <= n/k), so each batch's LOCAL
    heavy hitters — at most k-1 tokens, since counts above n_b/k sum
    to <= n_b — form a superset of the true answer regardless of how
    rows landed in blocks. Each batch ships its candidates plus one
    token-total row: <= k rows per block, never the vocabulary.

    Pass 2 (exact verify): the bounded candidate union broadcasts
    once (``ray.put``), every batch recounts ONLY candidate tokens
    (Arrow ``is_in`` + ``value_counts``), and the bounded-key finish
    sums <= k rows per block. False candidates die on the exact
    integer filter, so the output is partitioning-independent and
    hash-exact against the SQL oracle. Output: (token,
    n_occurrences), sorted (count desc, token asc).

    CONTRACT: ``ds`` executes TWICE (candidates, then recount) and
    must re-execute deterministically — true for every registered
    caller (parquet reads + deterministic transforms). Feeding a
    nondeterministic dataset (an unseeded sample/shuffle) would recount
    a different corpus with no error; ``ds.materialize()`` first in
    that case."""
    import ray

    from .util import finish_grouped

    def pass1(batch: pa.Table) -> pa.Table:
        toks = _hh_tokens(batch)
        n_b = len(toks)
        vc = toks.value_counts()
        cnts = pc.cast(vc.field("counts"), pa.int64())
        cand = vc.field("values").filter(
            pc.greater(pc.multiply(cnts, pa.scalar(k, pa.int64())),
                       pa.scalar(n_b, pa.int64())))
        return pa.table({
            "token": pa.concat_arrays([cand, pa.array([""], pa.string())]),
            "cnt": pa.array([0] * len(cand) + [n_b], pa.int64()),
            "kind": pa.array([0] * len(cand) + [1], pa.int64()),
        })

    # bounded driver fold: <= k rows per BLOCK (not per row). The
    # finish_grouped fold first collapses the per-block rows to
    # (distinct candidate tokens + one total row) in ONE vectorized
    # partition, so take_all hands the driver a tiny folded table —
    # never block-count x k Python dicts (at a million blocks that
    # union is ~30M rows; the fold output stays vocabulary-bounded)
    folded = finish_grouped(
        ds.map_batches(pass1, batch_format="pyarrow", batch_size=None),
        ["token", "kind"]).take_all()
    n_total = sum(r["cnt"] for r in folded if r["kind"] == 1)
    cand_tokens = sorted(r["token"] for r in folded if r["kind"] == 0)
    cand_ref = ray.put(pa.array(cand_tokens, pa.string()))

    def pass2(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        toks = _hh_tokens(batch)
        toks = toks.filter(pc.is_in(toks, value_set=cand))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = toks.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n_occurrences": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = finish_grouped(
        ds.map_batches(pass2, batch_format="pyarrow", batch_size=None),
        ["token"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_occurrences"] * k > n_total]
        return df.sort_values(["n_occurrences", "token"],
                              ascending=[False, True]).reset_index(drop=True)

    return counts.map_batches(final, batch_format="pandas",
                              batch_size=None)


CHUNK_TOKENS = 64  # tokens per training/RAG context chunk


def token_chunks_batch(batch: pa.Table,
                       max_tokens: int = CHUNK_TOKENS) -> pa.Table:
    """Fixed-token-budget document chunking (sequence windowing for
    training data / RAG contexts): each doc's whitespace-token stream
    splits into consecutive windows of <= max_tokens. Doc-level and
    stateless — no cross-doc packing state, so chunks are reproducible
    under any partitioning. Output: doc_id, chunk_idx (0-based),
    n_tokens, chunk_text."""
    norm = norm_expr(batch["text"]).to_pylist()
    out_d, out_i, out_n, out_t = [], [], [], []
    for d, s in zip(batch["doc_id"].to_pylist(), norm):
        toks = s.split(" ")
        for ci in range(0, len(toks), max_tokens):
            window = toks[ci:ci + max_tokens]
            out_d.append(d)
            out_i.append(ci // max_tokens)
            out_n.append(len(window))
            out_t.append(" ".join(window))
    return pa.table({"doc_id": pa.array(out_d, batch["doc_id"].type),
                     "chunk_idx": pa.array(out_i, pa.int64()),
                     "n_tokens": pa.array(out_n, pa.int64()),
                     "chunk_text": pa.array(out_t, pa.string())})


PACK_BUDGET = 512   # tokens per packed training sequence
PACK_BUCKETS = 64   # packing scope: deterministic hash buckets


def _bucketed_chunk_meta(ds, num_buckets: int, chunk_tokens: int):
    """Chunk METADATA stream with the deterministic doc_id hash bucket
    (Knuth multiplicative so sequential ids spread): doc_id, chunk_idx,
    n_tokens, bucket. chunk_text is dropped before the bucket exchange
    — packing/sharding only fold token counts, so the shuffle ships
    ~32 B/chunk instead of the chunk text."""
    import numpy as np

    chunks = ds.map_batches(
        lambda b: token_chunks_batch(b, max_tokens=chunk_tokens),
        batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) \
            % num_buckets
        return pa.table({"doc_id": batch["doc_id"],
                         "chunk_idx": batch["chunk_idx"],
                         "n_tokens": batch["n_tokens"],
                         "bucket": pa.array(bucket.astype(np.int64))})

    return chunks.map_batches(add_bucket, batch_format="pyarrow")


def _pack_fold(df, budget: int):
    """The greedy running fold shared by ``pack_sequences`` and
    ``shard_manifest``: one bucket's chunk metadata (sorted here by
    (doc_id, chunk_idx)) → per-sequence rows ORDERED BY seq_idx.
    Output columns: bucket, seq_idx, n_chunks, n_tokens."""
    import numpy as np
    import pandas as pd

    df = df.sort_values(["doc_id", "chunk_idx"], kind="stable")
    toks = df["n_tokens"].to_numpy()
    seq_ids = np.empty(len(df), dtype=np.int64)
    seq = 0
    filled = 0
    for i, t in enumerate(toks):  # greedy running fold
        if filled + t > budget and filled:
            seq += 1
            filled = 0
        seq_ids[i] = seq
        filled += t
    g = pd.DataFrame({"bucket": df["bucket"].to_numpy(),
                      "seq_idx": seq_ids, "n_tokens": toks})
    agg = g.groupby(["bucket", "seq_idx"], as_index=False).agg(
        n_chunks=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
    agg["n_chunks"] = agg["n_chunks"].astype("int64")
    agg["n_tokens"] = agg["n_tokens"].astype("int64")
    return agg[["bucket", "seq_idx", "n_chunks", "n_tokens"]]


def _check_pack_params(chunk_tokens: int, budget: int) -> None:
    if chunk_tokens > budget:
        # the greedy fold admits a sequence's first chunk
        # unconditionally — an oversized chunk would silently break the
        # <= budget output contract
        raise ValueError(
            f"chunk_tokens ({chunk_tokens}) must be <= budget ({budget})")


def pack_sequences(ds, budget: int = PACK_BUDGET,
                   num_buckets: int = PACK_BUCKETS,
                   chunk_tokens: int = CHUNK_TOKENS):
    """Greedy sequence packing of token chunks into fixed-budget
    training sequences — the step after chunking when building LM
    batches. The packing fold is a running state machine (sequence
    resets when the budget would overflow); its SQL oracle replicates
    it as a per-bucket WITH RECURSIVE walk (``__ray_entry__``).

    Determinism without a global order: chunks hash into
    ``num_buckets`` doc_id buckets and each bucket packs its own
    chunks in (doc_id, chunk_idx) order — one vectorized-ish fold per
    bucket, any partitioning of the input yields identical sequences.
    At scale the bucket is the partition key; sequences never span
    buckets. Output: bucket, seq_idx, n_chunks, n_tokens (sum of
    chunk tokens in the sequence, <= budget).
    """
    _check_pack_params(chunk_tokens, budget)
    return _bucketed_chunk_meta(ds, num_buckets, chunk_tokens) \
        .groupby("bucket").map_groups(lambda df: _pack_fold(df, budget),
                                      batch_format="pandas")


SHARD_BUDGET = 8192  # tokens per training shard (16 packed sequences)


def shard_manifest(ds, shard_budget: int = SHARD_BUDGET,
                   budget: int = PACK_BUDGET,
                   num_buckets: int = PACK_BUCKETS,
                   chunk_tokens: int = CHUNK_TOKENS):
    """Token-budget shard manifest over the packed-sequence stream —
    the writer-planning step after ``pack_sequences``: lay the
    sequences out in global (bucket, seq_idx) order and assign each to
    the shard its starting token offset falls in
    (``shard_id = prev_cum_tokens // shard_budget``) — contiguous
    token ranges, the layout a resumable shard writer produces.
    Output: shard_id, n_seqs, shard_tokens.

    The global prefix sum never sorts globally: per-bucket token
    totals (``num_buckets`` rows — a constant) fold to the driver,
    the bucket-prefix offsets broadcast back, and each bucket assigns
    its own sequences vectorized (local cumsum + bucket offset) —
    the same two-pass range-rank shape as ``interleave_plan``. The
    chunk-metadata stream (32 B/chunk, no text) materializes once and
    feeds both passes. The manifest itself is metadata, not data: one
    row per ~``shard_budget`` tokens, so the single-block finish holds
    whenever the shard budget is sized sanely (10^14 corpus tokens at
    10^8-token shards = 10^6 rows).
    """
    import numpy as np
    import pandas as pd
    import ray

    from .util import finish_grouped

    _check_pack_params(chunk_tokens, budget)
    meta = _bucketed_chunk_meta(ds, num_buckets, chunk_tokens).materialize()

    # pass 1: per-bucket token totals -> prefix offsets in bucket order
    # (a bucket's packed-sequence tokens sum to its chunk tokens, so
    # the totals fold over chunk metadata without packing first)
    def bucket_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "bucket": batch["bucket"].to_numpy(zero_copy_only=False),
            "tok": batch["n_tokens"].to_numpy(zero_copy_only=False)})
        return table_from_pandas(
            df.groupby("bucket", as_index=False)["tok"].sum())

    totals: dict[int, int] = {}
    for r in meta.map_batches(bucket_partial,
                              batch_format="pyarrow").take_all():
        totals[r["bucket"]] = totals.get(r["bucket"], 0) + r["tok"]
    offsets: dict[int, int] = {}
    run = 0
    for b in sorted(totals):
        offsets[b] = run
        run += totals[b]
    off_ref = ray.put(offsets)

    # pass 2: pack each bucket, local cumsum + bucket offset -> shard
    # partials (a shard can span adjacent buckets, hence the finish)
    def pack_and_assign(df: pd.DataFrame) -> pd.DataFrame:
        packs = _pack_fold(df, budget)  # ordered by seq_idx
        toks = packs["n_tokens"].to_numpy(dtype=np.int64)
        start = ray.get(off_ref)[int(packs["bucket"].iloc[0])]
        prev_cum = start + np.concatenate(([0], np.cumsum(toks)[:-1]))
        g = pd.DataFrame({"shard_id": prev_cum // shard_budget,
                          "tok": toks})
        agg = g.groupby("shard_id", as_index=False).agg(
            n_seqs=("tok", "size"), shard_tokens=("tok", "sum"))
        agg["shard_id"] = agg["shard_id"].astype("int64")
        agg["n_seqs"] = agg["n_seqs"].astype("int64")
        agg["shard_tokens"] = agg["shard_tokens"].astype("int64")
        return agg[["shard_id", "n_seqs", "shard_tokens"]]

    partials = meta.groupby("bucket").map_groups(
        pack_and_assign, batch_format="pandas")
    return finish_grouped(partials, ["shard_id"],
                          {"n_seqs": "sum", "shard_tokens": "sum"})


QUANTILES = (0.5, 0.9, 0.99)


def length_quantiles(ds):
    """Per-source EXACT discrete quantiles of document length
    (p50/p90/p99 as sorted[ceil(q*n)-1], matching DuckDB
    quantile_disc) — exact at ANY scale, no sketch needed: lengths are
    small integers, so per-batch (source, n_chars) partial HISTOGRAMS
    pre-aggregate before a bounded-key groupby (keys <= sources x
    distinct lengths, regardless of corpus size), and each quantile is
    the smallest length whose cumulative count reaches ceil(q*n) —
    identical to indexing the sorted values. The driver only ever sees
    the merged histogram, never a lengths column.
    """
    import math

    import numpy as np
    import ray.data as rd
    from collections import Counter
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        c = Counter(zip(batch["source"].to_pylist(), lens.tolist()))
        return pa.table({
            "source": pa.array([k[0] for k in c], pa.string()),
            "n_chars": pa.array([k[1] for k in c], pa.int64()),
            "cnt": pa.array([int(v) for v in c.values()], pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "n_chars"]).aggregate(Sum("cnt", alias_name="cnt"))

    import pandas as pd
    rows = hist.take_all()
    if not rows:  # empty input -> empty result, not a KeyError
        return rd.from_arrow(pa.table({
            "source": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            **{f"p{int(q * 100)}": pa.array([], pa.int64())
               for q in QUANTILES}}))
    df = pd.DataFrame(rows).sort_values(["source", "n_chars"])
    out: dict[str, list] = {"source": [], "n": [],
                            **{f"p{int(q * 100)}": [] for q in QUANTILES}}
    for src, g in df.groupby("source", sort=True):
        n = int(g["cnt"].sum())
        cum = g["cnt"].cumsum().to_numpy()
        lens = g["n_chars"].to_numpy()
        out["source"].append(src)
        out["n"].append(n)
        for q in QUANTILES:
            k = max(1, math.ceil(q * n))
            out[f"p{int(q * 100)}"].append(int(lens[int(np.searchsorted(cum, k))]))
    return rd.from_arrow(pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        **{f"p{int(q * 100)}": pa.array(out[f"p{int(q * 100)}"], pa.int64())
           for q in QUANTILES}}))


TOP_TERMS_K = 3
TOP_TERMS_BROADCAST_MAX_VOCAB = 1_000_000


def _doc_term_rows(batch: pa.Table) -> pa.Table:
    """Flatten a batch to (doc_id, token, tf) rows. Docs are whole
    within a batch, so per-doc term frequencies are exact here and the
    downstream exchange (if any) carries one row per DISTINCT term per
    doc, never the raw token stream."""
    from collections import Counter
    doc_ids, toks, tfs = [], [], []
    for did, s in zip(batch["doc_id"].to_pylist(),
                      norm_expr(batch["text"]).to_pylist()):
        for t, c in Counter(s.split(" ")).items():
            doc_ids.append(did)
            toks.append(t)
            tfs.append(c)
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                     "token": pa.array(toks, pa.string()),
                     "tf": pa.array(tfs, pa.int64())})


def top_terms_per_doc(ds, k: int = TOP_TERMS_K,
                      broadcast_max_vocab: int = TOP_TERMS_BROADCAST_MAX_VOCAB,
                      num_buckets: int = 32):
    """Per-document top-k terms, tf-idf style: order by (tf DESC,
    df ASC, token ASC) — highest in-document frequency first, rarest
    corpus-wide term breaking ties. The order is ALL-INTEGER by design:
    the float score tf*ln(N/df) is not oracle-safe because ln() differs
    by 1 ulp between numpy and DuckDB (measured), and the driver gate
    hashes values exactly.

    Size-gated like the other dual-path ops: when the vocabulary fits
    ``broadcast_max_vocab`` the (token -> df) map is ``ray.put`` ONCE
    and every batch ranks locally — zero exchange beyond the tiny df
    fold (vocabulary is Zipf-bounded, not corpus-proportional). Above
    the gate: (doc_id, token, tf) rows hash-join the df table on token,
    then fold per doc-hash bucket (vectorized sort + groupby-head per
    ~1M-row bucket — never a per-doc map_groups)."""
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    # document frequencies via the same partial doc_freq uses; a real
    # exchange (not the bounded-key single-block fold) because token
    # cardinality is corpus-derived, not a small enum
    dfds = ds.map_batches(doc_freq_batch, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df")) \
        .materialize()

    if dfds.count() <= broadcast_max_vocab:
        dfmap_ref = ray.put({r["token"]: int(r["df"]) for r in dfds.take_all()})

        def topk_batch(batch: pa.Table) -> pa.Table:
            dfmap = ray.get(dfmap_ref)
            out = {"doc_id": [], "token": [], "tf": [], "df": [],
                   "term_rank": []}
            for did, s in zip(batch["doc_id"].to_pylist(),
                              norm_expr(batch["text"]).to_pylist()):
                c = Counter(s.split(" "))
                ranked = sorted(c.items(),
                                key=lambda kv: (-kv[1], dfmap[kv[0]], kv[0]))[:k]
                for r, (t, tf) in enumerate(ranked, 1):
                    out["doc_id"].append(did)
                    out["token"].append(t)
                    out["tf"].append(tf)
                    out["df"].append(dfmap[t])
                    out["term_rank"].append(r)
            return pa.table({
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "token": pa.array(out["token"], pa.string()),
                "tf": pa.array(out["tf"], pa.int64()),
                "df": pa.array(out["df"], pa.int64()),
                "term_rank": pa.array(out["term_rank"], pa.int64())})

        return ds.map_batches(topk_batch, batch_format="pyarrow")

    # at-scale path: term rows materialize ONCE (they feed the join's
    # left side; df was already derived from the same pass shape), join
    # df on token, then rank per doc-hash bucket — vectorized
    # sort + groupby-head per ~1M-row bucket, never a per-doc group call
    cpus = int(ray.cluster_resources().get("CPU", 4))
    tok = ds.map_batches(_doc_term_rows, batch_format="pyarrow").materialize()
    j = tok.join(dfds, "inner", num_partitions=max(2, cpus // 2),
                 on=("token",))

    def add_bucket(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((did * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) % num_buckets
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tf", "df", "token"],
                          ascending=[True, False, True, True],
                          kind="stable")
        g = g.groupby("doc_id", sort=False).head(k).copy()
        g["term_rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1) \
            .astype("int64")
        return g[["doc_id", "token", "tf", "df", "term_rank"]]

    return j.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(rank_group, batch_format="pandas")


# Gopher-style quality gate: first-failing-rule precedence, thresholds
# in the same integer e6 units as repetition_stats so the SQL twin is
# a CASE over the identical expressions
QUALITY_GATE_MIN_TOKENS = 24
QUALITY_GATE_MAX_TOKENS = 4096
QUALITY_GATE_MAX_DUP_E6 = 650_000
QUALITY_GATE_MAX_TOP_E6 = 250_000


def quality_gate_batch(batch: pa.Table) -> pa.Table:
    """Composable corpus-cleaning gate (the Gopher-rules filter shape):
    per doc, evaluate ordered rules over the repetition_stats features
    and emit keep (0/1) plus the FIRST failing rule as a reason code —
    the report a filtering run ships alongside the kept corpus.
    Doc-local and stateless; the SQL oracle is a CASE chain over the
    same integer expressions (rule order == CASE order)."""
    import numpy as np

    rep = repetition_stats_batch(batch)
    n = rep["n_tokens"].to_numpy(zero_copy_only=False)
    dup = rep["dup_token_frac_e6"].to_numpy(zero_copy_only=False)
    top = rep["top_token_frac_e6"].to_numpy(zero_copy_only=False)
    reason = np.full(len(n), "pass", dtype=object)
    # assign in REVERSE precedence so earlier rules overwrite later ones
    reason[top > QUALITY_GATE_MAX_TOP_E6] = "top_token"
    reason[dup > QUALITY_GATE_MAX_DUP_E6] = "repetitive"
    reason[n > QUALITY_GATE_MAX_TOKENS] = "too_long"
    reason[n < QUALITY_GATE_MIN_TOKENS] = "too_short"
    return pa.table({
        "doc_id": rep["doc_id"],
        "n_tokens": rep["n_tokens"],
        "keep": pa.array((reason == "pass").astype(np.int64), pa.int64()),
        "reason": pa.array(reason, pa.string()),
    })


def source_mix(ds):
    """Per (source, lang) corpus-mixture report: docs, split-token
    mass, and each cell's e6 share of the total token mass — the table
    a training-mix planner consumes (and the input interleave_plan's
    weights would come from). Per-batch partials over bounded keys
    (sources x langs), one coalesced fold, then the share column from
    the fold's own totals — no extra pass, no shuffle."""
    import numpy as np

    from .util import finish_grouped, round_half_away_e, table_from_pandas

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        norm = norm_expr(batch["text"])
        # collapsed single spaces: tokens == spaces + 1 (empty norm ->
        # [''] -> 1, same as SQL len(string_split(norm, ' ')))
        toks = pc.add(pc.count_substring(norm, " "), 1)
        df = pd.DataFrame({
            "source": batch["source"].to_pylist(),
            "lang": batch["lang"].to_pylist(),
            "n_tokens": toks.to_numpy(zero_copy_only=False).astype("int64")})
        agg = df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return table_from_pandas(agg)

    folded = finish_grouped(ds.map_batches(partial, batch_format="pyarrow"),
                            ["source", "lang"])

    def add_share(df):
        if not len(df):
            df["token_share_e6"] = df.get("n_tokens")
            return df
        total = float(df["n_tokens"].sum())
        df = df.copy()
        # multiply-first: round(1e6 * part / total), oracle operand order
        df["token_share_e6"] = round_half_away_e(
            1e6 * df["n_tokens"].to_numpy(np.float64) / total, scale=1.0)
        return df

    return folded.map_batches(add_share, batch_format="pandas",
                              batch_size=None)


def cross_split_contamination(ds,
                              broadcast_max_hashes: int = DECONTAM_BROADCAST_MAX):
    """Train→eval leakage report: for every val/test document, whether
    its content fingerprint also appears in the train split — the
    check a training run ships before trusting its held-out numbers
    (split assignment per ``dataset_split_batch``, fingerprint per
    ``fingerprint_batch``; both reused verbatim so this composes the
    two hash-green contracts).

    Output: doc_id, split ('val'/'test'), contaminated (0/1).

    Size-gated like every membership test in the engine: up to
    ``broadcast_max_hashes`` distinct train fingerprints the set
    broadcasts (``ray.put`` once, ``pc.is_in`` per batch); above it
    eval fingerprints left-join the train hash set hash-partitioned
    on text_hash — the driver never holds a corpus-proportional set.
    """
    import ray

    def split_fp(batch: pa.Table) -> pa.Table:
        sp = dataset_split_batch(batch)
        fp = fingerprint_batch(batch)
        return pa.table({"doc_id": batch["doc_id"],
                         "split": sp["split"],
                         "text_hash": fp["text_hash"]})

    both = ds.map_batches(split_fp, batch_format="pyarrow")

    def train_hashes(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["split"], "train"))
        return pa.table({"train_hash": pc.unique(t["text_hash"])})

    # materialized: the size gate and the chosen path both consume it
    train = both.map_batches(train_hashes, batch_format="pyarrow").materialize()

    def eval_side(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["split"], "train"))

    evals = both.map_batches(eval_side, batch_format="pyarrow")

    if train.count() <= broadcast_max_hashes:
        ref = ray.put(pa.array(
            sorted({r["train_hash"] for r in train.take_all()}), pa.string()))

        def mark(batch: pa.Table) -> pa.Table:
            bl = ray.get(ref)
            hit = pc.is_in(batch["text_hash"], value_set=bl)
            return pa.table({"doc_id": batch["doc_id"],
                             "split": batch["split"],
                             "contaminated": pc.cast(hit, pa.int64())})

        return evals.map_batches(mark, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 4))
    # GLOBAL distinct before the join: unlike decontaminate (matches
    # dropped), matches are KEPT here — a residual duplicate right key
    # would duplicate eval rows. One groupby exchange, join-path only.
    from ray.data.aggregate import Count
    distinct = train.groupby("train_hash").aggregate(Count())
    marked = distinct.map_batches(
        lambda b: pa.table({"train_hash": b["train_hash"],
                            "_m": pa.array([1] * len(b), pa.int8())}),
        batch_format="pyarrow")
    j = evals.join(marked, "left_outer", num_partitions=max(2, cpus // 2),
                   on=("text_hash",), right_on=("train_hash",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "split": batch["split"],
                         "contaminated": pc.cast(
                             pc.is_valid(batch["_m"]), pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# weighted sampling + inverted index (r4)
# ---------------------------------------------------------------------------

WEIGHTED_SALT = "wsample-v1"
WEIGHTED_TOKEN_CAP = 2000      # weight saturates at this many tokens
WEIGHTED_PPM_PER_TOKEN = 3000  # keep-probability slope (ppm per token)


def weighted_sample_batch(batch: pa.Table) -> pa.Table:
    """Length-WEIGHTED deterministic sampling: keep a doc with
    probability proportional to its token count (capped) — the
    importance-sampling primitive for token-budget curation (long docs
    carry more tokens per kept row). Keep iff
    ``md5(doc_id#salt) % 1e6 < min(min(n_tokens, CAP) * PPM, 1e6)``.
    Hash sampling, not RNG: identical under re-runs, repartitioning
    and corpus growth; doc-local, so the operator is one streaming
    pass with no exchange."""
    norm = norm_expr(batch["text"])
    n_tokens = pc.cast(pc.count_substring_regex(norm, TOKEN_RE),
                       pa.int64()).to_pylist()
    ids = batch["doc_id"].to_pylist()
    thresh = [min(min(n, WEIGHTED_TOKEN_CAP) * WEIGHTED_PPM_PER_TOKEN,
                  1_000_000) for n in n_tokens]
    keep = [int.from_bytes(
        hashlib.md5(f"{i}#{WEIGHTED_SALT}".encode()).digest()[:8],
        "big") % 1_000_000 < t for i, t in zip(ids, thresh)]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "keep_threshold_ppm": pa.array(thresh, pa.int64()),
    }).filter(pa.array(keep, pa.bool_()))


POSTINGS_HEAD_K = 16
POSTINGS_ROWS_PER_BUCKET = 4_000_000  # (token, partial) rows per bucket


def postings(ds, n_docs: int | None = None, head_k: int = POSTINGS_HEAD_K,
             num_buckets: int | None = None):
    """Inverted-index build: token -> (exact document frequency, the
    first ``head_k`` doc_ids of its posting list) — the search-index /
    lookup primitive with the BOUNDED-exchange index shape: full
    posting lists of Zipf-head tokens are corpus-sized and must never
    ship, so the operator keeps an exact mergeable HEAD instead.

    Shape at scale: each batch folds its docs to ONE row per distinct
    token — (partial df, the batch's first ``head_k`` sorted doc_ids)
    — so the exchange carries vocab x blocks rows of fixed width,
    never the token stream. Docs are whole within a batch, so partial
    dfs are disjoint counts (sum is exact) and head merge is an exact
    min-K merge. Rows hash by TOKEN into buckets, co-locating every
    partial of a token; the per-token merge in the fold is bounded by
    vocabulary (Zipf), not corpus size. At a single bucket the hash
    exchange is pure overhead (~2-3 s fixed, CLAUDE.md invariant), so
    that case folds on one coalesced block instead — same ``fold``,
    same result, tested by the bucket-invariance test.
    """
    import pandas as pd

    if num_buckets is None:
        num_buckets = max(1, (n_docs or 0) * 40 // POSTINGS_ROWS_PER_BUCKET)

    def pair_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter, defaultdict
        dfs: Counter = Counter()
        heads: defaultdict = defaultdict(list)
        for i, s in zip(batch["doc_id"].to_pylist(),
                        norm_expr(batch["text"]).to_pylist()):
            for t in set(s.split(" ")):
                dfs[t] += 1
                heads[t].append(i)
        tokens = sorted(dfs)
        return pa.table({
            "bucket": pa.array(
                [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                 % num_buckets for t in tokens], pa.int64()),
            "token": pa.array(tokens, pa.string()),
            "df_part": pa.array([dfs[t] for t in tokens], pa.int64()),
            "head": pa.array([",".join(map(str, sorted(heads[t])[:head_k]))
                              for t in tokens], pa.string()),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        toks, dfs_out, posts = [], [], []
        for tok, grp in df.groupby("token", sort=True):
            ids = sorted(int(x) for s in grp["head"] for x in s.split(",")
                         if x != "")[:head_k]
            toks.append(tok)
            dfs_out.append(int(grp["df_part"].sum()))
            posts.append(",".join(map(str, ids)))
        return pd.DataFrame({"token": pd.Series(toks, dtype="object"),
                             "df": pd.Series(dfs_out, dtype="int64"),
                             "posting": pd.Series(posts, dtype="object")})

    partials = ds.map_batches(pair_partial, batch_format="pyarrow")
    if num_buckets == 1:
        return partials.repartition(1).map_batches(
            fold, batch_format="pandas", batch_size=None)
    return partials.groupby("bucket").map_groups(fold, batch_format="pandas")


PMI_MIN_COUNT = 5
PMI_TOP_K = 20
# exact-integer PMI needs c_xy * n_uni^2 * 1e6 to fit a 128-bit
# HUGEINT on the SQL side: guard the corpus token count accordingly
PMI_MAX_TOKENS = 1 << 35


PMI_DRIVER_FOLD_MAX_DOCS = 200_000


def pmi_bigrams(ds, min_count: int = PMI_MIN_COUNT, k: int = PMI_TOP_K,
                broadcast_max_vocab: int = TOP_TERMS_BROADCAST_MAX_VOCAB,
                n_docs: int | None = None,
                driver_fold_max_docs: int = PMI_DRIVER_FOLD_MAX_DOCS):
    """Collocation mining: top-k bigrams by pointwise mutual
    information, with an ALL-INTEGER score so the DuckDB oracle hashes
    identically — ``pmi_e6 = c_xy * N_uni^2 * 1e6 // (N_pairs * c_x *
    c_y)`` (the monotone integer image of p(xy)/(p(x)p(y)); log() is
    monotone, and transcendentals are not oracle-safe — see
    top_terms_per_doc).

    Shape at scale: bigram and unigram counts pre-aggregate per batch
    (Zipf-bounded vocab keys through the exchange, never the token
    stream), the support threshold ``min_count`` prunes the candidate
    set BEFORE any scoring, unigram counts attach broadcast below
    ``broadcast_max_vocab`` distinct tokens and via two hash joins on
    the token columns above it, and scoring + partial top-k run
    per block with Python-int exactness (candidates are
    support-bounded, not corpus-bounded). Guard: exact 128-bit scoring
    holds to ~``PMI_MAX_TOKENS`` corpus tokens; beyond that shard the
    corpus or switch to float scoring (documented loudly, not silent).
    """
    from collections import Counter

    import pandas as pd
    from ray.data.aggregate import Sum

    def uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in norm_expr(batch["text"]).to_pylist():
            c.update(s.split(" "))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    def bi_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in norm_expr(batch["text"]).to_pylist():
            toks = s.split(" ")
            c.update(zip(toks, toks[1:]))
        return pa.table({
            "token_a": pa.array([t[0] for t in c], pa.string()),
            "token_b": pa.array([t[1] for t in c], pa.string()),
            "c_xy": pa.array(list(c.values()), pa.int64())})

    # materialize the POST-AGGREGATE count tables (bounded by vocab /
    # Zipf, never corpus-sized): totals, vocab gate and candidate
    # filter each consume them, and a lazy Dataset would re-run the
    # corpus pass per consumer. Below the doc gate the bounded-key
    # partials fold on one block (finish_grouped) — two hash-aggregate
    # exchanges are ~2-3 s of pure fixed cost there (CLAUDE.md
    # invariant); above it the exchanges are the correct shape.
    from .util import finish_grouped
    if n_docs is not None and n_docs <= driver_fold_max_docs:
        uni = finish_grouped(
            ds.map_batches(uni_partial, batch_format="pyarrow"),
            ["token"]).materialize()
        bi = finish_grouped(
            ds.map_batches(bi_partial, batch_format="pyarrow"),
            ["token_a", "token_b"]).materialize()
    else:
        uni = ds.map_batches(uni_partial, batch_format="pyarrow") \
            .groupby("token").aggregate(Sum("c", alias_name="c")).materialize()
        bi = ds.map_batches(bi_partial, batch_format="pyarrow") \
            .groupby(["token_a", "token_b"]) \
            .aggregate(Sum("c_xy", alias_name="c_xy")).materialize()

    # exact totals from the count tables themselves (tiny partials)
    def total(ds_counts, col):
        import ray.data  # noqa: F401
        t = ds_counts.map_batches(
            lambda b: pa.table({"k": pa.array([0], pa.int64()),
                                "n": pa.array([pc.sum(b[col]).as_py() or 0],
                                              pa.int64())}),
            batch_format="pyarrow")
        from .util import finish_grouped
        rows = finish_grouped(t, ["k"]).take_all()
        return rows[0]["n"] if rows else 0

    n_uni = total(uni, "c")
    n_pairs = total(bi, "c_xy")
    if n_uni >= PMI_MAX_TOKENS:
        raise ValueError(
            f"pmi_bigrams exact-integer scoring holds only below "
            f"{PMI_MAX_TOKENS} corpus tokens (got {n_uni}); shard the "
            f"corpus or use a float-scored variant")

    cand = bi.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c_xy"], min_count)),
        batch_format="pyarrow")

    def score_rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "token_a": pd.Series([], dtype="object"),
                "token_b": pd.Series([], dtype="object"),
                "c_xy": pd.Series([], dtype="int64"),
                "c_x": pd.Series([], dtype="int64"),
                "c_y": pd.Series([], dtype="int64"),
                "pmi_e6": pd.Series([], dtype="int64")})
        df = df.copy()
        df["pmi_e6"] = [
            (int(cxy) * n_uni * n_uni * 1_000_000)
            // (n_pairs * int(cx) * int(cy))
            for cxy, cx, cy in zip(df["c_xy"], df["c_x"], df["c_y"])]
        df["pmi_e6"] = df["pmi_e6"].astype("int64")
        return df.sort_values(["pmi_e6", "token_a", "token_b"],
                              ascending=[False, True, True]).head(k)[
            ["token_a", "token_b", "c_xy", "c_x", "c_y", "pmi_e6"]]

    import ray

    # vocab size via the unigram table's own row count proxy: counts
    # are one row per token, so a cheap block-count partial suffices
    n_vocab = total(uni.map_batches(
        lambda b: pa.table({"c": pa.array([len(b)], pa.int64())}),
        batch_format="pyarrow"), "c")

    if n_vocab <= broadcast_max_vocab:
        lk = {r["token"]: r["c"] for r in uni.take_all()}
        ref = ray.put(lk)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            df = df.copy()
            df["c_x"] = df["token_a"].map(m).astype("int64")
            df["c_y"] = df["token_b"].map(m).astype("int64")
            return score_rank(df)

        return cand.map_batches(attach, batch_format="pandas") \
            .repartition(1).map_batches(score_rank, batch_format="pandas",
                                        batch_size=None)

    # at-scale path: two hash joins attach c_x / c_y, then the same
    # per-block score + partial top-k
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, cpus // 2)
    ux = uni.map_batches(lambda b: pa.table({"tok_x": b["token"], "c_x": b["c"]}),
                         batch_format="pyarrow")
    uy = uni.map_batches(lambda b: pa.table({"tok_y": b["token"], "c_y": b["c"]}),
                         batch_format="pyarrow")
    j = cand.join(ux, "inner", num_partitions=nparts,
                  on=("token_a",), right_on=("tok_x",)) \
        .join(uy, "inner", num_partitions=nparts,
              on=("token_b",), right_on=("tok_y",))
    return j.map_batches(score_rank, batch_format="pandas") \
        .repartition(1).map_batches(score_rank, batch_format="pandas",
                                    batch_size=None)


VOCAB_GROWTH_BUCKETS = 20  # curve resolution — semantic, never auto-sized


def vocab_growth(ds, n_ids: int, num_buckets: int = VOCAB_GROWTH_BUCKETS):
    """Heaps-law vocabulary-growth curve: distinct tokens by FIRST
    doc_id of appearance, bucketed into ``num_buckets`` equal doc_id
    ranges, with the running cumulative vocabulary size.

    Output: bucket, bucket_start_id, new_tokens, cum_vocab (all int64;
    buckets where no token first appears emit no row, matching the SQL
    groupby).

    At-scale shape: per-batch partial (token → min doc_id within the
    batch; docs are whole within a batch so the partial is exact) →
    ``groupby(token).aggregate(Min)`` — the same vocabulary-key
    exchange as ``doc_freq`` — → per-block bucket counts → bounded
    ``num_buckets``-row finish + one cumsum. ``n_ids`` (= max doc_id
    + 1) comes from parquet footer statistics on the caller side
    (``util.parquet_column_max``), so the bucket width is
    metadata-priced on both the engine and SQL-oracle sides.
    """
    from ray.data.aggregate import Min

    from .util import finish_grouped

    width = -(-n_ids // num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        first: dict = {}
        ids = batch["doc_id"].to_pylist()
        for did, s in zip(ids, norm_expr(batch["text"]).to_pylist()):
            for t in set(s.split(" ")):
                prev = first.get(t)
                if prev is None or did < prev:
                    first[t] = did
        return pa.table({
            "token": pa.array(list(first.keys()), pa.string()),
            "first_doc": pa.array(list(first.values()), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Min("first_doc", alias_name="first_doc"))

    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.divide(batch["first_doc"], width), pa.int64())
        return pa.table({"bucket": b}).group_by("bucket") \
            .aggregate([("bucket", "count")]) \
            .rename_columns(["bucket", "new_tokens"])

    folded = finish_grouped(
        agg.map_batches(bucket_partial, batch_format="pyarrow"), ["bucket"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket").reset_index(drop=True)
        df["bucket"] = df["bucket"].astype("int64")
        df["bucket_start_id"] = (df["bucket"] * width).astype("int64")
        df["new_tokens"] = df["new_tokens"].astype("int64")
        df["cum_vocab"] = df["new_tokens"].cumsum().astype("int64")
        return df[["bucket", "bucket_start_id", "new_tokens", "cum_vocab"]]

    return folded.map_batches(final, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# per-doc shingle novelty (incremental-diversity curation signal)
# ---------------------------------------------------------------------------

NOVELTY_ROWS_PER_BUCKET = 4_000_000   # (h0, h1, doc) rows per hash bucket
NOVELTY_DRIVER_MERGE_MAX_DOCS = 1_000_000


def doc_novelty(ds, n_docs: int | None = None,
                num_buckets: int | None = None,
                driver_merge_max_docs: int = NOVELTY_DRIVER_MERGE_MAX_DOCS):
    """Per-document shingle NOVELTY: of a doc's distinct
    ``dedup.SHINGLE_TOKENS``-token shingles, how many occur in NO
    earlier document (global first occurrence attributed to the
    minimum doc_id — the deterministic stand-in for ingestion order).
    Output: (doc_id, n_shingles, n_novel) — the incremental-diversity
    signal data-curation pipelines rank sources by.

    Shape at scale: the shingle stream is ``dedup._shingle_hash_rows``
    (16-byte md5-half rows, per-doc distinct, never shingle strings),
    materialized ONCE and consumed twice:

    - per-doc totals are per-batch value-count PARTIALS, summed per
      doc_id in the merge (dynamic block splitting can slice the
      materialized stream mid-doc, so a batch's count is never
      trusted as a doc's total) — still no extra exchange;
    - first-occurrence attribution buckets by h0 hash with per-batch
      (h0, h1) -> min-doc partials (min is mergeable); each bucket
      counts its winners into (doc_id, n_novel) partial rows.

    The final merge is size-gated: below ``driver_merge_max_docs``
    both per-doc partial streams (n_docs-bounded) coalesce into one
    vectorized driver merge; above it they CO-BUCKET by doc-id hash
    (a doc's partials all land in one bucket) and each bucket merges
    locally (tested for agreement, including under a 64 KB block cap).
    """
    import numpy as np
    import pandas as pd

    from .dedup import _shingle_hash_rows
    from .util import bucket_count

    sh = ds.map_batches(_shingle_hash_rows, batch_format="pyarrow",
                        batch_size=None).materialize()
    n_rows = sh.count()
    if num_buckets is None:
        num_buckets = bucket_count(n_rows, NOVELTY_ROWS_PER_BUCKET)

    def totals_batch(batch: pa.Table) -> pa.Table:
        # rows are per-doc distinct, so a value-count is a MERGEABLE
        # partial of the doc's distinct-shingle count. It is only a
        # partial: Ray's dynamic block splitting can slice the
        # materialized shingle stream MID-DOC (target_max_block_size),
        # so merge() must re-sum per doc_id — never treat one row as
        # the doc's total (measured: a 64 KB block cap split one
        # 100k-shingle doc into 24 partial rows)
        ids, counts = np.unique(
            batch["doc_id"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                         "n_shingles": pa.array(counts.astype(np.int64),
                                                pa.int64())})

    def min_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"h0": batch["h0"], "h1": batch["h1"],
                      "doc_id": batch["doc_id"]}) \
            .group_by(["h0", "h1"]).aggregate([("doc_id", "min")]) \
            .rename_columns(["h0", "h1", "doc_id"])
        b = (t["h0"].to_numpy(zero_copy_only=False).astype(np.uint64)
             % num_buckets)
        return t.append_column("bucket",
                               pa.array(b.astype(np.int64), pa.int64()))

    def novel_fold(df: pd.DataFrame) -> pd.DataFrame:
        winner = df.groupby(["h0", "h1"], as_index=False)["doc_id"].min()
        out = winner.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "n_novel"})
        return out.astype({"doc_id": "int64", "n_novel": "int64"})

    totals = sh.map_batches(totals_batch, batch_format="pyarrow",
                            batch_size=None)
    novel = sh.map_batches(min_partial, batch_format="pyarrow",
                           batch_size=None) \
        .groupby("bucket").map_groups(novel_fold, batch_format="pandas")

    def merge(tot_df: pd.DataFrame, nov_df: pd.DataFrame) -> pd.DataFrame:
        # BOTH inputs are partial streams (totals can split mid-doc
        # across blocks, novel counts split across h0 buckets) —
        # re-aggregate each before joining
        tot_df = tot_df.groupby("doc_id", as_index=False)["n_shingles"].sum()
        nov = nov_df.groupby("doc_id", as_index=False)["n_novel"].sum()
        out = tot_df.merge(nov, on="doc_id", how="left")
        out["n_novel"] = out["n_novel"].fillna(0)
        out = out.sort_values("doc_id").reset_index(drop=True)
        return out.astype({"doc_id": "int64", "n_shingles": "int64",
                           "n_novel": "int64"})

    if n_docs is not None and n_docs <= driver_merge_max_docs:
        return merge(totals.to_pandas(), novel.to_pandas())

    # at-scale path: co-bucket both per-doc streams by doc-id hash
    # (tables built from numpy — pa.Table.from_pandas would reattach
    # the pandas schema-metadata blob and break Ray's schema dedup)
    def tag(ids: np.ndarray, vals: np.ndarray, kind: int) -> pa.Table:
        from .util import bucket_hash
        ids = ids.astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket_hash(ids, num_buckets), pa.int64()),
            "kind": pa.array(np.full(len(ids), kind, np.int64), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "val": pa.array(vals.astype(np.int64), pa.int64())})

    def merge_fold(df: pd.DataFrame) -> pd.DataFrame:
        tot = df[df["kind"] == 0][["doc_id", "val"]] \
            .rename(columns={"val": "n_shingles"})
        nov = df[df["kind"] == 1][["doc_id", "val"]] \
            .rename(columns={"val": "n_novel"})
        return merge(tot, nov)

    ta = totals.map_batches(
        lambda t: tag(t["doc_id"].to_numpy(zero_copy_only=False),
                      t["n_shingles"].to_numpy(zero_copy_only=False), 0),
        batch_format="pyarrow", batch_size=None)
    na = novel.map_batches(
        lambda d: tag(d["doc_id"].to_numpy(), d["n_novel"].to_numpy(), 1),
        batch_format="pandas", batch_size=None)
    return ta.union(na).groupby("bucket") \
        .map_groups(merge_fold, batch_format="pandas")


TOKEN_BUDGET = 10_000_000  # tokens the planned training run will consume


def token_budget_plan(ds, budget: int = TOKEN_BUDGET):
    """Token-budget apportionment (the data-constrained training-mix
    planner): split a fixed token ``budget`` across sources in
    proportion to their mixture weights using LARGEST-REMAINDER
    rounding — allocations are integers, sum EXACTLY to the budget,
    and every step is integer arithmetic (floor quota + ranked
    remainders, ties broken by source name), so the DuckDB twin
    matches bit-for-bit. ``repeat_e6`` = floor(alloc * 1e6 /
    n_tokens): how many epochs of the source's token mass the
    allocation implies (the Muennighoff-style repeat factor).

    Output: (source, n_docs, n_tokens, weight_permille, alloc_tokens,
    repeat_e6), source asc.

    Shape at scale: per-batch (source, docs, tokens) partials over
    BOUNDED keys fold once (``finish_grouped``); the apportionment
    itself is O(#sources) on the coalesced block — never a second
    corpus pass. Token semantics match ``source_mix`` (collapsed
    single-space split on the normalized text).
    """
    import numpy as np
    import pandas as pd

    from .util import finish_grouped, table_from_pandas

    def partial(batch: pa.Table) -> pa.Table:
        norm = norm_expr(batch["text"])
        toks = pc.add(pc.count_substring(norm, " "), 1)
        df = pd.DataFrame({
            "source": batch["source"].to_pylist(),
            "n_tokens": toks.to_numpy(zero_copy_only=False).astype("int64")})
        agg = df.groupby("source", as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return table_from_pandas(agg)

    folded = finish_grouped(ds.map_batches(partial, batch_format="pyarrow"),
                            ["source"])

    def apportion(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["source", "n_docs", "n_tokens", "weight_permille",
                "alloc_tokens", "repeat_e6"]
        if not len(df):
            return pd.DataFrame({c: pd.Series(
                [], dtype="object" if c == "source" else "int64")
                for c in cols})
        out = df.sort_values("source").reset_index(drop=True)
        w = out["source"].map(source_weight_permille).astype("int64")
        sw = int(w.sum())
        quota = budget * w  # <= budget * 1000: no int64 overflow risk
        floor_alloc = quota // sw
        rem = quota % sw
        extra = budget - int(floor_alloc.sum())
        # rank remainders desc, source asc — the first `extra` get +1
        order = np.lexsort((out["source"].to_numpy(), -rem.to_numpy()))
        bump = np.zeros(len(out), dtype=np.int64)
        bump[order[:extra]] = 1
        out["weight_permille"] = w
        out["alloc_tokens"] = floor_alloc + bump
        out["repeat_e6"] = (out["alloc_tokens"] * 1_000_000) \
            // out["n_tokens"]
        return out[cols].astype({c: "int64" for c in cols[1:]})

    return folded.map_batches(apportion, batch_format="pandas",
                              batch_size=None)


# --- recrawl snapshot delta (CDC-style corpus management) -----------------
# demo snapshot derivation: residues of doc_id % SNAP_MOD simulate the
# three change classes a recrawl produces (the same
# derive-from-the-corpus trick decontaminate uses for its benchmark)
SNAP_MOD = 11
SNAP_CHANGED_RESIDUE = 1   # in both crawls, text changed
SNAP_ADDED_RESIDUE = 2     # absent from the OLD crawl (newly found)
SNAP_DELETED_RESIDUE = 3   # absent from the NEW crawl (page gone)
SNAP_OLD_MARKER = "v0"     # PREPENDED to changed docs' old text (must
                           # land inside the fingerprint prefix)
SNAP_BROADCAST_MAX_DOCS = 200_000
SNAP_ROWS_PER_BUCKET = 1_000_000


def snapshot_old(ds):
    """The simulated PREVIOUS crawl: drops the 'added' residue class
    and prepends ``SNAP_OLD_MARKER`` to the 'changed' class's text."""
    import numpy as np

    def old_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids % SNAP_MOD != SNAP_ADDED_RESIDUE))
        ids2 = t["doc_id"].to_numpy(zero_copy_only=False)
        mark = np.where(ids2 % SNAP_MOD == SNAP_CHANGED_RESIDUE,
                        SNAP_OLD_MARKER + " ", "")
        text = pc.binary_join_element_wise(
            pa.array(mark, pa.string()), t["text"], pa.scalar(""))
        return pa.table({"doc_id": t["doc_id"], "text": text,
                         "source": t["source"]})

    return ds.map_batches(old_batch, batch_format="pyarrow")


def snapshot_new(ds):
    """The simulated CURRENT crawl: drops the 'deleted' residue class,
    text as-is."""
    def new_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids % SNAP_MOD != SNAP_DELETED_RESIDUE))
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "source": t["source"]})

    return ds.map_batches(new_batch, batch_format="pyarrow")


def recrawl_delta(old_ds, new_ds, n_docs: int | None = None,
                  broadcast_max_docs: int = SNAP_BROADCAST_MAX_DOCS,
                  num_buckets: int | None = None):
    """CDC-style recrawl delta: classify every doc_id across two crawl
    snapshots as unchanged / changed (content fingerprint differs) /
    added (new crawl only) / deleted (old crawl only), rolled up per
    source — (source, n_unchanged, n_changed, n_added, n_deleted),
    source asc. The report an incremental-ingest pipeline reads to
    decide what to re-process. Fingerprints are
    ``fingerprint_batch``'s (the exact-dedup hash — ONE content-hash
    definition engine-wide); source attribution prefers the NEW side
    (coalesce(new.source, old.source)).

    Shape at scale: both sides project to fixed-width (doc_id, hash,
    source, side) rows. Below ``broadcast_max_docs`` (raw-corpus doc
    count) both projections fold on the driver with one outer merge;
    above it the sides UNION and hash into doc_id buckets
    (``util.bucket_hash`` — both sides byte-identical by
    construction), each bucket classifying its ids with one vectorized
    pandas merge and emitting per-source partial counts; the finish
    sums bounded source keys. The exchange moves hash rows, never
    text.
    """
    import numpy as np
    import pandas as pd

    from .util import bucket_count, bucket_hash, finish_grouped, \
        table_from_pandas

    def project(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = fingerprint_batch(batch)
            return pa.table({
                "doc_id": pc.cast(h["doc_id"], pa.int64()),
                "text_hash": h["text_hash"],
                "source": batch["source"],
                "side": pa.array(np.full(len(h), side, np.int64)),
            })
        return fn

    cols = ["source", "n_unchanged", "n_changed", "n_added", "n_deleted"]

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]
        n = df[df["side"] == 1]
        m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"))
        src = m["source_n"].fillna(m["source_o"])
        added = m["text_hash_o"].isna()
        deleted = m["text_hash_n"].isna()
        changed = ~added & ~deleted & (m["text_hash_o"] != m["text_hash_n"])
        unchanged = ~added & ~deleted & ~changed
        out = pd.DataFrame({
            "source": src,
            "n_unchanged": unchanged.astype("int64"),
            "n_changed": changed.astype("int64"),
            "n_added": added.astype("int64"),
            "n_deleted": deleted.astype("int64"),
        }).groupby("source", as_index=False).sum()
        return out

    if n_docs is not None and n_docs <= broadcast_max_docs:
        rows = []
        for side, ds in ((0, old_ds), (1, new_ds)):
            rows.extend(ds.map_batches(project(side),
                                       batch_format="pyarrow").take_all())
        df = pd.DataFrame(rows) if rows else pd.DataFrame(
            {"doc_id": [], "text_hash": [], "source": [], "side": []})
        out = classify(df).sort_values("source").reset_index(drop=True)
        return out.astype({c: "int64" for c in cols[1:]})

    if num_buckets is None:
        num_buckets = bucket_count(n_docs or SNAP_ROWS_PER_BUCKET,
                                   SNAP_ROWS_PER_BUCKET)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_hash(t["doc_id"].to_numpy(zero_copy_only=False),
                        num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    both = old_ds.map_batches(project(0), batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .union(new_ds.map_batches(project(1), batch_format="pyarrow")
               .map_batches(add_bucket, batch_format="pyarrow"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return classify(df)

    folded = finish_grouped(
        both.groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["source"])

    def order(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(
                [], dtype="object" if c == "source" else "int64")
                for c in cols})
        return df[cols].sort_values("source").reset_index(drop=True) \
            .astype({c: "int64" for c in cols[1:]})

    return folded.map_batches(order, batch_format="pandas",
                              batch_size=None)
