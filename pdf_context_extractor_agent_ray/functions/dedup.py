"""Deduplication operators: exact (hash-partition + per-group first),
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification.

Scale notes (100 TB): the only shuffle in each op is a groupby on a
HASH key — uniformly distributed by construction, so no skew; the
per-batch work (hashing, shingling) is the dominant cost and is
embarrassingly parallel. MinHash signatures use lexicographic-min over
salted md5 hex strings — mergeable (min is associative) and
value-identical to the DuckDB oracle, which uses the same md5 strings.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import norm_expr
from .util import round_half_away_e

N_PERM = 8          # minhash permutations
SHINGLE_TOKENS = 3  # tokens per shingle
LSH_BANDS = 4       # bands of N_PERM // LSH_BANDS rows each
JACCARD_THRESHOLD_E6 = 500_000  # 0.5 in integer-scaled jaccard
MAX_BUCKET_DOCS = 512  # beyond this a bucket chain-links instead of all-pairs


def _norm(batch_text: pa.ChunkedArray | pa.Array) -> list[str]:
    return norm_expr(batch_text).to_pylist()


def _shingles(norm: str) -> list[str]:
    tk = norm.split(" ")
    n = max(len(tk) - SHINGLE_TOKENS + 1, 0) + (1 if len(tk) < SHINGLE_TOKENS else 0)
    return [" ".join(tk[i:i + SHINGLE_TOKENS]) for i in range(max(n, 1))]


def minhash_signature(norm: str) -> list[str]:
    """Lexicographic-min over salted md5 hex digests per permutation —
    identical strings to the SQL oracle's min(md5(i || '#' || shingle))."""
    shingles = _shingles(norm)
    sig = []
    for i in range(N_PERM):
        sig.append(min(hashlib.md5(f"{i}#{s}".encode()).hexdigest() for s in shingles))
    return sig


def minhash_signatures_for(norms: list[str]) -> list[list[str]]:
    """Batch-memoized signatures, value-identical to
    ``minhash_signature`` per doc: hashlib runs once per (perm,
    DISTINCT shingle) across the whole batch instead of once per
    occurrence — the same vocab dedup ``simhash_batch`` does for its
    token vocabulary (shared shingles across near-duplicate docs are
    exactly the common case in a dedup corpus). Per-doc minima are then
    integer work: per perm, rank the vocab digests once (argsort) and
    ``np.minimum.reduceat`` the occurrence ranks per doc."""
    import numpy as np

    if not norms:
        return []
    vocab: dict[str, int] = {}
    occ: list[int] = []
    starts = [0]
    for n in norms:
        # per-doc distinct is enough: min over duplicates is unchanged
        occ.extend({vocab.setdefault(s, len(vocab)) for s in _shingles(n)})
        starts.append(len(occ))
    occ_a = np.asarray(occ, dtype=np.int64)
    st = np.asarray(starts[:-1], dtype=np.int64)
    vs = [s.encode() for s in vocab]  # encode once, reuse across perms
    md5 = hashlib.md5
    out = np.empty((N_PERM, len(norms)), dtype="U32")
    for i in range(N_PERM):
        pre = f"{i}#".encode()
        digests = np.array(
            [md5(pre + s).hexdigest() for s in vs], dtype="U32")
        order = np.argsort(digests, kind="stable")
        rank = np.empty(len(vs), dtype=np.int64)
        rank[order] = np.arange(len(vs))
        out[i] = digests[order][np.minimum.reduceat(rank[occ_a], st)]
    return [list(out[:, k]) for k in range(len(norms))]


def minhash_batch(batch: pa.Table) -> pa.Table:
    norms = _norm(batch["text"])
    sigs = minhash_signatures_for(norms)
    cols = {"doc_id": batch["doc_id"]}
    for i in range(N_PERM):
        cols[f"sig_{i}"] = pa.array([s[i] for s in sigs], pa.string())
    return pa.table(cols)


def exact_dedup(ds):
    """Exact dedup: content hash → hash-partitioned groupby → keep-first
    (min doc_id). Output: text_hash, keep_doc_id, n_copies."""
    from ray.data.aggregate import Count, Min
    from .text import fingerprint_batch

    hashed = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"),
    )


def minhash_signatures(ds):
    """MinHash signature table (doc_id, sig_0..sig_{N_PERM-1})."""
    return ds.map_batches(minhash_batch, batch_format="pyarrow")


def _band_key(sig: list[str], band: int) -> str:
    rows = N_PERM // LSH_BANDS
    return hashlib.md5(("|".join(sig[band * rows:(band + 1) * rows])).encode()).hexdigest()


def _jaccard_e6(norm_a: str, norm_b: str) -> int:
    sa, sb = set(_shingles(norm_a)), set(_shingles(norm_b))
    union = len(sa | sb)
    # round-half-away to match the DuckDB oracle's round()
    # multiply-FIRST (1e6*i/u) to mirror the oracle's operand order;
    # (i/u)*1e6 can differ by 1 at exact .5 boundaries
    return int(1e6 * len(sa & sb) / union + 0.5) if union else 0


LSH_BROADCAST_MAX_DOCS = 200_000


def lsh_candidate_pairs(ds, num_partitions: int | None = None,
                        broadcast_max_docs: int = LSH_BROADCAST_MAX_DOCS,
                        n_docs: int | None = None):
    """MinHash-LSH near-dup pairs: shingle → minhash → band-bucket
    groupby → candidate pairs → exact n-gram Jaccard verification.

    Scale: the band exchange carries ONLY (doc_id, band, bucket) —
    ~50 B/doc/band, never the document text (shipping norm_text through
    the groupby would move 4x the corpus text at 100 TB). Verification
    is size-gated: up to ``broadcast_max_docs`` the normalized texts
    broadcast once via ``ray.put`` and buckets verify inline (zero
    extra exchanges); above, each candidate doc's text is re-read via
    doc_id-keyed hash joins — text movement proportional to the sparse
    candidate set, not the corpus.

    Output: doc_a, doc_b (doc_a < doc_b), jaccard_e6 (integer-scaled),
    only pairs with Jaccard >= threshold, deduped across bands.

    ``n_docs``: pass the known corpus size when ``ds`` is a DERIVED
    dataset (map_batches chain, filter) — otherwise the size gate's
    ``ds.count()`` executes the whole upstream pipeline once just to
    pick a path. Plain parquet reads resolve count() from metadata.
    """
    if n_docs is None:
        n_docs = ds.count()
    if n_docs <= broadcast_max_docs:
        return _lsh_pairs_broadcast(ds)
    return _lsh_pairs_join(ds, num_partitions)


def _sig_and_bands(batch: pa.Table) -> pa.Table:
    norms = _norm(batch["text"])
    doc_ids = batch["doc_id"].to_pylist()
    out_doc, out_band, out_key = [], [], []
    for d, sig in zip(doc_ids, minhash_signatures_for(norms)):
        for b in range(LSH_BANDS):
            out_doc.append(d)
            out_band.append(b)
            out_key.append(_band_key(sig, b))
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "band": pa.array(out_band, pa.int32()),
                     "bucket": pa.array(out_key, pa.string())})


def _candidate_pairs(docs: list[int]) -> list[tuple[int, int]]:
    if len(docs) > MAX_BUCKET_DOCS:
        # degenerate bucket (e.g. a corpus of near-identical docs):
        # full pairing is O(n²). Chain-link instead: consecutive doc_id
        # pairs — every member still links into one connected component
        # (dup_clusters recovers the full cluster) at O(n) pairs.
        return [(docs[i], docs[i + 1]) for i in range(len(docs) - 1)]
    return [(docs[i], docs[j])
            for i in range(len(docs)) for j in range(i + 1, len(docs))]


def _lsh_pairs_broadcast(ds):
    """Gated small/medium path, ZERO shuffles: one distributed pass
    computes norm text + band keys per doc; the (tiny) key rows come to
    the driver, which groups buckets and emits the deduped candidate
    set in plain Python; verification fans back out as a map_batches
    over the pair list with the texts broadcast once via ``ray.put``.
    Every exchange a groupby would pay (~seconds of fixed sort-shuffle
    cost at any size) is avoided — the gate guarantees the key rows and
    the text dict fit the driver."""
    import ray
    import ray.data as rd
    from collections import defaultdict

    def norm_and_sig(batch: pa.Table) -> pa.Table:
        norms = _norm(batch["text"])
        cols = {"doc_id": batch["doc_id"],
                "norm_text": pa.array(norms, pa.string())}
        sigs = minhash_signatures_for(norms)  # batch-memoized distinct shingles
        keys = [[_band_key(sig, b) for b in range(LSH_BANDS)] for sig in sigs]
        for b in range(LSH_BANDS):
            cols[f"band_{b}"] = pa.array([k[b] for k in keys], pa.string())
        return pa.table(cols)

    rows = ds.map_batches(norm_and_sig, batch_format="pyarrow").take_all()

    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for r in rows:
        for b in range(LSH_BANDS):
            buckets[(b, r[f"band_{b}"])].append(r["doc_id"])
    cand: set[tuple[int, int]] = set()
    for docs in buckets.values():
        if len(docs) >= 2:
            cand.update(_candidate_pairs(sorted(docs)))

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard_e6": pa.array([], pa.int64())})
    if not cand:
        return rd.from_arrow(empty)

    ref = ray.put({r["doc_id"]: r["norm_text"] for r in rows})
    ordered = sorted(cand)
    pairs_ds = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in ordered], pa.int64()),
        "doc_b": pa.array([b for _, b in ordered], pa.int64())}))

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        memo: dict[int, set] = {}

        def sset(d: int) -> set:
            if d not in memo:
                memo[d] = set(_shingles(lookup[d]))
            return memo[d]

        oa, ob, oj = [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            sa, sb = sset(a), sset(b)
            union = len(sa | sb)
            jac = int(1e6 * len(sa & sb) / union + 0.5) if union else 0
            if jac >= JACCARD_THRESHOLD_E6:
                oa.append(a)
                ob.append(b)
                oj.append(jac)
        return pa.table({"doc_a": pa.array(oa, pa.int64()),
                         "doc_b": pa.array(ob, pa.int64()),
                         "jaccard_e6": pa.array(oj, pa.int64())})

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def _lsh_pairs_join(ds, num_partitions: int | None = None):
    import ray
    if num_partitions is None:
        # join aggregators are actors: keep well under cluster CPUs
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, cpus // 2)

    def bucket_candidates(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        if len(df) < 2:
            return empty
        pairs = _candidate_pairs(sorted(df["doc_id"].tolist()))
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"]) if pairs else empty

    def norm_texts(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "norm_text": pa.array(_norm(batch["text"]), pa.string())})

    # normalize ONCE and materialize: the band pass and both join sides
    # all consume the normalized text — without this, the corpus read +
    # regex normalization would execute three full times (the object
    # store spills the materialized texts at scale; same trade
    # _ngram_jaccard_distributed makes with its shingle pass)
    texts = ds.map_batches(norm_texts, batch_format="pyarrow").materialize()

    def sig_and_bands_from_norm(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        out_doc, out_band, out_key = [], [], []
        sigs = minhash_signatures_for(batch["norm_text"].to_pylist())
        for d, sig in zip(doc_ids, sigs):
            for b in range(LSH_BANDS):
                out_doc.append(d)
                out_band.append(b)
                out_key.append(_band_key(sig, b))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "bucket": pa.array(out_key, pa.string())})

    exploded = texts.map_batches(sig_and_bands_from_norm, batch_format="pyarrow")
    cand = exploded.groupby(["band", "bucket"]).map_groups(
        bucket_candidates, batch_format="pandas")
    # dedupe candidates found in multiple bands (tiny rows: two int64s)
    from ray.data.aggregate import Count
    cand = cand.groupby(["doc_a", "doc_b"]) \
        .aggregate(Count(alias_name="_n_bands")) \
        .select_columns(["doc_a", "doc_b"])
    ta = texts.map_batches(
        lambda b: pa.table({"_ka": b["doc_id"], "text_a": b["norm_text"]}),
        batch_format="pyarrow")
    tb = texts.map_batches(
        lambda b: pa.table({"_kb": b["doc_id"], "text_b": b["norm_text"]}),
        batch_format="pyarrow")
    j = cand.join(ta, "inner", num_partitions=num_partitions,
                  on=("doc_a",), right_on=("_ka",)) \
        .select_columns(["doc_a", "doc_b", "text_a"])
    j = j.join(tb, "inner", num_partitions=num_partitions,
               on=("doc_b",), right_on=("_kb",)) \
        .select_columns(["doc_a", "doc_b", "text_a", "text_b"])

    def verify(batch: pa.Table) -> pa.Table:
        oa, ob, oj = [], [], []
        for a, b, na, nb in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist(),
                                batch["text_a"].to_pylist(), batch["text_b"].to_pylist()):
            jac = _jaccard_e6(na, nb)
            if jac >= JACCARD_THRESHOLD_E6:
                oa.append(a)
                ob.append(b)
                oj.append(jac)
        return pa.table({"doc_a": pa.array(oa, pa.int64()),
                         "doc_b": pa.array(ob, pa.int64()),
                         "jaccard_e6": pa.array(oj, pa.int64())})

    return j.map_batches(verify, batch_format="pyarrow")


SMALL_GRAPH_PAIRS = 1_000_000


def dup_clusters(ds, max_rounds: int = 16,
                 small_graph_pairs: int = SMALL_GRAPH_PAIRS,
                 n_docs: int | None = None):
    """Near-duplicate clusters: connected components over the MinHash-LSH
    pair graph.

    Size-gated execution: when the pair set is small (the common case —
    dedup graphs are sparse) the components are computed by union-find
    inside ONE task on the coalesced pair set, avoiding per-round join
    overhead. Past ``small_graph_pairs`` the exact same result comes
    from iterative min-label propagation (labels join edges
    hash-partitioned on the node key, per-node min, fixpoint) — the
    pattern that scales when the pair set does not fit one worker.

    Output: doc_id, cluster_id (min doc_id of the component; singleton
    docs are not listed — only docs that participate in some pair).
    """
    pairs = lsh_candidate_pairs(ds, n_docs=n_docs).materialize()
    return _clusters_from_pairs(pairs, max_rounds=max_rounds,
                                small_graph_pairs=small_graph_pairs)


def _clusters_from_pairs(pairs, max_rounds: int = 16,
                         small_graph_pairs: int = SMALL_GRAPH_PAIRS):
    """Connected components over a MATERIALIZED verified-pair Dataset —
    the size-gated union-find / min-label-propagation core of
    ``dup_clusters``, factored so pair sets built elsewhere (the
    incremental funnel's memo-merged pairs) cluster identically."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4))
    num_partitions = max(2, cpus // 2)

    if pairs.count() <= small_graph_pairs:
        # small-graph path: the pair set fits one process by the gate's
        # definition, so union-find runs on the coalesced pairs directly
        # (driver-side; no repartition exchange for a tiny edge list)
        import ray.data as rd

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in pairs.take_all():
            a, b = row["doc_a"], row["doc_b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so the root IS the min doc_id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted(parent)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array([find(n) for n in nodes], pa.int64())}))
    # undirected edge list, one row per direction
    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        return pa.table({"node": pa.array(a + b), "peer": pa.array(b + a)})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")

    from ray.data.aggregate import Min
    labels = edges.groupby("node").aggregate(Min("peer", alias_name="peer_min"))

    def init_label(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lbl = pc.min_element_wise(batch["node"], batch["peer_min"])
        return pa.table({"node": batch["node"], "label": lbl})

    labels = labels.map_batches(init_label, batch_format="pyarrow")

    n_changed = 0
    for _ in range(max_rounds):
        # propagate: each node's label -> its peers, take the min
        joined = edges.join(labels, "inner", num_partitions=num_partitions,
                            on=("peer",), right_on=("node",),
                            right_suffix="_l")
        prop = joined.groupby("node").aggregate(Min("label", alias_name="peer_label"))
        # pointer doubling: label(label) — each node also adopts its
        # current label's label, so a path component converges in
        # O(log diameter) rounds instead of O(diameter) (critical once
        # chain-linked degenerate buckets create long paths)
        parents = labels.map_batches(
            lambda b: pa.table({"pnode": b["node"], "plabel": b["label"]}),
            batch_format="pyarrow")
        hop = labels.join(parents, "inner", num_partitions=num_partitions,
                          on=("label",), right_on=("pnode",)) \
            .select_columns(["node", "plabel"])
        merged = labels.join(prop, "left_outer", num_partitions=num_partitions,
                             on=("node",), right_on=("node",), right_suffix="_p")
        merged = merged.join(hop, "left_outer", num_partitions=num_partitions,
                             on=("node",), right_on=("node",), right_suffix="_h")

        def take_min(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            new = pc.min_element_wise(
                pc.min_element_wise(batch["label"],
                                    pc.fill_null(batch["peer_label"], 2**62)),
                pc.fill_null(batch["plabel"], 2**62))
            changed = pc.cast(pc.not_equal(new, batch["label"]), pa.int64())
            return pa.table({"node": batch["node"], "label": new, "changed": changed})

        updated = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        n_changed = updated.sum("changed")
        labels = updated.select_columns(["node", "label"])
        if not n_changed:
            break
    if n_changed:
        # never return silently-wrong components: with pointer doubling
        # this needs diameter > 2**max_rounds, i.e. it cannot trip in
        # practice — but a truncated fixpoint must be an error, not data
        raise RuntimeError(
            f"dup_clusters label propagation did not converge in {max_rounds} "
            f"rounds ({n_changed} labels still changing)")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["node"], "cluster_id": batch["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


# Driver-fold gate: unlike the LSH broadcast path (~50 B/doc of band
# keys), this path gathers the distinct SHINGLE rows (~3x the corpus
# text as factorized strings) — 50k ~2KB docs is ~300 MB of driver
# heap, the comfortable ceiling. Above it the bucketed exchange path
# runs (16 B/shingle hashes, never strings).
NGRAM_DRIVER_MAX_DOCS = 50_000


def _shingle_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, s) rows — each doc's DISTINCT shingles, exploded."""
    norms = _norm(batch["text"])
    doc_ids = batch["doc_id"].to_pylist()
    out_d, out_s = [], []
    for d, n in zip(doc_ids, norms):
        for s in set(_shingles(n)):
            out_d.append(d)
            out_s.append(s)
    return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                     "s": pa.array(out_s, pa.string())})


def ngram_jaccard_pairs(ds, threshold_e6: int = JACCARD_THRESHOLD_E6,
                        driver_max_docs: int = NGRAM_DRIVER_MAX_DOCS,
                        n_docs: int | None = None,
                        max_pairs: int | None = None):
    """EXACT n-gram Jaccard near-dup pairs via a shingle inverted
    index — no LSH recall loss: any pair with J >= 0.5 shares at least
    one shingle, so grouping by shingle and counting co-occurrences
    finds every qualifying pair (the classic exact-MapReduce dedup).

    Size-gated like the LSH path: up to ``driver_max_docs`` the
    distinct-shingle rows come to the driver (~3x the corpus text —
    see the gate constant) and the pair counting is one vectorized
    fold; above, the inverted index is a shingle-HASH-bucket groupby
    (16 B/row exchange) → per-pair count aggregate → byte-sized size
    joins. The at-scale caveat is inherent to EXACT Jaccard: a shingle
    shared by k docs emits O(k^2) pairs, so a boilerplate-heavy corpus
    should use ``lsh_candidate_pairs`` (approximate candidates, same
    verifier) instead — this op is the exact oracle-checkable baseline.

    Output: doc_a, doc_b (doc_a < doc_b), jaccard_e6 >= threshold.

    ``max_pairs`` (optional): fail-fast budget on the PROJECTED pair
    partials sum_g C(k_g, 2) over shingle groups — the exact quantity
    that blows up on a dup-dense corpus. The projection is computed
    BEFORE any pair is materialized (driver path: free, from the group
    lengths already in hand; distributed path: one narrow
    partial-count exchange over 24 B rows — never the O(k^2) pair
    sort) and a clear ValueError with the projected count raises in
    seconds instead of hanging the cluster.
    """
    if n_docs is None:
        n_docs = ds.count()
    if n_docs <= driver_max_docs:
        return _ngram_jaccard_driver(ds, threshold_e6, max_pairs=max_pairs)
    return _ngram_jaccard_distributed(ds, threshold_e6, max_pairs=max_pairs)


def _pairs_table(doc_a: list[int], doc_b: list[int], jac: list[int]) -> pa.Table:
    return pa.table({"doc_a": pa.array(doc_a, pa.int64()),
                     "doc_b": pa.array(doc_b, pa.int64()),
                     "jaccard_e6": pa.array(jac, pa.int64())})


def _emit_group_pairs(d: np.ndarray, starts: np.ndarray,
                      lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (i<j) doc pairs within each sorted group of ``d``. Per-group
    triu indices are memoized by size — per-group numpy-call overhead
    (~50us) dominates otherwise (CLAUDE.md)."""
    pa_list, pb_list = [], []
    triu_memo: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for st, n in zip(starts[lens >= 2].tolist(), lens[lens >= 2].tolist()):
        g = d[st:st + n]  # ascending (lexsort secondary key), distinct
        if n not in triu_memo:
            triu_memo[n] = np.triu_indices(n, 1)
        ii, jj = triu_memo[n]
        pa_list.append(g[ii])
        pb_list.append(g[jj])
    if not pa_list:
        e = np.array([], dtype=np.int64)
        return e, e
    return np.concatenate(pa_list), np.concatenate(pb_list)


def _check_pair_budget(projected: float, max_pairs: int | None,
                       where: str) -> None:
    if max_pairs is not None and projected > max_pairs:
        raise ValueError(
            f"ngram_jaccard_pairs: projected {int(projected):,} pair "
            f"partials across shingle groups ({where}) exceeds the "
            f"max_pairs budget {max_pairs:,} — the corpus is too "
            "dup-dense for the exact pair expansion. Use the sampled "
            "recall mode (lsh_recall_report(sample_mod=...)) or raise "
            "the budget on a cluster sized for it.")


def _ngram_jaccard_driver(ds, threshold_e6: int,
                          max_pairs: int | None = None):
    """Gated small path, zero shuffles: one distributed shingle pass;
    the driver folds the inverted index vectorized (factorize + sorted
    group boundaries — only multi-doc shingles reach Python)."""
    import ray.data as rd

    chunks = [batch for batch in
              ds.map_batches(_shingle_rows, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow") if len(batch)]
    if not chunks:
        return rd.from_arrow(_pairs_table([], [], []))
    t = pa.concat_tables(chunks)
    docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    codes = pd.factorize(t["s"].to_pandas())[0]

    uniq_docs, counts = np.unique(docs, return_counts=True)
    sizes = dict(zip(uniq_docs.tolist(), counts.tolist()))

    order = np.lexsort((docs, codes))
    c = codes[order]
    d = docs[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    lens = np.diff(np.r_[starts, len(c)])
    # fail fast BEFORE materializing any O(k^2) pair (float64 is exact
    # enough for a budget comparison at any magnitude)
    lf = lens.astype(np.float64)
    _check_pair_budget(float((lf * (lf - 1) / 2).sum()), max_pairs,
                       "driver inverted index")
    A, B = _emit_group_pairs(d, starts, lens)
    if not len(A):
        return rd.from_arrow(_pairs_table([], [], []))

    # count identical (doc_a, doc_b) occurrences = |A ∩ B| per pair
    o2 = np.lexsort((B, A))
    A, B = A[o2], B[o2]
    new_pair = np.r_[True, (A[1:] != A[:-1]) | (B[1:] != B[:-1])]
    p_starts = np.flatnonzero(new_pair)
    inter = np.diff(np.r_[p_starts, len(A)]).astype(np.float64)
    ua, ub = A[p_starts], B[p_starts]
    sz = pd.Series(sizes)
    union = sz.loc[ua].to_numpy(np.float64) + sz.loc[ub].to_numpy(np.float64) - inter
    # multiply-first mirrors the oracle's round(1e6*i/u) operand order
    jac = round_half_away_e(1e6 * inter / np.maximum(union, 1), scale=1.0)
    keep = jac >= threshold_e6
    return rd.from_arrow(_pairs_table(
        ua[keep].tolist(), ub[keep].tolist(), jac[keep].tolist()))


NGRAM_ROWS_PER_BUCKET = 1_000_000  # shingle-hash rows per fold bucket


def _shingle_hash_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, h0, h1) rows — each doc's DISTINCT shingles as the two
    int64 halves of md5(shingle). 16 bytes/row through the exchange
    instead of the shingle string (~3x the corpus text); 128-bit keys
    make collisions out of reach at any corpus size (same md5 identity
    the MinHash oracle already relies on). Zipf shingles repeat across
    docs, so each DISTINCT shingle in the batch is hashed once
    (factorize + gather — the same batch-level memoization that cut
    the MinHash hot loop)."""
    import numpy as np
    import pandas as pd

    norms = _norm(batch["text"])
    doc_ids = batch["doc_id"].to_pylist()
    all_d, all_s = [], []
    for d, n in zip(doc_ids, norms):
        ss = set(_shingles(n))
        all_d.extend([d] * len(ss))
        all_s.extend(ss)
    if not all_s:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "h0": pa.array([], pa.int64()),
                         "h1": pa.array([], pa.int64())})
    codes, uniques = pd.factorize(np.asarray(all_s, dtype=object))
    md5 = hashlib.md5
    digs = [md5(u.encode()).digest() for u in uniques]
    h0u = np.fromiter((int.from_bytes(g[:8], "big", signed=True)
                       for g in digs), dtype=np.int64, count=len(digs))
    h1u = np.fromiter((int.from_bytes(g[8:], "big", signed=True)
                       for g in digs), dtype=np.int64, count=len(digs))
    return pa.table({"doc_id": pa.array(np.asarray(all_d, np.int64()), pa.int64()),
                     "h0": pa.array(h0u[codes], pa.int64()),
                     "h1": pa.array(h1u[codes], pa.int64())})


def _projected_pair_partials(sh, num_buckets: int) -> float:
    """sum_g C(k_g, 2) over shingle groups, WITHOUT emitting a single
    pair: in-batch partial counts per (h0, h1) collapse each batch to
    its distinct shingles, one narrow exchange merges them per hash
    bucket, and each fold emits one projection row. The whole pass
    ships (bucket, h0, h1, n) rows — 32 B each, Zipf-bounded — so the
    guard costs one fixed exchange, never the O(k^2) pair sort it
    protects against."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        h0 = batch["h0"].to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = batch["h1"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h1, h0))
        h0, h1 = h0[order], h1[order]
        new_g = np.r_[True, (h0[1:] != h0[:-1]) | (h1[1:] != h1[:-1])]
        starts = np.flatnonzero(new_g)
        n = np.diff(np.r_[starts, len(h0)])
        h0, h1 = h0[starts], h1[starts]
        return pa.table({
            "bucket": pa.array((h0.astype(np.uint64) % num_buckets)
                               .astype(np.int64)),
            "h0": pa.array(h0), "h1": pa.array(h1),
            "n": pa.array(n.astype(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        k = df.groupby(["h0", "h1"])["n"].sum().to_numpy(np.float64)
        return pd.DataFrame({"proj": [float((k * (k - 1) / 2).sum())]})

    rows = sh.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pandas") \
        .take_all()
    return float(sum(r["proj"] for r in rows))


def _ngram_jaccard_distributed(ds, threshold_e6: int,
                               max_pairs: int | None = None):
    """At-scale path: shingle-HASH-bucket groupby (one vectorized fold
    per ~1M-row bucket, never one Python call per shingle) emits the
    per-shingle pairs; a pair-count aggregate and two size joins finish
    the Jaccard. The shingle pass materializes once (sizes and buckets
    both consume it) and join partitions size down by input bytes."""
    import ray
    from ray.data.aggregate import Count

    cpus = int(ray.cluster_resources().get("CPU", 4))

    sh = ds.map_batches(_shingle_hash_rows, batch_format="pyarrow").materialize()
    n_rows = sh.count()
    from .util import bucket_count
    num_buckets = bucket_count(n_rows, NGRAM_ROWS_PER_BUCKET,
                               parallelism=max(8, cpus))
    if max_pairs is not None:
        _check_pair_budget(_projected_pair_partials(sh, num_buckets),
                           max_pairs, "distributed shingle index")
    sizes = sh.groupby("doc_id").aggregate(Count(alias_name="n_shingles"))

    def add_bucket(batch: pa.Table) -> pa.Table:
        h0 = batch["h0"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((h0 % num_buckets).astype(np.int64)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h0 = df["h0"].to_numpy(dtype=np.int64)
        h1 = df["h1"].to_numpy(dtype=np.int64)
        d = df["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((d, h1, h0))
        h0, h1, d = h0[order], h1[order], d[order]
        new_g = np.r_[True, (h0[1:] != h0[:-1]) | (h1[1:] != h1[:-1])]
        starts = np.flatnonzero(new_g)
        lens = np.diff(np.r_[starts, len(d)])
        A, B = _emit_group_pairs(d, starts, lens)
        return pd.DataFrame({"doc_a": A, "doc_b": B})

    inter = sh.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="inter")) \
        .materialize()
    # joins move tiny int rows: size aggregator actors by bytes
    # (~128 MB each), capped at cpus//2 (CLAUDE.md join rule)
    num_partitions = max(2, min(cpus // 2,
                                -(-inter.size_bytes() // (128 << 20))))

    sa = sizes.map_batches(
        lambda b: pa.table({"_ka": b["doc_id"], "n_a": b["n_shingles"]}),
        batch_format="pyarrow")
    sb = sizes.map_batches(
        lambda b: pa.table({"_kb": b["doc_id"], "n_b": b["n_shingles"]}),
        batch_format="pyarrow")
    j = inter.join(sa, "inner", num_partitions=num_partitions,
                   on=("doc_a",), right_on=("_ka",)) \
        .select_columns(["doc_a", "doc_b", "inter", "n_a"])
    j = j.join(sb, "inner", num_partitions=num_partitions,
               on=("doc_b",), right_on=("_kb",)) \
        .select_columns(["doc_a", "doc_b", "inter", "n_a", "n_b"])

    def finish(batch: pa.Table) -> pa.Table:
        i = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = (batch["n_a"].to_numpy(zero_copy_only=False)
                 + batch["n_b"].to_numpy(zero_copy_only=False) - i)
        jac = round_half_away_e(1e6 * i / np.maximum(union, 1), scale=1.0)
        keep = jac >= threshold_e6
        return _pairs_table(
            batch["doc_a"].to_numpy(zero_copy_only=False)[keep].tolist(),
            batch["doc_b"].to_numpy(zero_copy_only=False)[keep].tolist(),
            jac[keep].tolist())

    return j.map_batches(finish, batch_format="pyarrow")


SURVIVOR_BROADCAST_MAX = 10_000_000  # drop-set ids broadcast below this


def _keep_ids_except(ds, drops, broadcast_max_drops: int):
    """Size-gated keep-list: every doc_id of ``ds`` except the
    ``drop_id`` rows of ``drops``. Up to ``broadcast_max_drops`` ids
    the drop set broadcasts once via ``ray.put`` and each batch
    filters with a vectorized ``is_in`` (zero extra exchanges); above
    the gate the corpus anti-joins the drop set hash-partitioned on
    doc_id. Shared by ``near_dup_survivors`` / ``near_dup_keep_best``.
    """
    import ray

    def ids_only(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"]})

    ids = ds.map_batches(ids_only, batch_format="pyarrow")

    drops = drops.materialize()  # consumed by the gate AND the chosen path
    if drops.count() <= broadcast_max_drops:
        drop_list = [r["drop_id"] for r in drops.take_all()]
        ref = ray.put(pa.array(sorted(drop_list), pa.int64()))

        def keep(batch: pa.Table) -> pa.Table:
            dl = ray.get(ref)
            return batch.filter(
                pc.invert(pc.is_in(batch["doc_id"], value_set=dl)))

        return ids.map_batches(keep, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 4))
    marked = drops.map_batches(
        lambda b: pa.table({"drop_id": b["drop_id"],
                            "_m": pa.array([1] * len(b), pa.int8())}),
        batch_format="pyarrow")
    j = ids.join(marked, "left_outer", num_partitions=max(2, cpus // 2),
                 on=("doc_id",), right_on=("drop_id",))

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.filter(pc.is_null(batch["_m"]))["doc_id"]})

    return j.map_batches(keep_unmatched, batch_format="pyarrow")


def near_dup_survivors(ds, broadcast_max_drops: int = SURVIVOR_BROADCAST_MAX,
                       n_docs: int | None = None):
    """The deduplicated corpus keep-list: every doc_id EXCEPT clustered
    near-duplicates that are not their cluster's representative
    (cluster_id == min doc_id) — i.e. the corpus a training run would
    actually keep after near-dup dedup.

    The drop set is only the clustered non-representatives (typically a
    small fraction of the corpus); the keep-list itself is the shared
    size-gated anti-join (``_keep_ids_except``). Output: doc_id.
    """
    clusters = dup_clusters(ds, n_docs=n_docs).materialize()

    def non_reps(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch["doc_id"], batch["cluster_id"])
        return pa.table({"drop_id": batch.filter(mask)["doc_id"]})

    drops = clusters.map_batches(non_reps, batch_format="pyarrow")
    return _keep_ids_except(ds, drops, broadcast_max_drops)


KEEP_BEST_BROADCAST_MAX = 1_000_000  # clustered docs resolved driver-side below
# order-embedding key for the distributed winner pick: exact while
# doc_id < 2^40 and n_chars < 2^23 (int64 headroom)
KEEP_BEST_ID_SHIFT = 1 << 40


def near_dup_keep_best(ds,
                       broadcast_max_cluster_docs: int = KEEP_BEST_BROADCAST_MAX,
                       broadcast_max_drops: int = SURVIVOR_BROADCAST_MAX,
                       n_docs: int | None = None):
    """Quality-aware dedup keep-list: each near-dup cluster keeps its
    BEST member — longest normalized text, ties to the smallest
    doc_id — instead of ``near_dup_survivors``' smallest-doc_id
    representative (the production policy: keep the richest duplicate,
    drop the rest). Output: doc_id.

    Size-gated twice. Clusters up to ``broadcast_max_cluster_docs``
    resolve winners on the driver: the clustered set is the sparse
    duplicate fraction, its lengths fetched in one broadcast-filtered
    corpus pass, one pandas sort picks winners. Above the gate winners
    resolve distributed: per-doc lengths join the cluster table
    doc_id-partitioned and ONE ``groupby(cluster_id)`` max-aggregate
    picks each winner through the order-embedding integer key
    ``n_chars * 2^40 + (2^40-1 - doc_id)`` (max key == best member —
    no per-cluster Python call, cluster size never matters). The final
    keep-list reuses the shared size-gated anti-join.
    """
    drops = _keep_best_drops(ds, broadcast_max_cluster_docs, n_docs)
    return _keep_ids_except(ds, drops, broadcast_max_drops)


def _keep_best_drops(ds,
                     broadcast_max_cluster_docs: int = KEEP_BEST_BROADCAST_MAX,
                     n_docs: int | None = None):
    """The keep-best DROP set (``drop_id`` rows): every clustered
    near-duplicate except its cluster's longest-normalized-text member
    (ties -> smallest doc_id). Factored out of ``near_dup_keep_best``
    so pipeline compositions (``corpus_clean_funnel``) can anti-join
    the same sparse drop set against a full ROW stream instead of the
    id-only keep-list."""
    import ray
    import ray.data as rd

    clusters = dup_clusters(ds, n_docs=n_docs).materialize()

    if clusters.count() <= broadcast_max_cluster_docs:
        rows = clusters.take_all()
        if not rows:
            return rd.from_arrow(
                pa.table({"drop_id": pa.array([], pa.int64())}))
        cid = {r["doc_id"]: r["cluster_id"] for r in rows}
        idref = ray.put(pa.array(sorted(cid), pa.int64()))

        def clustered_lens(batch: pa.Table) -> pa.Table:
            sel = batch.filter(
                pc.is_in(batch["doc_id"], value_set=ray.get(idref)))
            return pa.table({
                "doc_id": sel["doc_id"],
                "n_chars": pa.array([len(s) for s in _norm(sel["text"])],
                                    pa.int64()),
            })

        import pandas as pd
        df = pd.DataFrame(
            ds.map_batches(clustered_lens, batch_format="pyarrow").take_all())
        df["cluster_id"] = df["doc_id"].map(cid)
        df = df.sort_values(["cluster_id", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        best = set(df.groupby("cluster_id", sort=False).head(1)["doc_id"])
        return rd.from_arrow(pa.table(
            {"drop_id": pa.array(sorted(set(cid) - best), pa.int64())}))

    from ray.data.aggregate import Max

    from .text import norm_expr

    def lens_batch(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(norm_expr(batch["text"])), pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_chars": n})

    cpus = int(ray.cluster_resources().get("CPU", 4))
    lens = ds.map_batches(lens_batch, batch_format="pyarrow")
    j = clusters.join(lens, "inner", num_partitions=max(2, cpus // 2),
                      on=("doc_id",))

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        # the packed key is exact only inside these ranges — a 64-bit
        # id corpus must fail LOUD here, not return a wrong winner
        if len(ids) and (int(ids.max()) >= KEEP_BEST_ID_SHIFT
                         or int(ids.min()) < 0
                         or int(nc.max()) >= (1 << 23)):
            raise ValueError(
                "near_dup_keep_best order-embedding overflow: requires "
                "0 <= doc_id < 2^40 and n_chars < 2^23, got "
                f"doc_id in [{ids.min()}, {ids.max()}], "
                f"max n_chars {nc.max()}")
        key = nc * KEEP_BEST_ID_SHIFT + (KEEP_BEST_ID_SHIFT - 1 - ids)
        return pa.table({"cluster_id": batch["cluster_id"],
                         "doc_id": batch["doc_id"],
                         "key": pa.array(key, pa.int64())})

    keyed = j.map_batches(encode, batch_format="pyarrow").materialize()
    best = keyed.groupby("cluster_id").aggregate(Max("key", alias_name="best_key"))
    j2 = keyed.join(best, "inner", num_partitions=max(2, cpus // 2),
                    on=("cluster_id",))

    def non_best(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch["key"], batch["best_key"])
        return pa.table({"drop_id": batch.filter(m)["doc_id"]})

    return j2.map_batches(non_best, batch_format="pyarrow")


def simhash_batch(batch: pa.Table, bits: int = 64) -> pa.Table:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    big-endian md5[0:8] token hashes — bit-for-bit identical to the SQL
    oracle (``('0x'||substr(md5(t),1,16))::UBIGINT``), wrapped into a
    signed int64. Vectorized per doc with numpy."""
    norms = _norm(batch["text"])
    toks_per_doc = [n.split(" ") if n else [] for n in norms]
    # hash each DISTINCT token once per batch: natural-language token
    # streams are Zipf-repetitive, so this cuts the md5 calls (the
    # measured hot spot — 120 s of a 100k-doc pair soak) by the
    # batch's duplication factor without changing a single output bit
    vocab: dict[str, int] = {}
    for tk in toks_per_doc:
        for t in tk:
            if t not in vocab:
                vocab[t] = len(vocab)
    shifts = np.arange(bits, dtype=np.uint64)
    if vocab:
        hs = np.frombuffer(
            b"".join(hashlib.md5(t.encode()).digest()[:8] for t in vocab),
            dtype=">u8").astype(np.uint64)
        bit_mat = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    out = np.zeros(len(norms), dtype=np.uint64)
    for idx, tk in enumerate(toks_per_doc):
        if not tk:
            continue
        rows = np.fromiter((vocab[t] for t in tk), dtype=np.int64, count=len(tk))
        votes = bit_mat[rows].sum(axis=0) * 2 >= len(tk)
        out[idx] = (votes.astype(np.uint64) << shifts).sum(dtype=np.uint64)
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(out.astype("int64").tolist(), pa.int64())})


def simhash_table(ds):
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16
SIMHASH_MAX_HAMMING = 3           # pigeonhole: <=3 diff bits -> >=1 shared band
SIMHASH_BROADCAST_MAX_DOCS = 2_000_000  # 16 B/doc driver signature map below


def _popcount64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized SWAR popcount of a uint64 array (numpy<2 has no
    bitwise_count; the unpackbits alternative measured 34 s on a 20M-
    element soak vs <1 s for the 6-op SWAR fold)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x -= (x >> np.uint64(1)) & m1
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


def simhash_dup_pairs(ds, max_hamming: int = SIMHASH_MAX_HAMMING,
                      broadcast_max_docs: int = SIMHASH_BROADCAST_MAX_DOCS,
                      num_partitions: int | None = None,
                      n_docs: int | None = None):
    """SimHash near-dup pairs: 64-bit signature → ``SIMHASH_BANDS``
    16-bit band buckets → candidate pairs → exact hamming verification
    (popcount of xor). Pigeonhole guarantee: a pair within
    ``max_hamming`` <= 3 differing bits shares at least one of the 4
    bands, so candidate RECALL is exact (unlike MinHash-LSH) up to the
    degenerate-bucket chain-link cap — which the SQL oracle mirrors.

    Output: doc_a, doc_b (doc_a < doc_b), hamming.

    Scale: signatures are 8 B/doc; the band exchange carries
    (doc_id, band, int bucket) and verification only ever touches two
    int64s per pair — never text. Size-gated: up to
    ``broadcast_max_docs`` the signature map comes to the driver
    (16 B/doc) and buckets pair in plain Python, verification
    vectorized in one numpy pass; above, band buckets group
    distributed (chain-link cap intact) and each side's signature
    joins back doc_id-keyed. ``n_docs`` as in ``lsh_candidate_pairs``.
    """
    import ray
    import ray.data as rd

    sims = ds.map_batches(simhash_batch, batch_format="pyarrow").materialize()
    if n_docs is None:
        n_docs = sims.count()

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})

    if n_docs <= broadcast_max_docs:
        # fully vectorized driver fold: sort (band, bucket, doc_id)
        # rows once, slice bucket runs, emit pair index arrays with a
        # size-memoized triu (per-group numpy calls at 50µs each would
        # dominate with 10k+ buckets), dedupe cross-band repeats with
        # one np.unique(axis=0), verify with one popcount pass — no
        # Python tuple sets (measured: the set-based fold, not the
        # signature pass, dominated a 1M-pair soak)
        t = sims.to_pandas()
        ids = t["doc_id"].to_numpy(dtype=np.int64)
        hs = t["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, hs = ids[order], hs[order]  # sorted for searchsorted below
        mask = np.uint64((1 << SIMHASH_BAND_BITS) - 1)
        pairs_a: list[np.ndarray] = []
        pairs_b: list[np.ndarray] = []
        triu_memo: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for b in range(SIMHASH_BANDS):
            bucket = ((hs >> np.uint64(b * SIMHASH_BAND_BITS)) & mask) \
                .astype(np.int64)
            srt = np.lexsort((ids, bucket))
            bk, di = bucket[srt], ids[srt]
            starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
            ends = np.r_[starts[1:], len(bk)]
            for s, e in zip(starts, ends):
                k = e - s
                if k < 2:
                    continue
                docs = di[s:e]  # ascending doc_id within the bucket
                if k > MAX_BUCKET_DOCS:
                    pairs_a.append(docs[:-1])
                    pairs_b.append(docs[1:])
                else:
                    if k not in triu_memo:
                        triu_memo[k] = np.triu_indices(k, 1)
                    ii, jj = triu_memo[k]
                    pairs_a.append(docs[ii])
                    pairs_b.append(docs[jj])
        if not pairs_a:
            return rd.from_arrow(empty)
        # verify BEFORE dedup: the popcount filter is 6 vector ops while
        # row-dedup costs a sort, and low-entropy corpora make the raw
        # candidate list many times the survivor set (measured 21.9M raw
        # → 1.04M kept on the replica soak; unique-first took 92 s)
        a = np.concatenate(pairs_a)
        b = np.concatenate(pairs_b)
        ham = _popcount64(np.bitwise_xor(hs[np.searchsorted(ids, a)],
                                         hs[np.searchsorted(ids, b)]))
        keep = ham <= max_hamming
        a, b, ham = a[keep], b[keep], ham[keep]
        if not len(a):
            return rd.from_arrow(empty)
        srt = np.lexsort((b, a))  # lexsort + adjacent-diff dedup beats
        a, b, ham = a[srt], b[srt], ham[srt]  # np.unique(axis=0)'s void sort
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return rd.from_arrow(pa.table({
            "doc_a": pa.array(a[first], pa.int64()),
            "doc_b": pa.array(b[first], pa.int64()),
            "hamming": pa.array(ham[first], pa.int64())}))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, cpus // 2)

    def bands(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.uint64((1 << SIMHASH_BAND_BITS) - 1)
        out_d = np.repeat(ids, SIMHASH_BANDS)
        out_b = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int32), len(ids))
        out_k = np.empty(len(ids) * SIMHASH_BANDS, dtype=np.int64)
        for b in range(SIMHASH_BANDS):
            out_k[b::SIMHASH_BANDS] = \
                ((h >> np.uint64(b * SIMHASH_BAND_BITS)) & mask).astype(np.int64)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "band": pa.array(out_b, pa.int32()),
                         "bucket": pa.array(out_k, pa.int64())})

    def bucket_candidates(df: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})
        if len(df) < 2:
            return e
        pairs = _candidate_pairs(sorted(df["doc_id"].tolist()))
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"]) if pairs else e

    from ray.data.aggregate import Count
    cand_ds = sims.map_batches(bands, batch_format="pyarrow") \
        .groupby(["band", "bucket"]) \
        .map_groups(bucket_candidates, batch_format="pandas") \
        .groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="_n")) \
        .select_columns(["doc_a", "doc_b"])
    sa = sims.map_batches(
        lambda t: pa.table({"_ka": t["doc_id"], "sim_a": t["simhash"]}),
        batch_format="pyarrow")
    sb = sims.map_batches(
        lambda t: pa.table({"_kb": t["doc_id"], "sim_b": t["simhash"]}),
        batch_format="pyarrow")
    j = cand_ds.join(sa, "inner", num_partitions=num_partitions,
                     on=("doc_a",), right_on=("_ka",)) \
        .select_columns(["doc_a", "doc_b", "sim_a"])
    j = j.join(sb, "inner", num_partitions=num_partitions,
               on=("doc_b",), right_on=("_kb",)) \
        .select_columns(["doc_a", "doc_b", "sim_a", "sim_b"])

    def verify(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty
        a = batch["sim_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = batch["sim_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        ham = _popcount64(np.bitwise_xor(a, b))
        keep = ham <= max_hamming
        return pa.table({
            "doc_a": pa.array(
                batch["doc_a"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
            "doc_b": pa.array(
                batch["doc_b"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
            "hamming": pa.array(ham[keep], pa.int64())})

    return j.map_batches(verify, batch_format="pyarrow")


LSH_RECALL_MAX_EXACT_PAIRS = 50_000_000  # projected-pair fail-fast budget


def lsh_recall_report(ds, n_docs: int | None = None,
                      driver_max_docs: int | None = None,
                      max_exact_pairs: int | None = None,
                      sample_mod: int | None = None):
    """Dedup-quality evaluation: how much of the EXACT Jaccard >=
    threshold pair set does the banded MinHash-LSH path recover?
    One row — (n_exact_pairs, n_lsh_pairs, n_common_pairs); recall is
    n_common/n_exact and the LSH false-positive count is
    n_lsh - n_common (0 by construction here, since the LSH path
    verifies candidates with the same exact Jaccard — the report
    PROVES that instead of assuming it).

    Size-gated like its inputs: below ``driver_max_docs`` (defaults to
    the LSH broadcast gate) both pair sets are the sparse duplicate
    fraction of a driver-path corpus, so they come back with
    ``take_all`` and set-intersect in plain Python — no exchange at
    all. At-scale, the report adds ONE exchange over (doc_a, doc_b)
    pair keys (16 B/row + two flag ints) — pairs, not documents — and
    folds to a single row of counts.

    The exact side is inherently quadratic in dup-group size, so it is
    BUDGETED (``max_exact_pairs``, default
    ``LSH_RECALL_MAX_EXACT_PAIRS``): the projected pair-partial count
    is measured from the shingle-group fanout BEFORE any pair
    materializes, and a dup-dense corpus raises a clear ValueError in
    seconds (the r4 VERDICT's hung-cluster finding) instead of
    emitting ~C(k,2) partials per 100-copy group. ``sample_mod=m``
    switches to the estimated mode: the report runs on the
    deterministic hash-sampled doc stratum (``bucket_hash(doc_id, m)
    == 0``, ~1/m of docs, so ~1/m^2 of pairs), and the output row
    discloses ``sample_mod`` and ``n_docs_sampled`` alongside the
    sampled counts — an unbiased recall estimate whenever dup-group
    membership is independent of the id hash (true for content-derived
    duplicates; the hash is content-blind).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .util import bucket_hash, finish_grouped

    if driver_max_docs is None:
        driver_max_docs = LSH_BROADCAST_MAX_DOCS
    if max_exact_pairs is None:
        max_exact_pairs = LSH_RECALL_MAX_EXACT_PAIRS
    if sample_mod is not None:
        def sampled(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return batch.filter(
                pa.array(bucket_hash(ids, sample_mod) == 0))

        ds_s = ds.map_batches(sampled, batch_format="pyarrow") \
            .materialize()
        out = lsh_recall_report(ds_s, n_docs=ds_s.count(),
                                driver_max_docs=driver_max_docs,
                                max_exact_pairs=max_exact_pairs)
        out["sample_mod"] = pd.Series([sample_mod], dtype="int64")
        out["n_docs_sampled"] = pd.Series([ds_s.count()], dtype="int64")
        return out
    if n_docs is None:
        n_docs = ds.count()

    exact = ngram_jaccard_pairs(ds, n_docs=n_docs,
                                max_pairs=max_exact_pairs)
    lsh = lsh_candidate_pairs(ds, n_docs=n_docs)

    if n_docs <= driver_max_docs:
        e_pairs = {(r["doc_a"], r["doc_b"]) for r in exact.take_all()}
        l_pairs = {(r["doc_a"], r["doc_b"]) for r in lsh.take_all()}
        return pd.DataFrame({
            "n_exact_pairs": pd.Series([len(e_pairs)], dtype="int64"),
            "n_lsh_pairs": pd.Series([len(l_pairs)], dtype="int64"),
            "n_common_pairs": pd.Series([len(e_pairs & l_pairs)],
                                        dtype="int64")})

    def tag(is_exact: bool):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            one = np.ones(n, np.int64)
            zero = np.zeros(n, np.int64)
            return pa.table({
                "doc_a": pc.cast(t["doc_a"], pa.int64()),
                "doc_b": pc.cast(t["doc_b"], pa.int64()),
                "f_exact": pa.array(one if is_exact else zero, pa.int64()),
                "f_lsh": pa.array(zero if is_exact else one, pa.int64())})
        return fn

    u = exact.map_batches(tag(True), batch_format="pyarrow") \
        .union(lsh.map_batches(tag(False), batch_format="pyarrow"))
    per_pair = u.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("f_exact", alias_name="f_exact"),
        Sum("f_lsh", alias_name="f_lsh"))

    def partial(t: pa.Table) -> pa.Table:
        fe = t["f_exact"].to_numpy(zero_copy_only=False)
        fl = t["f_lsh"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_exact_pairs": pa.array([int((fe > 0).sum())], pa.int64()),
            "n_lsh_pairs": pa.array([int((fl > 0).sum())], pa.int64()),
            "n_common_pairs": pa.array([int(((fe > 0) & (fl > 0)).sum())],
                                       pa.int64())})

    rows = finish_grouped(
        per_pair.map_batches(partial, batch_format="pyarrow"),
        ["k"]).take_all()
    n_ex = sum(r["n_exact_pairs"] for r in rows)
    n_ls = sum(r["n_lsh_pairs"] for r in rows)
    n_co = sum(r["n_common_pairs"] for r in rows)
    return pd.DataFrame({"n_exact_pairs": pd.Series([n_ex], dtype="int64"),
                         "n_lsh_pairs": pd.Series([n_ls], dtype="int64"),
                         "n_common_pairs": pd.Series([n_co], dtype="int64")})


def _rows_except(ds, drops, broadcast_max_drops: int):
    """Row-preserving size-gated anti-join: every ROW of ``ds`` whose
    ``doc_id`` is not in ``drops`` (``drop_id`` rows), all columns
    kept. The id-only twin is ``_keep_ids_except`` (cheaper above the
    gate — it ships ids through the join, not rows); this variant
    exists for stage chaining in ``corpus_clean_funnel`` where the
    surviving TEXT feeds the next stage."""
    import ray

    drops = drops.materialize()  # consumed by the gate AND the path
    if drops.count() <= broadcast_max_drops:
        drop_list = [r["drop_id"] for r in drops.take_all()]
        ref = ray.put(pa.array(sorted(drop_list), pa.int64()))

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(
                pc.is_in(batch["doc_id"], value_set=ray.get(ref))))

        return ds.map_batches(keep, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 4))
    marked = drops.map_batches(
        lambda b: pa.table({"drop_id": b["drop_id"],
                            "_m": pa.array([1] * len(b), pa.int8())}),
        batch_format="pyarrow")
    j = ds.join(marked, "left_outer", num_partitions=max(2, cpus // 2),
                on=("doc_id",), right_on=("drop_id",))

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["_m"])).drop_columns(["_m"])

    return j.map_batches(keep_unmatched, batch_format="pyarrow")


FUNNEL_DUP_GROUP_BROADCAST_MAX = 10_000_000  # (hash, keep_id) rows
FUNNEL_STAGES = ("raw", "exact_dedup", "near_dup_keep_best",
                 "decontaminate", "quality_gate")


class _FunnelCkpt:
    """Per-stage parquet checkpoints for the cleaning funnel. Each
    completed stage writes its SURVIVORS under ``{root}/{stage}/`` and
    marks completion with a ``_SUCCESS`` file; a re-run loads the
    newest completed prefix of stages and recomputes only what's
    missing. The root lives at ``{output_path}/_ckpt`` — the ``_``
    prefix keeps pyarrow dataset discovery (default ``ignore_prefixes
    = ['.', '_']``) from mixing checkpoints into the cleaned corpus.

    Checkpoints assume the RAW input is immutable between runs (the
    standard contract for resumable batch jobs); stage row counts come
    from the written parquet footers, never a re-scan.
    """

    def __init__(self, root: str):
        self.root = root

    def _dir(self, name: str) -> str:
        return f"{self.root}/{name}"

    def load(self, name: str):
        """(survivor dataset, n_rows) for a completed stage, else
        None. The dataset reads the checkpoint parquet — downstream
        stages scan the (smaller) checkpoint, not the raw chain."""
        import os

        import pyarrow.dataset as pads
        import ray.data as rd

        from .util import strip_schema_metadata

        d = self._dir(name)
        if not os.path.exists(f"{d}/_SUCCESS"):
            return None
        n = pads.dataset(d).count_rows()
        return strip_schema_metadata(rd.read_parquet(d)), n

    def save(self, name: str, stream):
        """Write a stage's survivor stream, mark it complete, and
        return (read-back dataset, n_rows from the footers). A stale
        partial directory (crashed run, no marker) is cleared first so
        the checkpoint never mixes two attempts."""
        import os
        import shutil

        d = self._dir(name)
        if os.path.exists(d):
            shutil.rmtree(d)
        stream.write_parquet(d)
        with open(f"{d}/_SUCCESS", "w"):
            pass
        loaded = self.load(name)
        assert loaded is not None
        return loaded


def corpus_clean_funnel(ds, n_docs: int | None = None,
                        dup_group_broadcast_max: int = FUNNEL_DUP_GROUP_BROADCAST_MAX,
                        broadcast_max_drops: int = SURVIVOR_BROADCAST_MAX,
                        broadcast_max_cluster_docs: int = KEEP_BEST_BROADCAST_MAX,
                        decontam_broadcast_max: int | None = None,
                        output_path: str | None = None,
                        checkpoint_stages: bool = False):
    """The end-to-end corpus-cleaning FUNNEL a training-data run ships
    as its headline report: raw -> exact dedup (keep-first by content
    fingerprint) -> near-dup keep-best -> benchmark decontamination ->
    quality gate, with the surviving doc count after each stage.
    Output: (stage_idx, stage, n_docs) — 5 rows, integers. With
    ``output_path`` set, the final survivors are WRITTEN as parquet
    (one file per block; read back with ``io.read_documents``) and the
    terminal count comes from the written footers — production mode,
    exposed as the ``clean`` CLI subcommand.

    Composition semantics (each stage sees the SURVIVORS of the one
    before, exactly as chained cleaning jobs would):

    - exact dedup drops every doc that is not the min doc_id of its
      fingerprint group. The drop resolution is gated on the number of
      DUPLICATED groups (sparse): below the gate the (hash -> keeper)
      map broadcasts once; above it the hash rows join the duplicated
      groups hash-partitioned on text_hash.
    - near-dup keep-best reuses ``_keep_best_drops`` over the stage-1
      survivor stream (clusters computed on survivors — a doc deduped
      exactly is not eligible to win a near-dup cluster).
    - decontamination drops survivors whose fingerprint collides with
      the benchmark set, which is defined on the RAW corpus
      (``doc_id % DECONTAM_MODULUS == 0``) — the benchmark is external
      to the cleaning chain and must not shrink with it.
    - quality gate applies ``quality_gate_batch``'s Gopher rules.

    Scale shape: no stage materializes surviving TEXT — survivor
    streams are lazy chained anti-filters (broadcast id sets below the
    gates, hash-partitioned joins above), drop sets are the sparse
    fraction and are the only thing counted; stage counts derive as
    ``n_prev - |drops|``. The whole funnel costs ~6 corpus scans
    (hash pass, LSH pass, clustered-lens pass, bench pass, survivor
    hash pass, quality pass) — the same passes running the four ops
    separately would cost, now over progressively smaller streams.
    """
    from .text import quality_gate_batch
    from .util import finish_grouped

    ckpt = None
    if checkpoint_stages:
        if output_path is None:
            raise ValueError("checkpoint_stages requires output_path")
        ckpt = _FunnelCkpt(f"{output_path}/_ckpt")

    n_raw, n_exact, n_near, n_decon, _ds2, _ds3, ds4 = _funnel_chain(
        ds, n_docs, dup_group_broadcast_max, broadcast_max_drops,
        broadcast_max_cluster_docs, decontam_broadcast_max, ckpt=ckpt)

    # ---- stage 4: quality gate (the funnel's terminus) ----
    if output_path is not None:
        # production mode: WRITE the cleaned corpus (partitioned
        # parquet, one file per block) and count from the written
        # footers — one execution of the chain, resumable consumers
        # read the directory back with io.read_documents
        import os

        import pyarrow.dataset as pads

        def quality_rows(batch: pa.Table) -> pa.Table:
            q = quality_gate_batch(batch)
            return batch.filter(pc.equal(q["keep"], 1))

        # in checkpoint mode the terminus is itself resumable: a
        # completed write (marker present) is counted from its footers
        # and never recomputed (pads.dataset ignores the _-prefixed
        # marker and the _ckpt stage dirs)
        done = f"{output_path}/_SUCCESS"
        if not (ckpt is not None and os.path.exists(done)):
            if ckpt is not None and os.path.isdir(output_path):
                # an UNMARKED terminus is a crashed/stale write:
                # clear its fragments (never the _-prefixed
                # checkpoint dirs/markers) or the rewrite would
                # append alongside them and double-count
                for f in os.listdir(output_path):
                    if not f.startswith(("_", ".")):
                        os.remove(f"{output_path}/{f}")
            ds4.map_batches(quality_rows, batch_format="pyarrow") \
                .write_parquet(output_path)
            if ckpt is not None:
                with open(done, "w"):
                    pass
        n_quality = sum(f.count_rows()
                        for f in pads.dataset(output_path).get_fragments())
    else:
        def kept_partial(batch: pa.Table) -> pa.Table:
            q = quality_gate_batch(batch)
            return pa.table({"k": pa.array([0], pa.int64()),
                             "n": pa.array(
                                 [int(pc.sum(q["keep"]).as_py() or 0)],
                                 pa.int64())})

        kept_rows = finish_grouped(
            ds4.map_batches(kept_partial, batch_format="pyarrow"),
            ["k"]).take_all()
        n_quality = sum(r["n"] for r in kept_rows)

    counts = [n_raw, n_exact, n_near, n_decon, n_quality]
    return pd.DataFrame({
        "stage_idx": pd.Series(range(len(FUNNEL_STAGES)), dtype="int64"),
        "stage": list(FUNNEL_STAGES),
        "n_docs": pd.Series(counts, dtype="int64"),
    })


def _funnel_chain(ds, n_docs, dup_group_broadcast_max,
                  broadcast_max_drops, broadcast_max_cluster_docs,
                  decontam_broadcast_max, ckpt=None):
    """Stages 1-3 of the cleaning funnel as LAZY survivor streams:
    returns ``(n_raw, n_exact, n_near, n_decon, ds2, ds3, ds4)``.
    Shared by ``corpus_clean_funnel`` (scalar report / production
    write) and ``corpus_clean_funnel_by_source`` (per-source
    attribution) — the stage semantics live HERE once.

    ``ckpt`` (a ``_FunnelCkpt``): each stage's survivors persist as
    parquet when the stage completes, a completed stage LOADS instead
    of recomputing (its lazy upstream graph is simply discarded), and
    downstream stages scan the smaller checkpoint instead of the
    raw-corpus anti-filter chain. ``None`` keeps the lazy chained
    behavior unchanged."""
    import ray
    from ray.data.aggregate import Count, Min

    from .text import DECONTAM_MODULUS, fingerprint_batch

    n_raw = ds.count() if n_docs is None else n_docs

    hit1 = ckpt.load("stage1_exact") if ckpt is not None else None
    hit2 = ckpt.load("stage2_keepbest") if ckpt is not None else None
    hit3 = ckpt.load("stage3_decontam") if ckpt is not None else None

    if hit1 is not None:
        ds2, n_exact = hit1
        ds3, n_near = _funnel_stage2(
            ds2, n_exact, broadcast_max_cluster_docs, broadcast_max_drops,
            ckpt, hit2)
        ds4, n_decon = _funnel_stage3(
            ds, ds3, n_near, decontam_broadcast_max, broadcast_max_drops,
            ckpt, hit3 if hit2 is not None else None)
        return n_raw, n_exact, n_near, n_decon, ds2, ds3, ds4

    # ---- stage 1: exact dedup (keep-first per fingerprint) ----
    hashed = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    groups = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"))
    dup_groups = groups.map_batches(
        lambda t: t.filter(pc.greater(t["n_copies"], 1))
        .select(["text_hash", "keep_doc_id"]),
        batch_format="pyarrow").materialize()

    if dup_groups.count() <= dup_group_broadcast_max:
        dmap = {r["text_hash"]: r["keep_doc_id"]
                for r in dup_groups.take_all()}
        ref = ray.put(dmap)

        def exact_drops(batch: pa.Table) -> pa.Table:
            dm = ray.get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.array([dm.get(h, -1)
                             for h in batch["text_hash"].to_pylist()],
                            np.int64)
            return pa.table({"drop_id": pa.array(
                ids[(keep >= 0) & (keep != ids)], pa.int64())})

        drops1 = hashed.map_batches(exact_drops, batch_format="pyarrow")
    else:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        j = hashed.join(dup_groups, "inner",
                        num_partitions=max(2, cpus // 2),
                        on=("text_hash",))
        drops1 = j.map_batches(
            lambda t: pa.table({"drop_id": t.filter(pc.not_equal(
                t["doc_id"], t["keep_doc_id"]))["doc_id"]}),
            batch_format="pyarrow")

    drops1 = drops1.materialize()
    n_exact = n_raw - drops1.count()
    ds2 = _rows_except(ds, drops1, broadcast_max_drops)
    if ckpt is not None:
        ds2, n_ck = ckpt.save("stage1_exact", ds2)
        assert n_ck == n_exact, (n_ck, n_exact)

    # a checkpoint is honored only as part of a completed PREFIX of
    # stages — stage 1 just recomputed, so 2/3 recompute too
    ds3, n_near = _funnel_stage2(
        ds2, n_exact, broadcast_max_cluster_docs, broadcast_max_drops,
        ckpt, None)
    ds4, n_decon = _funnel_stage3(
        ds, ds3, n_near, decontam_broadcast_max, broadcast_max_drops,
        ckpt, None)
    return n_raw, n_exact, n_near, n_decon, ds2, ds3, ds4


def _funnel_stage2(ds2, n_exact, broadcast_max_cluster_docs,
                   broadcast_max_drops, ckpt, hit):
    """Funnel stage 2 (near-dup keep-best over the exact survivors);
    returns ``(ds3, n_near)``, loading / saving the checkpoint when
    ``ckpt`` is set."""
    if hit is not None:
        return hit
    drops2 = _keep_best_drops(
        ds2, broadcast_max_cluster_docs, n_docs=n_exact).materialize()
    n_near = n_exact - drops2.count()
    ds3 = _rows_except(ds2, drops2, broadcast_max_drops)
    if ckpt is not None:
        ds3, n_ck = ckpt.save("stage2_keepbest", ds3)
        assert n_ck == n_near, (n_ck, n_near)
    return ds3, n_near


def _funnel_stage3(ds, ds3, n_near, decontam_broadcast_max,
                   broadcast_max_drops, ckpt, hit):
    """Funnel stage 3 (decontaminate vs the RAW-corpus benchmark set —
    ``ds`` is the raw corpus, the benchmark must not shrink with the
    chain); returns ``(ds4, n_decon)``."""
    import ray
    from ray.data.aggregate import Count

    from .text import DECONTAM_MODULUS, fingerprint_batch

    if hit is not None:
        return hit

    def bench_hashes(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(ids % DECONTAM_MODULUS == 0))
        return pa.table({"text_hash": pc.unique(
            fingerprint_batch(sel)["text_hash"].combine_chunks())})

    from .text import DECONTAM_BROADCAST_MAX
    if decontam_broadcast_max is None:
        decontam_broadcast_max = DECONTAM_BROADCAST_MAX

    bench = ds.map_batches(bench_hashes, batch_format="pyarrow") \
        .groupby("text_hash").aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).materialize()

    if bench.count() <= decontam_broadcast_max:
        bl = pa.array([r["text_hash"] for r in bench.take_all()],
                      pa.string())
        blref = ray.put(bl)

        def contaminated(batch: pa.Table) -> pa.Table:
            h = fingerprint_batch(batch)
            hits = pc.is_in(h["text_hash"], value_set=ray.get(blref))
            return pa.table({"drop_id": h.filter(hits)["doc_id"]})

        drops3 = ds3.map_batches(contaminated, batch_format="pyarrow")
    else:
        # benchmark side scales with the corpus: hash-partitioned
        # inner join of survivor fingerprints vs the bench hashes —
        # matches ARE the drop set (same shape as text.decontaminate's
        # above-gate arm)
        cpus = int(ray.cluster_resources().get("CPU", 4))
        surv_h = ds3.map_batches(
            lambda t: fingerprint_batch(t), batch_format="pyarrow")
        jm = surv_h.join(bench.map_batches(
            lambda t: pa.table({"bh": t["text_hash"]}),
            batch_format="pyarrow"), "inner",
            num_partitions=_nparts(n_near, cpus),
            on=("text_hash",), right_on=("bh",))
        drops3 = jm.map_batches(
            lambda t: pa.table({"drop_id": t["doc_id"]}),
            batch_format="pyarrow")

    drops3 = drops3.materialize()
    n_decon = n_near - drops3.count()
    ds4 = _rows_except(ds3, drops3, broadcast_max_drops)
    if ckpt is not None:
        ds4, n_ck = ckpt.save("stage3_decontam", ds4)
        assert n_ck == n_decon, (n_ck, n_decon)
    return ds4, n_decon


def dup_source_matrix(ds, n_docs: int | None = None,
                      broadcast_max_docs: int = LSH_BROADCAST_MAX_DOCS,
                      num_partitions: int | None = None):
    """Cross-source duplication matrix: for every near-dup pair
    (MinHash-LSH, exact-verified), which SOURCES the two members came
    from — (source_a, source_b, n_pairs) with the source pair in
    lexicographic order. The report a mixture planner reads to find
    which feeds duplicate each other (and themselves: the diagonal).

    Size-gated: below ``broadcast_max_docs`` the (doc_id -> source)
    map broadcasts once via ``ray.put`` and the sparse pair stream
    annotates + folds on the driver; above it the pair stream joins
    the pruned (doc_id, source) projection TWICE, hash-partitioned on
    the pair's doc ids — pairs are the sparse duplicate fraction, so
    both joins move pair-proportional rows, never the corpus.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .util import finish_grouped

    if n_docs is None:
        n_docs = ds.count()
    pairs = lsh_candidate_pairs(ds, n_docs=n_docs)

    empty = pd.DataFrame({
        "source_a": pd.Series([], dtype=object),
        "source_b": pd.Series([], dtype=object),
        "n_pairs": pd.Series([], dtype="int64")})

    def src_project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["doc_id"], pa.int64()),
                         "source": batch["source"]})

    if n_docs <= broadcast_max_docs:
        rows = ds.map_batches(src_project, batch_format="pyarrow").take_all()
        smap = {r["doc_id"]: r["source"] for r in rows}
        ref = ray.put(smap)

        def annotate(batch: pa.Table) -> pa.Table:
            sm = ray.get(ref)
            sa, sb = [], []
            for a, b in zip(batch["doc_a"].to_pylist(),
                            batch["doc_b"].to_pylist()):
                x, y = sm[a], sm[b]
                if y < x:
                    x, y = y, x
                sa.append(x)
                sb.append(y)
            return pa.table({"source_a": pa.array(sa, pa.string()),
                             "source_b": pa.array(sb, pa.string())})

        ann = pairs.map_batches(annotate, batch_format="pyarrow").take_all()
        if not ann:
            return empty
        df = pd.DataFrame(ann).groupby(["source_a", "source_b"],
                                       as_index=False).size() \
            .rename(columns={"size": "n_pairs"})
        df["n_pairs"] = df["n_pairs"].astype("int64")
        return df.sort_values(["source_a", "source_b"]) \
            .reset_index(drop=True)

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, cpus // 2)

    src = ds.map_batches(src_project, batch_format="pyarrow")
    sa = src.map_batches(lambda t: pa.table({"_ka": t["doc_id"],
                                             "src_a": t["source"]}),
                         batch_format="pyarrow")
    sb = src.map_batches(lambda t: pa.table({"_kb": t["doc_id"],
                                             "src_b": t["source"]}),
                         batch_format="pyarrow")
    j = pairs.select_columns(["doc_a", "doc_b"]) \
        .join(sa, "inner", num_partitions=num_partitions,
              on=("doc_a",), right_on=("_ka",)) \
        .join(sb, "inner", num_partitions=num_partitions,
              on=("doc_b",), right_on=("_kb",))

    def partial(batch: pa.Table) -> pa.Table:
        a = batch["src_a"].to_pylist()
        b = batch["src_b"].to_pylist()
        lo = [x if x <= y else y for x, y in zip(a, b)]
        hi = [y if x <= y else x for x, y in zip(a, b)]
        return pa.table({"source_a": pa.array(lo, pa.string()),
                         "source_b": pa.array(hi, pa.string())}) \
            .group_by(["source_a", "source_b"]) \
            .aggregate([("source_b", "count")]) \
            .rename_columns(["source_a", "source_b", "n_pairs"])

    out = finish_grouped(j.map_batches(partial, batch_format="pyarrow"),
                         ["source_a", "source_b"])

    def order(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["source_a", "source_b"]) \
            .reset_index(drop=True)

    return out.repartition(1).map_batches(order, batch_format="pandas")


def corpus_clean_funnel_by_source(ds, n_docs: int | None = None,
                                  dup_group_broadcast_max: int = FUNNEL_DUP_GROUP_BROADCAST_MAX,
                                  broadcast_max_drops: int = SURVIVOR_BROADCAST_MAX,
                                  broadcast_max_cluster_docs: int = KEEP_BEST_BROADCAST_MAX,
                                  decontam_broadcast_max: int | None = None):
    """The cleaning funnel ATTRIBUTED per source: for every stage of
    ``corpus_clean_funnel``, how many docs of each source survive —
    (source, stage_idx, stage, n_docs), sources x stages rows. The
    report that tells a mixture planner WHICH feeds are dirty: a
    source losing most of its mass at near-dup or quality is priced
    accordingly.

    Same stage semantics and gates as ``corpus_clean_funnel`` (the
    scalar funnel's total at each stage equals this report's per-stage
    column sum — pinned by a test). Per-source counts come from one
    bounded-key (source) partial aggregate over each LAZY survivor
    stream — three extra filtered corpus passes, never a
    materialization; a source with zero survivors at a stage drops out
    of that stage's rows (same as the SQL GROUP BY twin).
    """
    from .util import finish_grouped
    from .text import quality_gate_batch

    def source_counts(stream, quality_only: bool = False):
        def partial(batch: pa.Table) -> pa.Table:
            if quality_only:
                q = quality_gate_batch(batch)
                batch = batch.filter(pc.equal(q["keep"], 1))
            return pa.table({"source": batch["source"]}) \
                .group_by("source").aggregate([("source", "count")]) \
                .rename_columns(["source", "n_docs"])

        rows = finish_grouped(
            stream.map_batches(partial, batch_format="pyarrow"),
            ["source"]).take_all()
        return {r["source"]: r["n_docs"] for r in rows}

    _, _, _, _, ds2, ds3, ds4 = _funnel_chain(
        ds, n_docs, dup_group_broadcast_max, broadcast_max_drops,
        broadcast_max_cluster_docs, decontam_broadcast_max)

    stage_counts = [
        source_counts(ds),
        source_counts(ds2),
        source_counts(ds3),
        source_counts(ds4),
        source_counts(ds4, quality_only=True),
    ]
    rows = []
    for idx, (stage, counts) in enumerate(zip(FUNNEL_STAGES, stage_counts)):
        for source in sorted(counts):
            rows.append((source, idx, stage, counts[source]))
    out = pd.DataFrame(rows, columns=["source", "stage_idx", "stage",
                                      "n_docs"])
    out["stage_idx"] = out["stage_idx"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["source", "stage_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# incremental cleaning (CDC-driven funnel — the production recrawl loop)
# ---------------------------------------------------------------------------

# per-doc derived features the funnel consumes past stage 1, persisted
# for the STAGE-1 SURVIVORS of each clean so the next run re-derives
# them only for the survivor-delta (featuring the whole corpus would
# out-work the from-scratch funnel on a dup-dense crawl, where
# survivors are a tiny fraction — measured on the 100x replica soak)
FUNNEL_MANIFEST_COLS = (
    ["doc_id", "text_hash", "n_chars", "quality_keep"]
    + [f"band_{b}" for b in range(LSH_BANDS)])
INC_REBUILD_DELTA_FRAC_E6 = 500_000  # delta > 50% of corpus -> full rebuild


def funnel_manifest_batch(batch: pa.Table) -> pa.Table:
    """One doc's worth of every PER-DOC-PURE feature the funnel
    consumes past stage 1: content fingerprint, normalized length
    (keep-best ranking), quality-gate verdict (stage 4), and the LSH
    band keys (stage 2 candidate generation). All are functions of the
    doc's own text alone — exactly what makes them reusable across
    crawls for unchanged docs."""
    from .text import fingerprint_batch, quality_gate_batch

    h = fingerprint_batch(batch)
    norms = _norm(batch["text"])
    q = quality_gate_batch(batch)
    cols = {
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "text_hash": h["text_hash"],
        "n_chars": pa.array([len(s) for s in norms], pa.int64()),
        "quality_keep": q["keep"],
    }
    sigs = minhash_signatures_for(norms)
    for b in range(LSH_BANDS):
        cols[f"band_{b}"] = pa.array(
            [_band_key(sig, b) for sig in sigs], pa.string())
    return pa.table(cols)


def _stage1_drops(hashed, n_rows: int,
                  dup_group_broadcast_max: int = FUNNEL_DUP_GROUP_BROADCAST_MAX):
    """Exact-dedup drop ids (non-min doc per fingerprint group) from a
    (doc_id, text_hash) Dataset — the funnel's stage-1 contract at the
    id level, size-gated exactly like ``_funnel_chain``: the sparse
    duplicated-group map broadcasts below the gate (no second pass of
    the hash rows through an exchange), hash-partitioned join above.
    Returns a materialized ``drop_id`` Dataset."""
    import ray
    from ray.data.aggregate import Count, Min

    groups = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"))
    dup_groups = groups.map_batches(
        lambda t: t.filter(pc.greater(t["n_copies"], 1))
        .select(["text_hash", "keep_doc_id"]),
        batch_format="pyarrow").materialize()

    if dup_groups.count() <= dup_group_broadcast_max:
        dmap = {r["text_hash"]: r["keep_doc_id"]
                for r in dup_groups.take_all()}
        ref = ray.put(dmap)

        def exact_drops(batch: pa.Table) -> pa.Table:
            dm = ray.get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.array([dm.get(h, -1)
                             for h in batch["text_hash"].to_pylist()],
                            np.int64)
            return pa.table({"drop_id": pa.array(
                ids[(keep >= 0) & (keep != ids)], pa.int64())})

        return hashed.map_batches(exact_drops,
                                  batch_format="pyarrow").materialize()

    cpus = int(ray.cluster_resources().get("CPU", 4))
    j = hashed.join(dup_groups, "inner",
                    num_partitions=_nparts(n_rows, cpus),
                    on=("text_hash",))
    return j.map_batches(
        lambda t: pa.table({"drop_id": t.filter(pc.not_equal(
            t["doc_id"], t["keep_doc_id"]))["doc_id"]}),
        batch_format="pyarrow").materialize()


def write_funnel_manifest(ds, path: str, n_docs: int | None = None) -> int:
    """Persist the incremental-cleaning manifest for a corpus:
    ``{path}/hashes`` — (doc_id, text_hash) for EVERY doc (the CDC
    detection side), and ``{path}/features`` — the full per-doc
    feature rows for the corpus's STAGE-1 SURVIVORS only (the only
    docs whose features any funnel stage ever reads; non-survivors die
    on their hash). In production both passes fuse with the cleaning
    run itself. Returns the featured-survivor row count."""
    import os
    import shutil

    import pyarrow.dataset as pads

    from .text import fingerprint_batch

    import ray.data as rd

    from .util import strip_schema_metadata

    if os.path.exists(path):
        shutil.rmtree(path)
    hashed = ds.map_batches(fingerprint_batch,
                            batch_format="pyarrow").materialize()
    hashed.write_parquet(f"{path}/hashes")
    n_rows = hashed.count() if n_docs is None else n_docs
    drops = _stage1_drops(hashed, n_rows)
    _rows_except(ds, drops, SURVIVOR_BROADCAST_MAX) \
        .map_batches(funnel_manifest_batch, batch_format="pyarrow") \
        .write_parquet(f"{path}/features")
    # the verified-pair memo: ALL candidates over the survivor
    # features with their exact Jaccard (pass AND fail), so the next
    # incremental run re-verifies only delta-involved pairs
    feats = strip_schema_metadata(
        rd.read_parquet(f"{path}/features")).materialize()
    _verified_candidates(feats, ds, None, set(), {}) \
        .write_parquet(f"{path}/pairs")
    with open(f"{path}/_SUCCESS", "w"):
        pass
    return pads.dataset(f"{path}/features").count_rows()


def corpus_clean_funnel_incremental(
        new_ds, manifest_path: str, n_docs: int | None = None,
        driver_max_docs: int = LSH_BROADCAST_MAX_DOCS,
        rebuild_delta_frac_e6: int = INC_REBUILD_DELTA_FRAC_E6,
        output_path: str | None = None,
        output_manifest_path: str | None = None,
        return_stats: bool = False):
    """The cleaning funnel over a NEW crawl snapshot, reusing the
    previous run's manifest so the expensive TEXT passes run only over
    the recrawl delta:

    - pass 1 (all new docs): content fingerprint — the CDC detection
      itself (a crawler that ships change hints can skip even this);
    - pass 2 (stage-1 SURVIVORS that are changed/added or absent from
      the feature manifest, ONLY): the full feature derivation
      (normalize, shingle, minhash bands, quality rules) —
      survivor-driven, so a dup-dense crawl features at most what the
      from-scratch funnel would shingle;
    - pass 3 (sparse): normalized text for docs appearing in LSH
      candidate pairs, fetched by id for exact Jaccard verification.

    Every funnel STAGE runs at the id/feature level (hash-row groupby,
    band-bucket grouping, union-find, integer ranking), so the result
    is BIT-IDENTICAL to ``corpus_clean_funnel(new_ds)`` from scratch —
    same keepers, same clusters, same winners, same gates (tested:
    ``tests/test_funnel_incremental.py``; 500k-doc distributed soak in
    SCALE.md) — while unchanged docs are never re-normalized,
    re-shingled or re-scored.

    A delta above ``rebuild_delta_frac_e6`` (default 50%) of the new
    corpus means the manifest buys little; the run falls back to the
    from-scratch funnel and says so in the stats (``mode``). Output:
    the same 5-row (stage_idx, stage, n_docs) report; ``output_path``
    writes the cleaned survivors as parquet, ``output_manifest_path``
    writes the NEXT run's manifest (closing the production loop);
    ``return_stats`` adds the delta/compute counters.

    At-scale: below ``driver_max_docs`` the id-level folds run on the
    driver (the LSH broadcast-gate pattern — band keys and hash rows
    are ~100 B/doc); above it they run as the same Dataset exchanges
    the from-scratch funnel uses, with the sparse delta/needed-id sets
    riding the size-gated semi/anti-join helpers. Both the manifest
    and the snapshot are partitioned parquet, so at 10^12 docs every
    input streams.
    """
    import os

    from .text import fingerprint_batch

    if not os.path.exists(f"{manifest_path}/_SUCCESS"):
        raise ValueError(
            f"funnel manifest at {manifest_path} is missing or "
            "incomplete — run write_funnel_manifest (or a prior "
            "incremental clean with output_manifest_path) first")

    n_new = new_ds.count() if n_docs is None else n_docs

    # ---- pass 1: fingerprint the new crawl (CDC detection) ----
    newh = new_ds.map_batches(fingerprint_batch, batch_format="pyarrow") \
        .materialize()

    if n_new > driver_max_docs:
        return _funnel_incremental_distributed(
            new_ds, newh, manifest_path, n_new, rebuild_delta_frac_e6,
            output_path, output_manifest_path, return_stats)

    # ---- driver arm (id-level folds on the gated corpus) ----
    import ray
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    man_h = pads.dataset(f"{manifest_path}/hashes").to_table().to_pandas()
    man_f = pads.dataset(f"{manifest_path}/features").to_table().to_pandas()
    nh = pd.DataFrame(newh.take_all())

    m = nh.merge(man_h, on="doc_id", how="left", suffixes=("", "_old"))
    unchanged = m["text_hash_old"].notna() \
        & (m["text_hash"] == m["text_hash_old"])
    delta_ids = m.loc[~unchanged, "doc_id"].to_numpy(np.int64)
    stats = {"mode": "incremental", "n_new": int(n_new),
             "n_unchanged": int(unchanged.sum()),
             "n_delta": int(len(delta_ids)),
             "n_deleted": int(len(set(man_h["doc_id"])
                              - set(nh["doc_id"]))),
             "n_text_featured": 0, "n_text_verify_fetched": 0,
             "n_pair_memo_hits": 0}

    if n_new and len(delta_ids) * 1_000_000 > rebuild_delta_frac_e6 * n_new:
        stats["mode"] = "full_rebuild"
        report = corpus_clean_funnel(new_ds, n_docs=n_new,
                                     output_path=output_path)
        if output_manifest_path is not None:
            write_funnel_manifest(new_ds, output_manifest_path,
                                  n_docs=n_new)
        stats["n_text_featured"] = int(n_new)
        return (report, stats) if return_stats else report

    # ---- stage 1: exact dedup from the hash rows alone ----
    keep1 = nh.groupby("text_hash")["doc_id"].transform("min")
    s1_ids = nh.loc[nh["doc_id"] == keep1, "doc_id"].to_numpy(np.int64)
    n_exact = len(s1_ids)

    # ---- pass 2: features for survivor-delta only ----
    unchanged_ids = m.loc[unchanged, "doc_id"].to_numpy(np.int64)
    reusable = man_f[man_f["doc_id"].isin(unchanged_ids)
                     & man_f["doc_id"].isin(s1_ids)]
    need = np.setdiff1d(s1_ids, reusable["doc_id"].to_numpy(np.int64))
    if len(need):
        nref = ray.put(pa.array(np.sort(need), pa.int64()))

        def need_only(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(pc.cast(batch["doc_id"], pa.int64()),
                         value_set=ray.get(nref)))

        computed = pd.DataFrame(
            new_ds.map_batches(need_only, batch_format="pyarrow")
            .map_batches(funnel_manifest_batch, batch_format="pyarrow")
            .take_all(), columns=FUNNEL_MANIFEST_COLS)
    else:
        computed = pd.DataFrame(
            {c: pd.Series([], dtype="object")
             for c in FUNNEL_MANIFEST_COLS})
    stats["n_text_featured"] = len(computed)
    feats1 = pd.concat([reusable[list(FUNNEL_MANIFEST_COLS)], computed],
                       ignore_index=True).astype({
                           "doc_id": "int64", "n_chars": "int64",
                           "quality_keep": "int64"})

    # ---- stage 2: near-dup keep-best over stage-1 survivors ----
    from collections import defaultdict
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    ids1 = feats1["doc_id"].to_numpy(np.int64)
    for b in range(LSH_BANDS):
        for d, key in zip(ids1.tolist(), feats1[f"band_{b}"].tolist()):
            buckets[(b, key)].append(d)
    cand: set[tuple[int, int]] = set()
    for docs in buckets.values():
        if len(docs) >= 2:
            cand.update(_candidate_pairs(sorted(docs)))

    # memoized verification: prior-run jaccards apply to any pair
    # whose BOTH texts are unchanged (includes failed verifications,
    # so dup-free candidate collisions never re-fetch either)
    memo = _load_pair_memo(manifest_path)
    delta_set = set(delta_ids.tolist())
    all_pairs: list[tuple[int, int, int]] = []  # next run's memo
    fetch_pairs: list[tuple[int, int]] = []
    for a, b in sorted(cand):
        j = memo.get((a, b)) if memo else None
        if j is not None and a not in delta_set and b not in delta_set:
            all_pairs.append((a, b, j))
        else:
            fetch_pairs.append((a, b))
    stats["n_pair_memo_hits"] = len(all_pairs)
    if fetch_pairs:
        # ---- pass 3: fetch norm text ONLY for memo-miss members ----
        need_t = np.array(sorted({d for p in fetch_pairs for d in p}),
                          np.int64)
        tref = ray.put(pa.array(need_t, pa.int64()))

        def need_norm(batch: pa.Table) -> pa.Table:
            sel = batch.filter(
                pc.is_in(pc.cast(batch["doc_id"], pa.int64()),
                         value_set=ray.get(tref)))
            return pa.table({
                "doc_id": pc.cast(sel["doc_id"], pa.int64()),
                "norm_text": pa.array(_norm(sel["text"]), pa.string())})

        texts = {r["doc_id"]: r["norm_text"] for r in new_ds.map_batches(
            need_norm, batch_format="pyarrow").take_all()}
        stats["n_text_verify_fetched"] = len(texts)
        for a, b in fetch_pairs:
            all_pairs.append((a, b, _jaccard_e6(texts[a], texts[b])))
    verified = [(a, b, j) for a, b, j in all_pairs
                if j >= JACCARD_THRESHOLD_E6]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in verified:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    cid = {d: find(d) for d in parent}
    clustered = feats1[feats1["doc_id"].isin(cid)].copy()
    clustered["cluster_id"] = clustered["doc_id"].map(cid)
    clustered = clustered.sort_values(
        ["cluster_id", "n_chars", "doc_id"],
        ascending=[True, False, True], kind="stable")
    best = set(clustered.groupby("cluster_id", sort=False)
               .head(1)["doc_id"])
    drops2 = set(cid) - best
    s2 = feats1[~feats1["doc_id"].isin(drops2)]
    n_near = len(s2)

    # ---- stage 3: decontaminate vs the RAW new-corpus benchmark ----
    from .text import DECONTAM_MODULUS
    bench = set(nh.loc[nh["doc_id"] % DECONTAM_MODULUS == 0,
                       "text_hash"])
    s3 = s2[~s2["text_hash"].isin(bench)]
    n_decon = len(s3)

    # ---- stage 4: quality gate (manifest verdicts) ----
    n_quality = int(s3["quality_keep"].sum())

    if output_path is not None:
        import ray.data as rd
        surv = s3.loc[s3["quality_keep"] == 1, "doc_id"] \
            .to_numpy(np.int64)
        _write_survivor_rows(new_ds, rd.from_arrow(pa.table(
            {"drop_id": pa.array(np.sort(surv), pa.int64())})),
            output_path)
    if output_manifest_path is not None:
        pairs_df = pd.DataFrame(all_pairs,
                                columns=["doc_a", "doc_b", "jaccard_e6"])
        _write_manifest_frames(nh, feats1, pairs_df,
                               output_manifest_path)

    report = pd.DataFrame({
        "stage_idx": pd.Series(range(len(FUNNEL_STAGES)), dtype="int64"),
        "stage": list(FUNNEL_STAGES),
        "n_docs": pd.Series([n_new, n_exact, n_near, n_decon, n_quality],
                            dtype="int64")})
    return (report, stats) if return_stats else report


def _nparts(n_rows: int, cpus: int, rows_per_partition: int = 65_536) -> int:
    """Join partition count sized DOWN by the SPARSE side's rows: a
    hash-join partition that receives zero rows has no schema to key
    (pyarrow raises 'No match ... on left side'), and join aggregators
    are actors whose startup is pure tax on small inputs (CLAUDE.md
    join rule)."""
    return max(2, min(cpus // 2, -(-max(n_rows, 1) // rows_per_partition)))


def _rows_in(ds, ids, broadcast_max: int):
    """Row-preserving size-gated SEMI-join twin of ``_rows_except``:
    every row of ``ds`` whose ``doc_id`` IS in ``ids`` (``drop_id``
    rows — the column name is shared so both helpers consume the same
    id streams). Broadcast ``is_in`` below the gate, inner hash join
    above."""
    import ray

    ids = ids.materialize()
    n_ids = ids.count()
    if n_ids <= broadcast_max:
        id_list = [r["drop_id"] for r in ids.take_all()]
        ref = ray.put(pa.array(sorted(id_list), pa.int64()))

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(pc.cast(batch["doc_id"], pa.int64()),
                         value_set=ray.get(ref)))

        return ds.map_batches(keep, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 4))
    marked = ids.map_batches(
        lambda b: pa.table({"drop_id": b["drop_id"]}),
        batch_format="pyarrow")
    j = ds.join(marked, "inner", num_partitions=_nparts(n_ids, cpus),
                on=("doc_id",), right_on=("drop_id",))
    keep_cols = [c for c in (ds.schema().names or []) if c != "drop_id"]
    return j.select_columns(keep_cols)


def _ids_only(ds):
    return ds.map_batches(
        lambda b: pa.table({"drop_id": pc.cast(b["doc_id"], pa.int64())}),
        batch_format="pyarrow")


def _funnel_incremental_distributed(new_ds, newh, manifest_path: str,
                                    n_new: int, rebuild_delta_frac_e6: int,
                                    output_path, output_manifest_path,
                                    return_stats: bool):
    """Above-gate arm of ``corpus_clean_funnel_incremental``: the same
    survivor-driven stages as the driver arm, expressed as the Dataset
    exchanges the from-scratch funnel uses. Text passes stay
    delta-bounded (the sparse needed-id sets ride the size-gated
    semi/anti-join helpers); features for reusable survivors stream
    from the manifest parquet."""
    import ray
    import ray.data as rd

    from .util import bucket_count, bucket_hash, strip_schema_metadata

    cpus = int(ray.cluster_resources().get("CPU", 4))
    man_h = strip_schema_metadata(
        rd.read_parquet(f"{manifest_path}/hashes"))
    man_f = strip_schema_metadata(
        rd.read_parquet(f"{manifest_path}/features"))

    # ---- classify new vs manifest hashes ----
    # Only two things are needed downstream: the CHANGED id set (stale
    # manifest features to exclude — 'deleted' rows fall out of the
    # survivor semi-join on their own) and the delta counters. Below
    # the broadcast gate the old hash map ships once via ray.put and
    # classification is a pure map over the new hash rows — no
    # exchange at all; above it, one co-bucketed (doc_id, hash, side)
    # fold does the same.
    import pyarrow.dataset as pads
    n_old = pads.dataset(f"{manifest_path}/hashes").count_rows()

    if n_old <= SURVIVOR_BROADCAST_MAX:
        # broadcast as SORTED numpy pair (int64 ids, |S32 md5 hex):
        # classification is then one searchsorted + two vectorized
        # equality masks per batch — no per-row python dict lookups in
        # the CDC hot path, and the arrays deserialize per worker far
        # cheaper than a 10M-entry dict
        oh = pads.dataset(f"{manifest_path}/hashes").to_table()
        o_ids = oh["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(o_ids, kind="stable")
        o_hs = np.asarray(oh["text_hash"].to_pylist(), dtype="S32")[order]
        href = ray.put((o_ids[order], o_hs))

        def classify_map(batch: pa.Table) -> pa.Table:
            # changed-id rows plus ONE counter row (drop_id = -1)
            oi, ohh = ray.get(href)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            hs = np.asarray(batch["text_hash"].to_pylist(), dtype="S32")
            if len(oi):
                pos = np.minimum(np.searchsorted(oi, ids), len(oi) - 1)
                exists = oi[pos] == ids
                changed = exists & (ohh[pos] != hs)
            else:
                exists = np.zeros(len(ids), bool)
                changed = exists
            n_ch = int(changed.sum())
            n_ad = int((~exists).sum())
            z = np.zeros(n_ch, np.int64)
            return pa.table({
                "drop_id": pa.array(np.r_[ids[changed], [-1]], pa.int64()),
                "n_changed": pa.array(np.r_[z, [n_ch]], pa.int64()),
                "n_added": pa.array(np.r_[z, [n_ad]], pa.int64()),
            })

        cls = newh.map_batches(classify_map,
                               batch_format="pyarrow").materialize()
        n_changed = int(cls.sum("n_changed") or 0)
        n_added = int(cls.sum("n_added") or 0)
        changed_ids = cls.map_batches(
            lambda b: pa.table({"drop_id": b.filter(pc.greater_equal(
                b["drop_id"], 0))["drop_id"]}),
            batch_format="pyarrow").materialize()
        n_delta = n_changed + n_added
        n_deleted = n_old - (n_new - n_delta) - n_changed
        old_delta_ids = changed_ids  # deleted ids never reach s1
    else:
        num_buckets = bucket_count(n_new, SNAP_INC_ROWS_PER_BUCKET)

        def side_rows(side: int):
            def fn(batch: pa.Table) -> pa.Table:
                ids = pc.cast(batch["doc_id"], pa.int64())
                t = pa.table({
                    "doc_id": ids,
                    "text_hash": batch["text_hash"],
                    "side": pa.array(
                        np.full(len(batch), side, np.int64))})
                return t.append_column("bucket", pa.array(bucket_hash(
                    ids.to_numpy(zero_copy_only=False), num_buckets)))
            return fn

        both = man_h.map_batches(side_rows(0), batch_format="pyarrow") \
            .union(newh.map_batches(side_rows(1), batch_format="pyarrow"))

        def classify_fold(df: pd.DataFrame) -> pd.DataFrame:
            o = df[df["side"] == 0]
            n = df[df["side"] == 1]
            m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"))
            deleted = m["text_hash_n"].isna()
            unchanged = ~deleted & m["text_hash_o"].notna() \
                & (m["text_hash_o"] == m["text_hash_n"])
            new_delta = ~deleted & ~unchanged          # changed + added
            old_delta = m["text_hash_o"].notna() & ~unchanged
            return pd.DataFrame({
                "doc_id": m["doc_id"].astype("int64"),
                "k_new_delta": new_delta.astype("int64"),
                "k_old_delta": old_delta.astype("int64"),
                "k_deleted": deleted.astype("int64")})

        cls = both.groupby("bucket").map_groups(
            classify_fold, batch_format="pandas").materialize()

        old_delta_ids = cls.map_batches(
            lambda b: pa.table({"drop_id": b.filter(
                pc.equal(b["k_old_delta"], 1))["doc_id"]}),
            batch_format="pyarrow").materialize()
        n_delta = int(cls.sum("k_new_delta") or 0)
        n_deleted = int(cls.sum("k_deleted") or 0)

    stats = {"mode": "incremental", "n_new": int(n_new),
             "n_delta": int(n_delta),
             "n_unchanged": int(n_new - n_delta),
             "n_deleted": int(n_deleted),
             "n_text_featured": 0, "n_text_verify_fetched": 0,
             "n_pair_memo_hits": 0}

    if n_new and n_delta * 1_000_000 > rebuild_delta_frac_e6 * n_new:
        stats["mode"] = "full_rebuild"
        report = corpus_clean_funnel(new_ds, n_docs=n_new,
                                     output_path=output_path)
        if output_manifest_path is not None:
            write_funnel_manifest(new_ds, output_manifest_path,
                                  n_docs=n_new)
        stats["n_text_featured"] = int(n_new)
        return (report, stats) if return_stats else report

    # ---- stage 1: exact dedup from the hash rows alone ----
    drops1 = _stage1_drops(newh, n_new)
    n_exact = n_new - drops1.count()
    s1_ids = _ids_only(_rows_except(newh, drops1,
                                    SURVIVOR_BROADCAST_MAX)).materialize()

    # ---- pass 2: features for survivor-delta only ----
    # reusable = manifest features minus stale (changed) rows, semi-
    # joined onto the survivors (deleted docs fall out here — they are
    # not survivors of the new corpus)
    man_ok = _rows_except(man_f, old_delta_ids, SURVIVOR_BROADCAST_MAX)
    reusable = _rows_in(man_ok, s1_ids, SURVIVOR_BROADCAST_MAX) \
        .map_batches(lambda b: b.select(FUNNEL_MANIFEST_COLS),
                     batch_format="pyarrow").materialize()
    s1_id_rows = s1_ids.map_batches(
        lambda b: pa.table({"doc_id": b["drop_id"]}),
        batch_format="pyarrow")
    need_ids = _ids_only(_rows_except(s1_id_rows, _ids_only(reusable),
                                      SURVIVOR_BROADCAST_MAX))
    computed = _rows_in(new_ds, need_ids, SURVIVOR_BROADCAST_MAX) \
        .map_batches(funnel_manifest_batch,
                     batch_format="pyarrow").materialize()
    stats["n_text_featured"] = computed.count()
    feats1 = reusable.union(computed).materialize()

    # ---- stage 2: candidates + memoized exact verify ----
    memo = _load_pair_memo(manifest_path)
    bad: set = set()
    if memo is not None:
        if old_delta_ids.count() <= SURVIVOR_BROADCAST_MAX:
            bad = {r["drop_id"] for r in old_delta_ids.take_all()}
        else:
            memo = None  # validity set too large to broadcast
    verified = _verified_candidates(feats1, new_ds, memo, bad, stats)
    pairs = verified.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["jaccard_e6"], pa.scalar(JACCARD_THRESHOLD_E6, pa.int64()))),
        batch_format="pyarrow").materialize()
    return _funnel_incremental_tail(
        new_ds, newh, feats1, verified, pairs, n_new, n_exact, stats,
        output_path, output_manifest_path, return_stats)


PAIR_MEMO_MAX_PAIRS = 10_000_000  # memo loads driver-side below this


def _load_pair_memo(manifest_path: str) -> dict | None:
    """The prior run's verified-candidate memo {(doc_a, doc_b):
    jaccard_e6} — includes FAILED verifications so dup-free candidate
    collisions are never re-fetched either. None when the manifest
    predates the memo or the pair set exceeds the driver gate
    (disclosed: the run then just verifies everything, still exact)."""
    import os

    import pyarrow.dataset as pads

    d = f"{manifest_path}/pairs"
    if not os.path.isdir(d):
        return None
    dset = pads.dataset(d)
    if dset.count_rows() > PAIR_MEMO_MAX_PAIRS:
        return None
    t = dset.to_table()
    return dict(zip(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()),
                    t["jaccard_e6"].to_pylist()))


def _verified_candidates(feats, text_ds, memo, bad_ids, stats):
    """ALL LSH candidate pairs over a feature Dataset, each with its
    exact Jaccard — NOT threshold-filtered (the memo must remember
    failures too). A memo entry is valid unless either doc is in
    ``bad_ids`` (its text changed since the memo was written); member
    texts are fetched from ``text_ds`` only for memo MISSES."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    cpus = int(ray.cluster_resources().get("CPU", 4))

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        parts = []
        for b in range(LSH_BANDS):
            parts.append(pa.table({
                "doc_id": batch["doc_id"],
                "band": pa.array(np.full(n, b, np.int32)),
                "bucket": batch[f"band_{b}"]}))
        return pa.concat_tables(parts)

    def bucket_candidates(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        if len(df) < 2:
            return empty
        pairs = _candidate_pairs(sorted(df["doc_id"].tolist()))
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"]) \
            if pairs else empty

    cand = feats.map_batches(explode_bands, batch_format="pyarrow") \
        .groupby(["band", "bucket"]).map_groups(
            bucket_candidates, batch_format="pandas") \
        .groupby(["doc_a", "doc_b"]) \
        .aggregate(Count(alias_name="_n_bands")) \
        .select_columns(["doc_a", "doc_b"]).materialize()

    def _empty():
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard_e6": pa.array([], pa.int64())})).materialize()

    if cand.count() == 0:
        stats["n_text_verify_fetched"] = 0
        return _empty()

    hits = None
    if memo:
        mref = ray.put((memo, bad_ids))

        def hit_map(batch: pa.Table) -> pa.Table:
            mm, bb = ray.get(mref)
            oa, ob, oj = [], [], []
            for a, b in zip(batch["doc_a"].to_pylist(),
                            batch["doc_b"].to_pylist()):
                j = mm.get((a, b))
                if j is not None and a not in bb and b not in bb:
                    oa.append(a)
                    ob.append(b)
                    oj.append(j)
            return pa.table({"doc_a": pa.array(oa, pa.int64()),
                             "doc_b": pa.array(ob, pa.int64()),
                             "jaccard_e6": pa.array(oj, pa.int64())})

        def miss_map(batch: pa.Table) -> pa.Table:
            mm, bb = ray.get(mref)
            oa, ob = [], []
            for a, b in zip(batch["doc_a"].to_pylist(),
                            batch["doc_b"].to_pylist()):
                j = mm.get((a, b))
                if j is None or a in bb or b in bb:
                    oa.append(a)
                    ob.append(b)
            return pa.table({"doc_a": pa.array(oa, pa.int64()),
                             "doc_b": pa.array(ob, pa.int64())})

        hits = cand.map_batches(hit_map,
                                batch_format="pyarrow").materialize()
        cand = cand.map_batches(miss_map,
                                batch_format="pyarrow").materialize()
        stats["n_pair_memo_hits"] = hits.count()
        if cand.count() == 0:
            stats["n_text_verify_fetched"] = 0
            return hits

    members = cand.map_batches(
        lambda b: pa.table({"drop_id": pa.concat_arrays(
            [pc.cast(b["doc_a"], pa.int64()).combine_chunks(),
             pc.cast(b["doc_b"], pa.int64()).combine_chunks()])}),
        batch_format="pyarrow") \
        .groupby("drop_id").aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])

    texts = _rows_in(text_ds, members, SURVIVOR_BROADCAST_MAX) \
        .map_batches(lambda b: pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "norm_text": pa.array(_norm(b["text"]), pa.string())}),
            batch_format="pyarrow").materialize()
    n_texts = texts.count()
    stats["n_text_verify_fetched"] = int(n_texts)

    if n_texts <= LSH_BROADCAST_MAX_DOCS:
        # candidate members are the sparse near-dup fraction: one
        # ray.put of their norm texts, verify as a broadcast lookup —
        # ALSO dodges the empty-hash-join-partition hazard a sparse
        # left side creates (an empty partition has no schema to key)
        tref = ray.put({r["doc_id"]: r["norm_text"]
                        for r in texts.take_all()})

        def verify_bcast(batch: pa.Table) -> pa.Table:
            tx = ray.get(tref)
            a = batch["doc_a"].to_pylist()
            b = batch["doc_b"].to_pylist()
            return pa.table({
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "jaccard_e6": pa.array(
                    [_jaccard_e6(tx[x], tx[y]) for x, y in zip(a, b)],
                    pa.int64())})

        out = cand.map_batches(verify_bcast,
                               batch_format="pyarrow").materialize()
        return hits.union(out).materialize() if hits is not None else out

    ta = texts.map_batches(
        lambda b: pa.table({"_ka": b["doc_id"], "text_a": b["norm_text"]}),
        batch_format="pyarrow")
    tb = texts.map_batches(
        lambda b: pa.table({"_kb": b["doc_id"], "text_b": b["norm_text"]}),
        batch_format="pyarrow")
    npart = _nparts(cand.count(), cpus)
    jp = cand.join(ta, "inner", num_partitions=npart,
                   on=("doc_a",), right_on=("_ka",)) \
        .select_columns(["doc_a", "doc_b", "text_a"])
    jp = jp.join(tb, "inner", num_partitions=npart,
                 on=("doc_b",), right_on=("_kb",)) \
        .select_columns(["doc_a", "doc_b", "text_a", "text_b"])

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        return pa.table({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "jaccard_e6": pa.array(
                [_jaccard_e6(na, nb) for na, nb in
                 zip(batch["text_a"].to_pylist(),
                     batch["text_b"].to_pylist())], pa.int64())})

    out = jp.map_batches(verify, batch_format="pyarrow").materialize()
    return hits.union(out).materialize() if hits is not None else out


def _funnel_incremental_tail(new_ds, newh, feats1, verified, pairs,
                             n_new: int, n_exact: int, stats: dict,
                             output_path, output_manifest_path,
                             return_stats: bool):
    """Stages 2b-4 of the distributed incremental arm: cluster the
    verified pairs, keep-best on manifest lengths, decontaminate,
    quality-count, write outputs, report."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    clusters = _clusters_from_pairs(pairs).materialize()

    if clusters.count() == 0:
        return _funnel_incremental_finish(
            new_ds, newh, feats1, verified, n_new, n_exact, n_exact,
            feats1, stats, output_path, output_manifest_path,
            return_stats)

    from ray.data.aggregate import Max
    lens = feats1.map_batches(
        lambda b: pa.table({"_kl": b["doc_id"], "n_chars": b["n_chars"]}),
        batch_format="pyarrow")
    jc = clusters.join(lens, "inner",
                       num_partitions=_nparts(clusters.count(), cpus),
                       on=("doc_id",), right_on=("_kl",))

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        if len(ids) and (int(ids.max()) >= KEEP_BEST_ID_SHIFT
                         or int(ids.min()) < 0
                         or int(nc.max()) >= (1 << 23)):
            raise ValueError(
                "incremental keep-best order-embedding overflow: requires "
                "0 <= doc_id < 2^40 and n_chars < 2^23")
        key = nc * KEEP_BEST_ID_SHIFT + (KEEP_BEST_ID_SHIFT - 1 - ids)
        return pa.table({"cluster_id": batch["cluster_id"],
                         "doc_id": batch["doc_id"],
                         "key": pa.array(key, pa.int64())})

    keyed = jc.map_batches(encode, batch_format="pyarrow").materialize()
    best = keyed.groupby("cluster_id").aggregate(
        Max("key", alias_name="best_key"))
    j2 = keyed.join(best, "inner",
                    num_partitions=_nparts(keyed.count(), cpus),
                    on=("cluster_id",))
    drops2 = j2.map_batches(
        lambda b: pa.table({"drop_id": b.filter(pc.not_equal(
            b["key"], b["best_key"]))["doc_id"]}),
        batch_format="pyarrow").materialize()
    n_near = n_exact - drops2.count()
    s2 = _rows_except(feats1, drops2, SURVIVOR_BROADCAST_MAX)
    return _funnel_incremental_finish(
        new_ds, newh, feats1, verified, n_new, n_exact, n_near, s2,
        stats, output_path, output_manifest_path, return_stats)


def _funnel_incremental_finish(new_ds, newh, feats1, verified,
                               n_new: int, n_exact: int, n_near: int,
                               s2, stats: dict, output_path,
                               output_manifest_path,
                               return_stats: bool):
    """Stages 3-4 of the distributed incremental arm (decontaminate vs
    the RAW new-corpus benchmark — from the hash rows, which cover
    every new doc — then the quality count), outputs, and the 5-row
    report."""
    import ray
    from ray.data.aggregate import Count

    from .text import DECONTAM_MODULUS
    from .util import finish_grouped

    cpus = int(ray.cluster_resources().get("CPU", 4))

    bench = newh.map_batches(
        lambda b: pa.table({"text_hash": pc.unique(b.filter(pa.array(
            b["doc_id"].to_numpy(zero_copy_only=False)
            % DECONTAM_MODULUS == 0))["text_hash"].combine_chunks())}),
        batch_format="pyarrow") \
        .groupby("text_hash").aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).materialize()
    jm = s2.map_batches(
        lambda b: b.select(["doc_id", "text_hash", "quality_keep"]),
        batch_format="pyarrow") \
        .join(bench.map_batches(
            lambda t: pa.table({"bh": t["text_hash"]}),
            batch_format="pyarrow"), "inner",
            num_partitions=_nparts(n_near, cpus),
            on=("text_hash",), right_on=("bh",))
    drops3 = jm.map_batches(
        lambda t: pa.table({"drop_id": t["doc_id"]}),
        batch_format="pyarrow").materialize()
    n_decon = n_near - drops3.count()
    s3 = _rows_except(s2, drops3, SURVIVOR_BROADCAST_MAX).materialize()

    def q_partial(b: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([0], pa.int64()),
                         "n": pa.array(
                             [int(pc.sum(b["quality_keep"]).as_py() or 0)],
                             pa.int64())})

    rows = finish_grouped(
        s3.map_batches(q_partial, batch_format="pyarrow"), ["k"]) \
        .take_all()
    n_quality = sum(r["n"] for r in rows)

    if output_path is not None:
        surv_ids = s3.map_batches(
            lambda b: pa.table({"drop_id": b.filter(pc.equal(
                b["quality_keep"], 1))["doc_id"]}),
            batch_format="pyarrow")
        _write_survivor_rows(new_ds, surv_ids, output_path)
    if output_manifest_path is not None:
        _write_manifest_parts(newh, feats1, verified,
                              output_manifest_path)

    report = pd.DataFrame({
        "stage_idx": pd.Series(range(len(FUNNEL_STAGES)), dtype="int64"),
        "stage": list(FUNNEL_STAGES),
        "n_docs": pd.Series([n_new, n_exact, n_near, n_decon, n_quality],
                            dtype="int64")})
    return (report, stats) if return_stats else report


SNAP_INC_ROWS_PER_BUCKET = 1_000_000


def _write_survivor_rows(new_ds, surv_ids, output_path: str) -> None:
    """Write the cleaned corpus (all columns of the surviving new-crawl
    rows) as partitioned parquet — one id-filtered pass over the new
    snapshot, the same write the from-scratch funnel's production mode
    does."""
    import os
    import shutil

    if os.path.exists(output_path):
        shutil.rmtree(output_path)
    _rows_in(new_ds, surv_ids, SURVIVOR_BROADCAST_MAX) \
        .write_parquet(output_path)
    with open(f"{output_path}/_SUCCESS", "w"):
        pass


def _write_manifest_parts(newh, feats1, verified, path: str) -> None:
    """Persist hash + survivor-feature + verified-pair Datasets as
    the NEXT run's manifest."""
    import os
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    newh.write_parquet(f"{path}/hashes")
    feats1.write_parquet(f"{path}/features")
    verified.write_parquet(f"{path}/pairs")
    with open(f"{path}/_SUCCESS", "w"):
        pass


def _write_manifest_frames(nh: pd.DataFrame, feats1: pd.DataFrame,
                           pairs_df: pd.DataFrame, path: str) -> None:
    """Driver-arm twin of ``_write_manifest_parts`` for pandas
    frames."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from .util import table_from_pandas

    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(f"{path}/hashes")
    os.makedirs(f"{path}/features")
    os.makedirs(f"{path}/pairs")
    pq.write_table(table_from_pandas(nh[["doc_id", "text_hash"]]),
                   f"{path}/hashes/part-0.parquet")
    pq.write_table(table_from_pandas(feats1[list(FUNNEL_MANIFEST_COLS)]),
                   f"{path}/features/part-0.parquet")
    pq.write_table(pa.table({
        "doc_a": pa.array(pairs_df["doc_a"].to_numpy(np.int64)
                          if len(pairs_df) else [], pa.int64()),
        "doc_b": pa.array(pairs_df["doc_b"].to_numpy(np.int64)
                          if len(pairs_df) else [], pa.int64()),
        "jaccard_e6": pa.array(pairs_df["jaccard_e6"].to_numpy(np.int64)
                               if len(pairs_df) else [], pa.int64())}),
        f"{path}/pairs/part-0.parquet")
    with open(f"{path}/_SUCCESS", "w"):
        pass


def ensure_incremental_manifest(sf_dir: str) -> str:
    """Versioned /tmp manifest artifact backing the ``funnel_incremental``
    driver query: run 1's manifest over the simulated PREVIOUS crawl
    (``text.snapshot_old``), cached keyed on this module's + text.py's
    bytes so any engine change auto-invalidates (the
    ``ensure_knn_artifacts`` pattern). Needs a live Ray session (the
    driver has one when queries run)."""
    import hashlib
    import os

    import ray.data as rd

    from . import text as _text_mod
    from .text import snapshot_old
    from .util import parquet_num_rows, strip_schema_metadata

    with open(__file__, "rb") as f:
        code = f.read()
    with open(_text_mod.__file__, "rb") as f:
        code += f.read()
    key = hashlib.md5(
        code + os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = f"/tmp/graft_funnel_inc/{key}/manifest"
    if not os.path.exists(f"{path}/_SUCCESS"):
        ds = strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet"))
        write_funnel_manifest(snapshot_old(ds), path)
    return path
