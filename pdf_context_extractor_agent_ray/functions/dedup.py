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

from .text import WS_RE

N_PERM = 8          # minhash permutations
SHINGLE_TOKENS = 3  # tokens per shingle
LSH_BANDS = 4       # bands of N_PERM // LSH_BANDS rows each
JACCARD_THRESHOLD_E6 = 500_000  # 0.5 in integer-scaled jaccard
MAX_BUCKET_DOCS = 512  # beyond this a bucket chain-links instead of all-pairs


def _norm(batch_text: pa.ChunkedArray | pa.Array) -> list[str]:
    return pc.utf8_trim(
        pc.replace_substring_regex(batch_text, WS_RE, " "), " ").to_pylist()


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


def minhash_batch(batch: pa.Table) -> pa.Table:
    norms = _norm(batch["text"])
    sigs = [minhash_signature(n) for n in norms]
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


def lsh_candidate_pairs(ds):
    """MinHash-LSH near-dup pairs: shingle → minhash → band-bucket
    groupby → in-bucket pairs → exact n-gram Jaccard verification.

    Output: doc_a, doc_b (doc_a < doc_b), jaccard_e6 (integer-scaled),
    only pairs with Jaccard >= threshold, deduped across bands.
    """
    def sig_and_bands(batch: pa.Table) -> pa.Table:
        norms = _norm(batch["text"])
        doc_ids = batch["doc_id"].to_pylist()
        out_doc, out_band, out_key, out_norm = [], [], [], []
        for d, n in zip(doc_ids, norms):
            sig = minhash_signature(n)
            for b in range(LSH_BANDS):
                out_doc.append(d)
                out_band.append(b)
                out_key.append(_band_key(sig, b))
                out_norm.append(n)
        return pa.table({"doc_id": pa.array(out_doc),
                         "band": pa.array(out_band, pa.int32()),
                         "bucket": pa.array(out_key, pa.string()),
                         "norm_text": pa.array(out_norm, pa.string())})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "jaccard_e6": pd.Series([], dtype="int64")})
        df = df.sort_values("doc_id")
        if len(df) > MAX_BUCKET_DOCS:
            # degenerate bucket (e.g. a corpus of near-identical docs):
            # full pairing is O(n²). Chain-link instead: consecutive
            # doc_id pairs within the bucket — every member still links
            # into one connected component (dup_clusters recovers the
            # full cluster), at O(n) pairs. Deterministic by doc_id order.
            docs = df["doc_id"].tolist()
            norms_l = df["norm_text"].tolist()
            sets_l = [set(_shingles(n)) for n in norms_l]
            rows = []
            for i in range(len(docs) - 1):
                inter = len(sets_l[i] & sets_l[i + 1])
                union = len(sets_l[i] | sets_l[i + 1])
                jac = int(inter / union * 1e6 + 0.5) if union else 0
                if jac >= JACCARD_THRESHOLD_E6:
                    rows.append((docs[i], docs[i + 1], jac))
            return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_e6"]) if rows \
                else pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                   "doc_b": pd.Series([], dtype="int64"),
                                   "jaccard_e6": pd.Series([], dtype="int64")})
        docs = df["doc_id"].tolist()
        norms = df["norm_text"].tolist()
        sets = [set(_shingles(n)) for n in norms]
        rows = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                # round-half-away to match the DuckDB oracle's round()
                jac = int(inter / union * 1e6 + 0.5) if union else 0
                if jac >= JACCARD_THRESHOLD_E6:
                    rows.append((docs[i], docs[j], jac))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_e6"]) if rows \
            else pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                               "doc_b": pd.Series([], dtype="int64"),
                               "jaccard_e6": pd.Series([], dtype="int64")})

    exploded = ds.map_batches(sig_and_bands, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "bucket"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # dedupe pairs found in multiple bands
    from ray.data.aggregate import Max
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("jaccard_e6", alias_name="jaccard_e6"))


SMALL_GRAPH_PAIRS = 1_000_000


def dup_clusters(ds, max_rounds: int = 16,
                 small_graph_pairs: int = SMALL_GRAPH_PAIRS):
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
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4))
    num_partitions = max(2, cpus // 2)

    pairs = lsh_candidate_pairs(ds).materialize()

    if pairs.count() <= small_graph_pairs:
        def union_find(batch: pa.Table) -> pa.Table:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            a_col = batch["doc_a"].to_pylist()
            b_col = batch["doc_b"].to_pylist()
            for a, b in zip(a_col, b_col):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by min so the root IS the min doc_id
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            nodes = sorted(parent)
            return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                             "cluster_id": pa.array([find(n) for n in nodes], pa.int64())})

        return pairs.repartition(1).map_batches(union_find, batch_format="pyarrow",
                                                batch_size=None)
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

    for _ in range(max_rounds):
        # propagate: each node's label -> its peers, take the min
        joined = edges.join(labels, "inner", num_partitions=num_partitions,
                            on=("peer",), right_on=("node",),
                            right_suffix="_l")
        prop = joined.groupby("node").aggregate(Min("label", alias_name="peer_label"))
        merged = labels.join(prop, "left_outer", num_partitions=num_partitions,
                             on=("node",), right_on=("node",), right_suffix="_p")

        def take_min(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            new = pc.min_element_wise(batch["label"],
                                      pc.fill_null(batch["peer_label"], 2**62))
            changed = pc.cast(pc.not_equal(new, batch["label"]), pa.int64())
            return pa.table({"node": batch["node"], "label": new, "changed": changed})

        updated = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        n_changed = updated.sum("changed")
        labels = updated.select_columns(["node", "label"])
        if not n_changed:
            break

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["node"], "cluster_id": batch["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def simhash_batch(batch: pa.Table, bits: int = 64) -> pa.Table:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    big-endian md5[0:8] token hashes — bit-for-bit identical to the SQL
    oracle (``('0x'||substr(md5(t),1,16))::UBIGINT``), wrapped into a
    signed int64. Vectorized per doc with numpy."""
    norms = _norm(batch["text"])
    out = np.zeros(len(norms), dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    for idx, n in enumerate(norms):
        toks = n.split(" ") if n else []
        if not toks:
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks),
            dtype=">u8").astype(np.uint64)
        colbits = ((hs[:, None] >> shifts) & np.uint64(1))
        votes = colbits.sum(axis=0) * 2 >= len(toks)
        out[idx] = (votes.astype(np.uint64) << shifts).sum(dtype=np.uint64)
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(out.astype("int64").tolist(), pa.int64())})


def simhash_table(ds):
    return ds.map_batches(simhash_batch, batch_format="pyarrow")
