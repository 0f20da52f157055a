"""HLL sketch accuracy/determinism + the FIXTURES.md corpus-tier
(2000-doc) end-to-end equality run."""
import duckdb
import pytest

from pdf_context_extractor_agent_ray.functions.sketches import approx_distinct_tokens
from pdf_context_extractor_agent_ray.oracle.extractor import extract_doc_dict
from pdf_context_extractor_agent_ray.pipelines.extraction import extraction_pipeline
from pdf_context_extractor_agent_ray.sources.synth_source import synth_documents
from pdf_context_extractor_agent_ray.synth import generate_corpus

SF = "/root/testdata/sf0.01"


def test_hll_accuracy_and_determinism(ray_session):
    est1 = approx_distinct_tokens(SF).take_all()[0]["n_distinct_tokens_approx"]
    est2 = approx_distinct_tokens(SF).take_all()[0]["n_distinct_tokens_approx"]
    assert est1 == est2  # register maxima are partitioning-invariant
    con = duckdb.connect()
    exact = con.execute(f"""
        SELECT count(DISTINCT tok) FROM (
          SELECT unnest(string_split(trim(regexp_replace(text,
                 '[ \t\r\n\f\v]+', ' ', 'g'), ' '), ' ')) AS tok
          FROM read_parquet('{SF}/documents.parquet'))
    """).fetchone()[0]
    assert abs(est1 - exact) / exact < 0.05, (est1, exact)


@pytest.mark.slow
def test_corpus_tier_equality(ray_session):
    """FIXTURES.md §4 corpus tier: ~2000 generated docs, end-to-end
    pipeline vs oracle span equality."""
    n = 2000
    corpus = generate_corpus(n)
    oracle = {d["doc_id"]: extract_doc_dict(d) for d in corpus}
    out = extraction_pipeline(synth_documents(n), concurrency=3, batch_size=48)
    count = 0
    for row in out.iter_rows():
        o = oracle[row["doc_id"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        assert got == o["spans"], row["doc_id"]
        assert row["valid"] == o["valid"]
        assert row["statement_type"] == o["statement_type"]
        count += 1
    assert count == n


def test_ivf_knn_recall(ray_session):
    """IVF approximate top-k: exact-schema output, reasonable recall vs
    the exact brute-force ranking."""
    from pdf_context_extractor_agent_ray.functions.simsearch import ivf_knn, knn_topk, load_query_vectors
    import ray.data as rd
    qv = load_query_vectors(SF)
    exact = {}
    for r in knn_topk(rd.read_parquet(f"{SF}/embeddings.parquet"), qv).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx = {}
    for r in ivf_knn(SF, qv).take_all():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    # k-means cells concentrate neighborhoods: well above the 4/16
    # probed-fraction baseline (measured 0.70 mean on synth embeddings)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_near_dup_survivors_paths_agree(ray_session):
    """Broadcast and anti-join survivor paths produce the identical
    keep-list, and survivors == corpus minus clustered
    non-representatives (computed independently from dup_clusters)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        dup_clusters, near_dup_survivors)

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    fast = sorted(r["doc_id"] for r in near_dup_survivors(ds).take_all())
    slow = sorted(r["doc_id"] for r in near_dup_survivors(
        rd.read_parquet(f"{SF}/documents.parquet"),
        broadcast_max_drops=0).take_all())
    assert fast == slow and fast

    all_ids = set(rd.read_parquet(f"{SF}/documents.parquet",
                                  columns=["doc_id"]).to_pandas()["doc_id"])
    drops = {r["doc_id"] for r in dup_clusters(
        rd.read_parquet(f"{SF}/documents.parquet")).take_all()
        if r["doc_id"] != r["cluster_id"]}
    assert fast == sorted(all_ids - drops)


def test_near_dup_keep_best_paths_agree(ray_session):
    """Driver-resolved and distributed winner picks produce the
    identical quality-aware keep-list; every cluster retains exactly
    one member and that member has the cluster's max normalized
    length (ties -> min doc_id), verified independently."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        _norm, dup_clusters, near_dup_keep_best)

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    fast = sorted(r["doc_id"] for r in near_dup_keep_best(ds).take_all())
    slow = sorted(r["doc_id"] for r in near_dup_keep_best(
        rd.read_parquet(f"{SF}/documents.parquet"),
        broadcast_max_cluster_docs=0).take_all())
    assert fast == slow and fast

    # independent winner check: longest normalized text, ties min id
    full = rd.read_parquet(f"{SF}/documents.parquet").to_pandas()
    lens = {d: len(n) for d, n in zip(
        full["doc_id"],
        _norm(__import__("pyarrow").array(full["text"].tolist())))}
    clusters = {}
    for r in dup_clusters(
            rd.read_parquet(f"{SF}/documents.parquet")).take_all():
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    kept = set(fast)
    assert clusters  # the corpus has near-dup clusters to exercise
    for members in clusters.values():
        winner = min(members, key=lambda d: (-lens[d], d))
        assert set(members) & kept == {winner}


def test_near_dup_keep_best_overflow_fails_loud(ray_session):
    """A doc_id outside the order-embedding's exact range (>= 2^40)
    must raise, not silently pick a wrong winner (VERDICT r3 #6)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import near_dup_keep_best

    text = "alpha beta gamma delta epsilon zeta eta theta " * 20
    big = 1 << 40
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([big + 1, big + 2], pa.int64()),
        "text": pa.array([text, text + " tail"], pa.string()),
    }))
    with pytest.raises(Exception, match="order-embedding overflow"):
        near_dup_keep_best(ds, broadcast_max_cluster_docs=0,
                           n_docs=2).take_all()


def test_pack_sequences_invariants(ray_session):
    """Greedy packing: budget respected, every chunk packed exactly
    once (token totals preserved), and the result is identical under a
    different input partitioning (the hash-bucket determinism claim)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import (
        PACK_BUDGET, pack_sequences, token_chunks_batch)

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    seqs = pack_sequences(ds).take_all()
    assert seqs
    assert all(r["n_tokens"] <= PACK_BUDGET for r in seqs)

    chunks = ds.map_batches(token_chunks_batch,
                            batch_format="pyarrow").take_all()
    assert sum(r["n_chunks"] for r in seqs) == len(chunks)
    assert sum(r["n_tokens"] for r in seqs) == sum(c["n_tokens"] for c in chunks)

    key = lambda r: (r["bucket"], r["seq_idx"], r["n_chunks"], r["n_tokens"])
    again = sorted(key(r) for r in pack_sequences(
        rd.read_parquet(f"{SF}/documents.parquet").repartition(7)).take_all())
    assert again == sorted(key(r) for r in seqs)


def test_lsh_knn_multiprobe_recall(ray_session):
    """Hyperplane-LSH approximate top-k: exact-schema output, and
    widening the multiprobe radius monotonically recovers recall vs
    brute force (measured 0.16 / 0.34 / 0.62 at hamming 1/2/3 on the
    near-random synth embeddings, tracking the probed bucket fraction)."""
    from pdf_context_extractor_agent_ray.functions.simsearch import (
        knn_topk, load_query_vectors, lsh_bucketed_knn)
    import ray.data as rd
    qv = load_query_vectors(SF)
    exact = {}
    for r in knn_topk(rd.read_parquet(f"{SF}/embeddings.parquet"), qv).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(probe_hamming):
        approx = {}
        for r in lsh_bucketed_knn(rd.read_parquet(f"{SF}/embeddings.parquet"),
                                  qv, probe_hamming=probe_hamming).take_all():
            approx.setdefault(r["query_id"], set()).add(r["vec_id"])
        rs = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
        return sum(rs) / len(rs)

    r1, r2 = recall(1), recall(2)
    assert r2 >= 0.25, (r1, r2)
    assert r2 > r1  # multiprobe must actually widen the search


def test_lsh_pairs_broadcast_and_join_paths_agree(ray_session):
    """The gated broadcast-verify path and the at-scale join-verify
    path must produce identical verified pairs."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import lsh_candidate_pairs

    key = lambda r: (r["doc_a"], r["doc_b"], r["jaccard_e6"])
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    fast = sorted(key(r) for r in lsh_candidate_pairs(ds).take_all())
    slow = sorted(key(r) for r in lsh_candidate_pairs(
        rd.read_parquet(f"{SF}/documents.parquet"), broadcast_max_docs=0).take_all())
    assert fast == slow and fast


def test_ngram_jaccard_paths_agree_and_cover_lsh(ray_session):
    """The exact inverted-index op: driver and distributed paths are
    identical, and the exact pair set is a SUPERSET of the LSH path's
    verified pairs (LSH loses recall, never precision)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        lsh_candidate_pairs, ngram_jaccard_pairs)

    key = lambda r: (r["doc_a"], r["doc_b"], r["jaccard_e6"])
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    fast = sorted(key(r) for r in ngram_jaccard_pairs(ds).take_all())
    slow = sorted(key(r) for r in ngram_jaccard_pairs(
        rd.read_parquet(f"{SF}/documents.parquet"), driver_max_docs=0).take_all())
    assert fast == slow and fast
    lsh = set(key(r) for r in lsh_candidate_pairs(
        rd.read_parquet(f"{SF}/documents.parquet")).take_all())
    assert lsh <= set(fast)


def test_embedding_near_dup_bucketed_path(ray_session):
    """The >gate LSH-bucketed path must emit a subset of the exact
    pairs (every emitted similarity is exact; only candidate recall is
    approximate) with the same schema."""
    from pdf_context_extractor_agent_ray.functions.simsearch import embedding_near_dup

    exact = {(r["vec_a"], r["vec_b"]): r["sim_e6"]
             for r in embedding_near_dup(SF).take_all()}
    bucketed = {(r["vec_a"], r["vec_b"]): r["sim_e6"]
                for r in embedding_near_dup(SF, exact_max_vectors=0).take_all()}
    assert bucketed, "bucketed path found no pairs at all"
    for pair, sim in bucketed.items():
        assert exact[pair] == sim, pair


def test_embedding_chain_link_branch_subset_of_exact(ray_session):
    """Forcing every bucket degenerate (max_bucket=1) exercises the
    vectorized chain-link scorer; its pairs must carry the same exact
    similarities the broadcast path computes."""
    import os
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_context_extractor_agent_ray.functions.simsearch import (
        EMBED_DUP_THRESHOLD_E6, _bucketed_embedding_near_dup,
        embedding_near_dup)

    # consecutive vec_ids near-identical so chain-links clear the
    # threshold (the real corpus's dups are rarely id-adjacent)
    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 16))
    vecs = base.repeat(2, axis=0)
    vecs[1::2] += rng.normal(scale=0.01, size=vecs[1::2].shape)
    d = "/tmp/graft_chainlink_emb"
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              pa.list_(pa.float64())),
    }), f"{d}/embeddings.parquet")

    exact = {(r["vec_a"], r["vec_b"]): r["sim_e6"]
             for r in embedding_near_dup(d).take_all()}
    chained = {(r["vec_a"], r["vec_b"]): r["sim_e6"]
               for r in _bucketed_embedding_near_dup(
                   d, EMBED_DUP_THRESHOLD_E6, max_bucket=1).take_all()}
    assert chained, "chain-link branch emitted nothing"
    for pair, sim in chained.items():
        assert exact[pair] == sim, pair


def test_dup_clusters_both_paths_agree(ray_session):
    """The union-find fast path and the distributed label-propagation
    path must produce identical components."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import dup_clusters
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    fast = sorted((r["doc_id"], r["cluster_id"]) for r in dup_clusters(ds).take_all())
    slow = sorted((r["doc_id"], r["cluster_id"])
                  for r in dup_clusters(rd.read_parquet(f"{SF}/documents.parquet"),
                                        small_graph_pairs=0).take_all())
    assert fast == slow and fast


def test_degenerate_bucket_chain_links(ray_session):
    """A corpus of thousands of identical docs must not blow up the
    in-bucket pairing (O(n) chain links; clusters still connect)."""
    import time
    import pyarrow as pa
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import dup_clusters

    n = 2000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(["the same exact document body here"] * n)})
    t0 = time.time()
    clusters = dup_clusters(rd.from_arrow(t)).take_all()
    dt = time.time() - t0
    assert len(clusters) == n
    assert {c["cluster_id"] for c in clusters} == {0}  # one component
    assert dt < 60, dt  # all-pairs would be ~2M comparisons x 4 bands


def test_decontaminate_paths_agree(ray_session):
    """Broadcast-blocklist and hash-partitioned-anti-join paths of
    decontaminate keep the identical survivor set (the at-scale path
    is forced by zeroing the gate)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import decontaminate

    fast = sorted((r["doc_id"], r["text_hash"]) for r in decontaminate(
        rd.read_parquet(f"{SF}/documents.parquet")).take_all())
    slow = sorted((r["doc_id"], r["text_hash"]) for r in decontaminate(
        rd.read_parquet(f"{SF}/documents.parquet"),
        broadcast_max_hashes=0).take_all())
    assert fast == slow and fast


def test_top_orders_per_segment_paths_agree(ray_session):
    """Broadcast-dimension and forced hash-join paths of the grouped
    top-k return the identical ranked rows."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        top_orders_per_segment)

    fast = top_orders_per_segment(SF).to_pandas()
    slow = top_orders_per_segment(SF, broadcast_max_bytes=0).to_pandas()
    cols = ["segment", "rk", "orderkey", "totalprice_cents"]
    a = fast[cols].sort_values(["segment", "rk"]).reset_index(drop=True)
    b = slow[cols].sort_values(["segment", "rk"]).reset_index(drop=True)
    assert a.equals(b) and len(a)
    assert (a.groupby("segment")["rk"].apply(
        lambda s: list(s) == list(range(1, len(s) + 1)))).all()


def test_simhash_dup_pairs_paths_agree(ray_session):
    """Broadcast and banded-join simhash pair paths emit the identical
    (doc_a, doc_b, hamming) set, and every emitted hamming is the true
    popcount of the xor of the two signatures (verified independently
    against the signature table)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        simhash_dup_pairs, simhash_table)

    fast = sorted((r["doc_a"], r["doc_b"], r["hamming"])
                  for r in simhash_dup_pairs(
                      rd.read_parquet(f"{SF}/documents.parquet")).take_all())
    slow = sorted((r["doc_a"], r["doc_b"], r["hamming"])
                  for r in simhash_dup_pairs(
                      rd.read_parquet(f"{SF}/documents.parquet"),
                      broadcast_max_docs=0).take_all())
    assert fast == slow and fast

    sig = {r["doc_id"]: r["simhash"] for r in simhash_table(
        rd.read_parquet(f"{SF}/documents.parquet")).take_all()}
    for a, b, ham in fast:
        assert a < b
        assert ((sig[a] ^ sig[b]) & 0xFFFFFFFFFFFFFFFF).bit_count() == ham <= 3


def test_decontaminate_ngram_paths_agree_and_cover_fingerprint(ray_session):
    """Broadcast and shingle-join paths of decontaminate_ngram keep the
    identical survivor set, the drop set strictly contains every
    benchmark doc, and any doc dropped by whole-prefix fingerprint
    decontamination is also dropped by the 13-gram overlap (n-gram is
    the stronger filter on this corpus, where FINGERPRINT_PREFIX chars
    span at least one shingle window)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import (
        DECONTAM_MODULUS, decontaminate, decontaminate_ngram)

    fast = sorted(r["doc_id"] for r in decontaminate_ngram(
        rd.read_parquet(f"{SF}/documents.parquet")).take_all())
    slow = sorted(r["doc_id"] for r in decontaminate_ngram(
        rd.read_parquet(f"{SF}/documents.parquet"),
        broadcast_max_shingles=0).take_all())
    assert fast == slow and fast

    all_ids = set(rd.read_parquet(f"{SF}/documents.parquet",
                                  columns=["doc_id"]).to_pandas()["doc_id"])
    dropped = all_ids - set(fast)
    assert {i for i in all_ids if i % DECONTAM_MODULUS == 0} <= dropped
    fp_survivors = {r["doc_id"] for r in decontaminate(
        rd.read_parquet(f"{SF}/documents.parquet")).take_all()}
    assert dropped >= (all_ids - fp_survivors)


def test_top_customers_paths_agree(ray_session):
    """Broadcast-dimension and Dataset.join paths of top_customers
    return the identical ranking (at-scale path forced by a zero-byte
    dimension gate)."""
    from pdf_context_extractor_agent_ray.functions.relational import top_customers

    cols = ["o_custkey", "revenue_cents", "n_orders", "c_name", "c_mktsegment"]
    fast = top_customers(SF).to_pandas()
    slow = top_customers(SF, broadcast_max_bytes=0).to_pandas()
    assert list(fast["o_custkey"]) == list(slow["o_custkey"])
    for c in cols:
        assert list(fast[c]) == list(slow[c]), c


def test_lsh_knn_recall(ray_session):
    """Hyperplane-LSH approximate top-k: recall floors vs the exact
    brute-force ranking — the quality gate for the rows-only knn_lsh
    entry. Hyperplane LSH on the near-isotropic 48-dim synth
    embeddings is diffuse by nature, so the honest claims are (a) the
    default probe radius beats its probed-bucket fraction by a wide
    factor (it finds structure, not luck: measured 0.16 mean vs a
    9/256 = 3.5% probed baseline) and (b) recall scales with the
    probe radius (measured 0.62 at hamming<=3, 93/256 probed)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.simsearch import (
        knn_topk, lsh_bucketed_knn, load_query_vectors)

    qv = load_query_vectors(SF)

    def mean_recall(ph):
        exact, approx = {}, {}
        for r in knn_topk(rd.read_parquet(f"{SF}/embeddings.parquet"),
                          qv).take_all():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        for r in lsh_bucketed_knn(rd.read_parquet(f"{SF}/embeddings.parquet"),
                                  qv, probe_hamming=ph).take_all():
            approx.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(exact[q] & approx.get(q, set())) / len(exact[q])
                   for q in exact) / len(exact)

    r1 = mean_recall(1)
    assert r1 >= 0.08, r1          # >2x the 3.5% probed-fraction baseline
    r3 = mean_recall(3)
    assert r3 >= 0.4, r3           # radius scaling holds


def test_top_terms_per_doc_paths_agree(ray_session):
    """Broadcast-df and forced token-join paths of the per-doc top-k
    terms return identical ranked rows (the at-scale path is forced by
    zeroing the vocabulary gate)."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import top_terms_per_doc

    def run(**kw):
        rows = top_terms_per_doc(
            rd.read_parquet(f"{SF}/documents.parquet"), **kw).take_all()
        return sorted((r["doc_id"], r["term_rank"], r["token"],
                       r["tf"], r["df"]) for r in rows)

    fast = run()
    slow = run(broadcast_max_vocab=0)
    assert fast == slow and fast


def test_shard_manifest_invariants_and_agreement(ray_session):
    """shard_manifest == brute-force prefix-sum over pack_sequences
    output in global (bucket, seq_idx) order; shard ids contiguous,
    token mass conserved."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_context_extractor_agent_ray.functions.text import (
        SHARD_BUDGET, pack_sequences, shard_manifest)
    from pdf_context_extractor_agent_ray.functions.util import (
        strip_schema_metadata)

    mk = lambda: strip_schema_metadata(  # noqa: E731
        rd.read_parquet(f"{SF}/documents.parquet"))
    packs = pd.DataFrame(pack_sequences(mk()).take_all()) \
        .sort_values(["bucket", "seq_idx"]).reset_index(drop=True)
    man = pd.DataFrame(shard_manifest(mk()).take_all()) \
        .sort_values("shard_id").reset_index(drop=True)

    toks = packs["n_tokens"].to_numpy(dtype=np.int64)
    prev = np.concatenate(([0], np.cumsum(toks)[:-1]))
    bf = pd.DataFrame({"shard_id": prev // SHARD_BUDGET, "tok": toks}) \
        .groupby("shard_id", as_index=False) \
        .agg(n_seqs=("tok", "size"), shard_tokens=("tok", "sum"))

    assert man["shard_id"].tolist() == list(range(len(man)))  # contiguous
    assert int(man["shard_tokens"].sum()) == int(toks.sum())  # conserved
    assert int(man["n_seqs"].sum()) == len(packs)
    assert man[["shard_id", "n_seqs", "shard_tokens"]].astype("int64") \
        .equals(bf.astype("int64"))


def test_knn_self_join_paths_agree_and_contract(ray_session):
    """Broadcast and blocked-exact paths of the all-vectors kNN
    self-join are identical; every vector gets exactly k ranked
    neighbors, self excluded, ranks contiguous from 1."""
    from pdf_context_extractor_agent_ray.functions.simsearch import (
        DEFAULT_K, knn_self_join)

    key = lambda r: (r["vec_id"], r["rank"], r["nbr_id"], r["sim_e6"])
    fast = sorted(key(r) for r in knn_self_join(SF).take_all())
    slow = sorted(key(r) for r in knn_self_join(
        SF, broadcast_max_vectors=0, block_vecs=130).take_all())
    assert fast == slow and fast
    per_vec: dict[int, list[int]] = {}
    for vec_id, rank, nbr_id, _ in fast:
        assert nbr_id != vec_id
        per_vec.setdefault(vec_id, []).append(rank)
    for ranks in per_vec.values():
        assert ranks == list(range(1, DEFAULT_K + 1))


def test_knn_self_join_oversized_id_fails_loud(ray_session, tmp_path):
    """vec_id >= 2^40 must raise, not silently corrupt the composite
    ordering key."""
    import numpy as np
    import pyarrow as pa
    import pytest
    from pdf_context_extractor_agent_ray.functions.simsearch import _self_topk_block

    ids = np.array([1 << 40], dtype=np.int64)
    M = np.ones((1, 4), dtype=np.float64)
    with pytest.raises(ValueError, match="2\\^40"):
        _self_topk_block(ids, M, ids, M, 5)


def test_customer_distribution_invariants(ray_session):
    """Bucket-count invariance; zero-order row always present; total
    histogram mass equals the customer count; order mass matches."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        customer_distribution)
    from pdf_context_extractor_agent_ray.functions.util import parquet_num_rows

    base = sorted((r["c_count"], r["custdist"])
                  for r in customer_distribution(SF).take_all())
    rebucketed = sorted((r["c_count"], r["custdist"])
                        for r in customer_distribution(SF, num_buckets=7).take_all())
    assert base == rebucketed and base
    d = dict(base)
    assert 0 in d
    assert sum(d.values()) == parquet_num_rows(f"{SF}/customer.parquet")
    assert sum(c * n for c, n in d.items()) == parquet_num_rows(f"{SF}/orders.parquet")


def test_cross_split_contamination_paths_agree(ray_session):
    """Broadcast-set and hash-join paths mark the same eval docs; at
    least one contaminated doc exists in the duplicated corpus and
    every contaminated eval doc's fingerprint really is in train."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.text import (
        cross_split_contamination, dataset_split_batch, fingerprint_batch)

    key = lambda r: (r["doc_id"], r["split"], r["contaminated"])
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    fast = sorted(key(r) for r in cross_split_contamination(ds).take_all())
    slow = sorted(key(r) for r in cross_split_contamination(
        rd.read_parquet(f"{SF}/documents.parquet"),
        broadcast_max_hashes=0).take_all())
    assert fast == slow and fast
    assert any(c for _, _, c in fast), "corpus dups should leak across splits"

    # ground truth recomputed sequentially
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet")
    sp = dataset_split_batch(t).to_pydict()
    fp = fingerprint_batch(t).to_pydict()
    split = dict(zip(sp["doc_id"], sp["split"]))
    h = dict(zip(fp["doc_id"], fp["text_hash"]))
    train = {h[d] for d, s in split.items() if s == "train"}
    want = sorted((d, split[d], int(h[d] in train))
                  for d in split if split[d] != "train")
    assert fast == want


def test_lsh_recall_report_consistent_with_pair_sets(ray_session):
    """The one-row report must equal direct recounts of the two pair
    pipelines it composes: n_common is the true intersection size and
    (because the LSH path exact-verifies candidates) every LSH pair is
    an exact pair, so n_lsh == n_common <= n_exact."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        lsh_candidate_pairs, lsh_recall_report, ngram_jaccard_pairs)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")
    rep = lsh_recall_report(docs(), n_docs=n)
    assert len(rep) == 1
    # forced distributed arm (union + pair-key exchange) must agree
    # with the driver set-intersect arm
    slow = lsh_recall_report(docs(), n_docs=n, driver_max_docs=0)
    assert rep.equals(slow)

    exact = {(r["doc_a"], r["doc_b"])
             for r in ngram_jaccard_pairs(docs(), n_docs=n).take_all()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in lsh_candidate_pairs(docs(), n_docs=n).take_all()}
    row = rep.iloc[0]
    assert row["n_exact_pairs"] == len(exact) > 0
    assert row["n_lsh_pairs"] == len(lsh)
    assert row["n_common_pairs"] == len(exact & lsh)
    assert lsh <= exact


def test_lsh_recall_report_budget_and_sampled_mode(ray_session):
    """r5 guard: a dup-dense corpus must fail FAST with the projected
    pair-partial count on BOTH exact-side paths (driver inverted index
    and distributed shingle groupby), and the sampled mode must equal
    a manual pre-filter of the same deterministic doc stratum."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        lsh_recall_report)
    from pdf_context_extractor_agent_ray.functions.util import (
        bucket_hash, parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")

    # (a) fail-fast guard, driver path then forced distributed path:
    # budget 0 < any projected count -> clear error, no pair emitted
    for kwargs in ({}, {"driver_max_docs": 0}):
        with pytest.raises(ValueError, match="projected .* exceeds"):
            lsh_recall_report(docs(), n_docs=n, max_exact_pairs=0,
                              **kwargs)

    # (b) sampled mode: mod=1 samples everything -> identical counts
    # plus the two disclosure columns
    full = lsh_recall_report(docs(), n_docs=n)
    s1 = lsh_recall_report(docs(), sample_mod=1)
    assert s1[["n_exact_pairs", "n_lsh_pairs", "n_common_pairs"]] \
        .equals(full)
    assert s1.iloc[0]["sample_mod"] == 1
    assert s1.iloc[0]["n_docs_sampled"] == n

    # (c) sampled mode == full report over the manually-filtered
    # stratum (same hash, same mod)
    mod = 3
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet")
    ids = t["doc_id"].to_numpy()
    keep = bucket_hash(ids, mod) == 0
    sub = t.filter(keep)
    manual = lsh_recall_report(
        strip_schema_metadata(rd.from_arrow(sub)), n_docs=int(keep.sum()))
    s3 = lsh_recall_report(docs(), sample_mod=mod)
    assert s3[["n_exact_pairs", "n_lsh_pairs", "n_common_pairs"]] \
        .equals(manual)
    assert s3.iloc[0]["n_docs_sampled"] == int(keep.sum())


def test_corpus_clean_funnel_paths_and_stagewise_agreement(ray_session):
    """The funnel's broadcast arms and every forced join arm (dup-group
    join, row anti-joins, distributed keep-best winner, decontam hash
    join) produce the identical 5-row report; counts are monotone
    non-increasing; and the exact-dedup stage equals the standalone
    exact_dedup contract's distinct-fingerprint count."""
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        corpus_clean_funnel, exact_dedup)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")
    fast = corpus_clean_funnel(docs(), n_docs=n)
    slow = corpus_clean_funnel(docs(), n_docs=n,
                               dup_group_broadcast_max=0,
                               broadcast_max_drops=0,
                               broadcast_max_cluster_docs=0,
                               decontam_broadcast_max=0)
    assert fast.equals(slow)
    counts = fast["n_docs"].tolist()
    assert counts[0] == n
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] > 0
    assert counts[1] == exact_dedup(docs()).count()


def test_dup_source_matrix_paths_and_recount(ray_session):
    """Driver annotate arm and the forced double-join arm emit the
    identical matrix, and the matrix equals a direct pandas recount of
    the verified pair set against the documents' sources."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        dup_source_matrix, lsh_candidate_pairs)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")
    fast = dup_source_matrix(docs(), n_docs=n)
    fast = (fast if isinstance(fast, pd.DataFrame) else fast.to_pandas()) \
        .reset_index(drop=True)
    slow = dup_source_matrix(docs(), n_docs=n, broadcast_max_docs=0)
    slow = (slow if isinstance(slow, pd.DataFrame) else slow.to_pandas()) \
        .reset_index(drop=True)
    assert len(fast) and fast.equals(slow)

    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source"]).to_pandas() \
        .set_index("doc_id")["source"]
    pairs = lsh_candidate_pairs(docs(), n_docs=n).take_all()
    from collections import Counter
    cnt = Counter(tuple(sorted((src[p["doc_a"]], src[p["doc_b"]])))
                  for p in pairs)
    expect = pd.DataFrame(
        [(a, b, c) for (a, b), c in sorted(cnt.items())],
        columns=["source_a", "source_b", "n_pairs"])
    expect["n_pairs"] = expect["n_pairs"].astype("int64")
    assert fast.equals(expect)
    assert fast["n_pairs"].sum() == len(pairs)


def test_funnel_by_source_sums_to_scalar_funnel(ray_session):
    """Per-source attribution is a strict refinement: each stage's
    per-source counts sum to the scalar funnel's stage total (both on
    the broadcast arms and with every join arm forced), and counts
    are monotone non-increasing per source."""
    import pandas as pd
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.dedup import (
        FUNNEL_STAGES, corpus_clean_funnel, corpus_clean_funnel_by_source)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")
    scalar = corpus_clean_funnel(docs(), n_docs=n)
    per_src = corpus_clean_funnel_by_source(docs(), n_docs=n)
    sums = per_src.groupby("stage_idx")["n_docs"].sum()
    for _, r in scalar.iterrows():
        assert sums[r["stage_idx"]] == r["n_docs"]

    forced = corpus_clean_funnel_by_source(
        docs(), n_docs=n, dup_group_broadcast_max=0,
        broadcast_max_drops=0, broadcast_max_cluster_docs=0,
        decontam_broadcast_max=0)
    assert per_src.equals(forced)

    for _, g in per_src.groupby("source"):
        vals = g.sort_values("stage_idx")["n_docs"].tolist()
        assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_embedding_quantize_recall_and_edge_cases(ray_session):
    """int8 quantized-cosine top-k recovers the exact float cosine
    top-k (measured 1.0 mean recall on the synth embeddings; floor
    0.9 for corpus drift), and the quantization summary handles zero
    vectors and pins element ranges (|q_i| <= 127 implies
    qnorm2 <= 127^2 * n_dims)."""
    import pyarrow as pa
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.simsearch import (
        embedding_quantize, knn_topk, load_query_vectors,
        quantized_knn_topk)

    qv = load_query_vectors(SF)
    exact, approx = {}, {}
    for r in knn_topk(rd.read_parquet(f"{SF}/embeddings.parquet"),
                      qv).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in quantized_knn_topk(
            rd.read_parquet(f"{SF}/embeddings.parquet"), qv).take_all():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    summary = embedding_quantize(
        rd.read_parquet(f"{SF}/embeddings.parquet")).to_pandas()
    assert (summary["qnorm2"] <= 127 * 127 * summary["n_dims"]).all()
    assert (summary["maxabs_e9"] > 0).all()  # synth corpus: no zero vecs

    zero = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[0.0, 0.0, 0.0], [1.0, -2.0, 2.0]],
                              pa.list_(pa.float32()))}))
    z = embedding_quantize(zero).to_pandas().set_index("vec_id")
    assert z.loc[1, "maxabs_e9"] == 0 and z.loc[1, "qnorm2"] == 0
    assert z.loc[2, "maxabs_e9"] == 2_000_000_000
    # v=(1,-2,2)/2*127 -> (63.5,-127,127) -> round-half-away (64,-127,127)
    assert z.loc[2, "qsum"] == 64 - 127 + 127
    assert z.loc[2, "qnorm2"] == 64**2 + 127**2 + 127**2


def test_knn_int8_mips_recall_and_overflow_guard(ray_session):
    """knn_int8's integer de-scaled-dot ranking recovers the exact
    float INNER-PRODUCT top-k (it approximates MIPS, not cosine), and
    an embedding space whose scale would overflow the int64 score
    fails loud, not wrong."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd
    from pdf_context_extractor_agent_ray.functions.simsearch import (
        DEFAULT_K, knn_int8, load_query_vectors)

    qv = load_query_vectors(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    M = np.asarray(t["embedding"].to_pylist(), np.float64)
    qids = sorted(qv)
    Q = np.stack([np.asarray(qv[q], np.float64) for q in qids])
    cand = ~np.isin(ids, np.asarray(qids))
    dots = M[cand] @ Q.T
    cids = ids[cand]
    exact = {q: set(cids[np.lexsort((cids, -dots[:, j]))[:DEFAULT_K]])
             for j, q in enumerate(qids)}

    approx = {}
    for r in knn_int8(rd.read_parquet(f"{SF}/embeddings.parquet"),
                      qv).take_all():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    big = rd.from_arrow(pa.table({
        "vec_id": pa.array([10, 11], pa.int64()),
        "embedding": pa.array([[1e6, 0.0, 0.0], [0.0, 1e6, 0.0]],
                              pa.list_(pa.float32()))}))
    with pytest.raises(Exception, match="overflows the int64"):
        knn_int8(big, {0: [1.0, 0.0, 0.0]}).to_pandas()


def test_corpus_clean_funnel_checkpoints(ray_session, tmp_path):
    """Checkpointed production mode: (a) the report equals the
    non-checkpointed run and the stage dirs + markers exist; (b) a
    re-run resumes (proved by TAMPERING stage 1's checkpoint — the
    resumed report reflects the tampered survivor set, so stages were
    LOADED, not recomputed); (c) deleting stage 2+3 after the tamper
    recomputes exactly those from the tampered stage 1 (completed
    PREFIX rule); (d) the terminus parquet reads back ignoring the
    _-prefixed checkpoint dirs."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd
    from pdf_context_extractor_agent_ray import io as dio
    from pdf_context_extractor_agent_ray.functions.dedup import (
        corpus_clean_funnel)
    from pdf_context_extractor_agent_ray.functions.util import (
        parquet_num_rows, strip_schema_metadata)

    def docs():
        return strip_schema_metadata(
            rd.read_parquet(f"{SF}/documents.parquet"))

    n = parquet_num_rows(f"{SF}/documents.parquet")
    out = str(tmp_path / "cleaned")

    plain = corpus_clean_funnel(docs(), n_docs=n)
    first = corpus_clean_funnel(docs(), n_docs=n, output_path=out,
                                checkpoint_stages=True)
    assert first.equals(plain)
    for stage in ("stage1_exact", "stage2_keepbest", "stage3_decontam"):
        assert os.path.exists(f"{out}/_ckpt/{stage}/_SUCCESS")
    assert os.path.exists(f"{out}/_SUCCESS")
    assert dio.read_documents(out).count() == int(plain["n_docs"].iloc[-1])

    # tamper stage 1: keep only even doc_ids of its survivors
    s1 = f"{out}/_ckpt/stage1_exact"
    t = pads.dataset(s1).to_table()
    t = t.filter(pa.array(
        (t["doc_id"].to_numpy(zero_copy_only=False) % 2) == 0))
    shutil.rmtree(s1)
    os.makedirs(s1)
    pq.write_table(t, f"{s1}/part.parquet")
    open(f"{s1}/_SUCCESS", "w").close()

    # resume with stages 2/3 + terminus still marked: everything loads,
    # so the report's stage-1 count is UNCHANGED from its checkpoint's
    # row count only where recomputed — stage 1 count now reflects the
    # tampered file, later counts still come from their own checkpoints
    resumed = corpus_clean_funnel(docs(), n_docs=n, output_path=out,
                                  checkpoint_stages=True)
    assert int(resumed["n_docs"].iloc[1]) == len(t)
    assert int(resumed["n_docs"].iloc[2]) == int(plain["n_docs"].iloc[2])

    # drop stages 2/3 and the terminus: they recompute FROM the
    # tampered stage 1 (prefix rule) and the funnel stays monotone
    shutil.rmtree(f"{out}/_ckpt/stage2_keepbest")
    shutil.rmtree(f"{out}/_ckpt/stage3_decontam")
    os.remove(f"{out}/_SUCCESS")
    redone = corpus_clean_funnel(docs(), n_docs=n, output_path=out,
                                 checkpoint_stages=True)
    counts = redone["n_docs"].tolist()
    assert counts[1] == len(t)
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[2] <= len(t)

    # checkpoint_stages without an output_path is a loud error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus_clean_funnel(docs(), n_docs=n, checkpoint_stages=True)
