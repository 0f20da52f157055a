"""Schema-metadata hygiene contracts (functions/util.py).

Parquet written by pandas embeds a ``b'pandas'`` schema-metadata blob
that makes ``pa.Schema`` unhashable, which knocks every downstream
shuffle off Ray Data's schema-dedup fast path. These tests pin the
three helpers that keep the engine metadata-free, and that the
explicit-``n_docs`` gate path agrees with the default-count path.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from pdf_context_extractor_agent_ray.functions.util import (
    parquet_num_rows,
    strip_schema_metadata,
    table_from_pandas,
)

SF = "/root/testdata/sf0.01"
DOCS = f"{SF}/documents.parquet"


def test_testdata_metadata_is_unhashable_and_strip_restores_hashability(
        ray_session):
    # the premise: driver-written parquet really does carry the blob
    dirty = pq.read_schema(DOCS)
    assert dirty.metadata and b"pandas" in dirty.metadata
    try:
        hash(dirty)
        premise_holds = False
    except TypeError:
        premise_holds = True
    assert premise_holds, "pandas metadata became hashable; strip may be moot"

    ds = strip_schema_metadata(rd.read_parquet(DOCS))
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        assert batch.schema.metadata is None
        hash(batch.schema)  # must not raise
        break


def test_strip_preserves_rows_and_values(ray_session):
    raw = rd.read_parquet(DOCS, columns=["doc_id"])
    stripped = strip_schema_metadata(rd.read_parquet(DOCS, columns=["doc_id"]))
    a = sorted(r["doc_id"] for r in raw.take_all())
    b = sorted(r["doc_id"] for r in stripped.take_all())
    assert a == b


def test_table_from_pandas_drops_blob():
    import pandas as pd
    t = table_from_pandas(pd.DataFrame({"x": [1, 2], "y": ["a", "b"]}))
    assert t.schema.metadata is None
    hash(t.schema)
    assert t.column("x").to_pylist() == [1, 2]


def test_parquet_num_rows_matches_count(ray_session):
    assert parquet_num_rows(DOCS) == rd.read_parquet(DOCS).count()


def test_explicit_n_docs_gate_agrees_with_default(ray_session):
    from pdf_context_extractor_agent_ray.functions.dedup import (
        lsh_candidate_pairs,
    )

    def key_set(out):
        return {(r["doc_a"], r["doc_b"], r["jaccard_e6"])
                for r in out.take_all()}

    docs = lambda: strip_schema_metadata(rd.read_parquet(DOCS))  # noqa: E731
    n = parquet_num_rows(DOCS)
    assert key_set(lsh_candidate_pairs(docs(), n_docs=n)) \
        == key_set(lsh_candidate_pairs(docs()))
