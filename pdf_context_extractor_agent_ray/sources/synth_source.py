"""Distributed synthetic-corpus sources.

Corpus generation is itself a Ray Data stage (``range`` →
``map_batches``) so no document is ever materialized on the driver —
the generator is deterministic per doc_id (synth.py), so partitioning
and parallelism don't change the corpus.
"""
from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..schema import docs_to_table
from ..synth import generate_doc


def _docs_batch_from_keys(keys: list[str]) -> pa.Table:
    docs = [generate_doc(k) for k in keys]
    return docs_to_table([{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs])


def synth_documents(n_docs: int, seed: int = 42, prefix: str = "synth",
                    override_parallelism: Optional[int] = None):
    """Dataset of ``n_docs`` deterministic documents, generated in
    parallel across the cluster."""
    import ray.data as rd

    ds = rd.range(n_docs, override_num_blocks=override_parallelism)

    def gen(batch: pa.Table) -> pa.Table:
        keys = [f"{prefix}-{seed}-{int(i):06d}" for i in batch.column("id").to_pylist()]
        return _docs_batch_from_keys(keys)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)


def documents_from_flat(sf_dir: str, limit: Optional[int] = None):
    """Derive the interleaved span corpus deterministically from the
    driver's flat ``documents.parquet`` (doc_id keys only — the span
    payload is generated; TESTDATA documents do not carry spans)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    if limit is not None:
        ds = ds.limit(limit)

    def gen(batch: pa.Table) -> pa.Table:
        keys = [f"doc-{int(i):08d}" for i in batch.column("doc_id").to_pylist()]
        return _docs_batch_from_keys(keys)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)
