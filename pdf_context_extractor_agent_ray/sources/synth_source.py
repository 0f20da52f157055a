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


def flat_num_docs(sf_dir: str) -> int:
    """Row count of the flat documents table from parquet metadata only
    (no data read) — used to cap actor-pool size on small inputs."""
    import pyarrow.parquet as pq
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def ensure_spans_parquet(sf_dir: str) -> str:
    """Materialize the deterministic interleaved span corpus for
    ``sf_dir`` as a FLAT parquet artifact under /tmp (one row per span:
    doc_id, span_idx, kind, text, media_ref, offset) and return its
    path.

    This is the SQL-oracle twin of ``documents_from_flat``: DuckDB
    queries over this table must agree with Ray pipelines over the
    nested Dataset because both derive from the same per-doc_id
    generator. Written once per (synth version, sf dir) via tmp-file +
    atomic rename; safe under concurrent callers.
    """
    import os
    import tempfile

    import pyarrow.parquet as pq

    from ..synth import SYNTH_VERSION, generate_doc

    import hashlib

    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    # cache key: version + FULL path + doc-id-set hash — basename alone
    # would collide two same-named sf dirs, and a regenerated
    # documents.parquet must invalidate the artifact
    id_hash = hashlib.md5(
        ",".join(str(i) for i in src.column("doc_id").to_pylist()).encode()
    ).hexdigest()[:16]
    dir_key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_spans/v{SYNTH_VERSION}/{base}-{dir_key}-{id_hash}"
    path = f"{out_dir}/documents_spans.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    cols = {"doc_id": [], "span_idx": [], "kind": [], "text": [],
            "media_ref": [], "offset": []}
    for i in src.column("doc_id").to_pylist():
        d = generate_doc(f"doc-{int(i):08d}")
        for idx, (k, t, r, o) in enumerate(d["spans"]):
            cols["doc_id"].append(d["doc_id"])
            cols["span_idx"].append(idx)
            cols["kind"].append(k)
            cols["text"].append(t)
            cols["media_ref"].append(r)
            cols["offset"].append(o)
    table = pa.table({
        "doc_id": pa.array(cols["doc_id"], pa.string()),
        "span_idx": pa.array(cols["span_idx"], pa.int32()),
        "kind": pa.array(cols["kind"], pa.string()),
        "text": pa.array(cols["text"], pa.string()),
        "media_ref": pa.array(cols["media_ref"], pa.string()),
        "offset": pa.array(cols["offset"], pa.int32()),
    })
    fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=out_dir)
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.rename(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def _engine_code_hash() -> str:
    """Hash of every source module on the sequential-oracle extraction
    path (docproc + patterns + oracle.extractor + schema). Part of the
    extracted-oracle cache key so the artifact can never silently
    diverge from the engine after a code change — the file-bytes hash
    plays the role SYNTH_VERSION plays for the generator."""
    import hashlib
    import os

    from .. import docproc, patterns, schema
    from ..oracle import extractor

    h = hashlib.md5()
    for mod in (docproc, patterns, extractor, schema):
        with open(os.path.abspath(mod.__file__), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def ensure_extracted_spans_parquet(sf_dir: str) -> tuple[str, str]:
    """Materialize the SEQUENTIAL-oracle extraction output for
    ``sf_dir`` as flat parquet artifacts under /tmp and return
    ``(spans_path, docs_path)``.

    - spans: one row per OUTPUT span (doc_id, span_idx, kind, text,
      media_ref) in emission order;
    - docs: one row per document (doc_id, valid) so zero-span docs
      survive the SQL aggregation (LEFT JOIN + md5('')).

    This is the driver-gate twin of ``extraction_pipeline``: the
    oracle runs `oracle.extractor.extract_doc_dict` one document at a
    time in a single process (the reference's execution model), so a
    DuckDB summary over these artifacts checks the DISTRIBUTED
    pipeline — partitioning, batching, ordering, actor pools — against
    the sequential semantics, span-for-span via the per-doc md5.
    Written once per (synth version, engine-code hash, sf dir) via
    tmp-file + atomic rename; safe under concurrent callers.
    """
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    from ..oracle.extractor import extract_doc_dict
    from ..synth import SYNTH_VERSION, generate_doc

    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = src.column("doc_id").to_pylist()
    id_hash = hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()[:16]
    dir_key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.basename(os.path.normpath(sf_dir))
    out_dir = (f"/tmp/graft_extract/v{SYNTH_VERSION}-{_engine_code_hash()}/"
               f"{base}-{dir_key}-{id_hash}")
    spans_path = f"{out_dir}/extracted_spans.parquet"
    docs_path = f"{out_dir}/extracted_docs.parquet"
    if os.path.exists(spans_path) and os.path.exists(docs_path):
        return spans_path, docs_path
    os.makedirs(out_dir, exist_ok=True)
    s_cols = {"doc_id": [], "span_idx": [], "kind": [], "text": [],
              "media_ref": []}
    d_cols = {"doc_id": [], "valid": []}
    for i in ids:
        doc = generate_doc(f"doc-{int(i):08d}")
        res = extract_doc_dict(doc)
        d_cols["doc_id"].append(res["doc_id"])
        d_cols["valid"].append(res["valid"])
        for idx, (k, t, r, _o) in enumerate(res["spans"]):
            s_cols["doc_id"].append(res["doc_id"])
            s_cols["span_idx"].append(idx)
            s_cols["kind"].append(k)
            s_cols["text"].append(t)
            s_cols["media_ref"].append(r)
    spans_tbl = pa.table({
        "doc_id": pa.array(s_cols["doc_id"], pa.string()),
        "span_idx": pa.array(s_cols["span_idx"], pa.int32()),
        "kind": pa.array(s_cols["kind"], pa.string()),
        "text": pa.array(s_cols["text"], pa.string()),
        "media_ref": pa.array(s_cols["media_ref"], pa.string()),
    })
    docs_tbl = pa.table({
        "doc_id": pa.array(d_cols["doc_id"], pa.string()),
        "valid": pa.array(d_cols["valid"], pa.bool_()),
    })
    for tbl, path in ((spans_tbl, spans_path), (docs_tbl, docs_path)):
        fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=out_dir)
        os.close(fd)
        try:
            pq.write_table(tbl, tmp)
            os.rename(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return spans_path, docs_path


def documents_from_flat(sf_dir: str, limit: Optional[int] = None):
    """Derive the interleaved span corpus deterministically from the
    driver's flat ``documents.parquet`` (doc_id keys only — the span
    payload is generated; TESTDATA documents do not carry spans)."""
    import ray.data as rd

    from ..functions.util import strip_schema_metadata

    # strip the pandas parquet metadata per-block so gen's 256-row
    # batching concat unifies hashable schemas (util.strip_schema_metadata)
    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]))
    if limit is not None:
        ds = ds.limit(limit)

    def gen(batch: pa.Table) -> pa.Table:
        keys = [f"doc-{int(i):08d}" for i in batch.column("doc_id").to_pylist()]
        return _docs_batch_from_keys(keys)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)
