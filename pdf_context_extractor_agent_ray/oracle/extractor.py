"""Sequential single-process oracle.

Runs the shared per-document extraction (`docproc.extract_document`) in
a plain Python loop over a pyarrow Table — the reference
implementation the Ray pipeline must match span-for-span
(kind, text, media_ref, order) per doc_id, independent of batching,
parallelism, and block order. Mirrors the reference's single-threaded
execution model (main.py:500-547: one document at a time).
"""
from __future__ import annotations

import pyarrow as pa

from .. import docproc
from ..schema import OUTPUT_SCHEMA, docs_to_table  # noqa: F401 (docs_to_table re-exported for tests)


def extract_doc_dict(doc: dict) -> dict:
    """Oracle for one document given as {'doc_id', 'spans': [(k,t,r,o)]}."""
    spans = sorted(doc["spans"], key=lambda s: s[3])
    kinds = [s[0] for s in spans]
    texts = [s[1] for s in spans]
    refs = [s[2] for s in spans]
    offs = [s[3] for s in spans]
    res = docproc.extract_document(kinds, texts, refs, offs)
    return {
        "doc_id": doc["doc_id"],
        "spans": list(zip(res["kinds"], res["texts"], res["media_refs"], res["offsets"])),
        "valid": res["valid"],
        "confidence": res["confidence"],
        "statement_type": res["statement_type"],
        "errors": res["errors"],
    }


def extract_table(table: pa.Table) -> pa.Table:
    """Sequential oracle over an input documents table."""
    rows = table.to_pylist()
    out = []
    for row in rows:
        spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        r = extract_doc_dict({"doc_id": row["doc_id"], "spans": spans})
        out.append({
            "doc_id": r["doc_id"],
            "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                      for (k, t, m, o) in r["spans"]],
            "valid": r["valid"],
            "confidence": r["confidence"],
            "statement_type": r["statement_type"],
            "errors": r["errors"],
        })
    return pa.Table.from_pylist(out, schema=OUTPUT_SCHEMA)
