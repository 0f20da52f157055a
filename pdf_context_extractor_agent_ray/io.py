"""Format-pluggable document IO + resumable partitioned sink.

Storage per the north rule is a Lance table; ``pylance`` is not
installable in this sandbox (no package index), so the IO layer
negotiates: Lance when importable, Parquet fallback with the identical
Arrow schema (SURVEY.md §1.3). All tests/bench run on the Parquet path.

The sink is the checkpoint/lineage layer (SURVEY.md §4.2): each run
writes ``{out}/part-{run:05d}/`` atomically (tmp dir + rename) plus a
``manifest.json`` carrying doc counts, lineage (input path, stage
version) and metrics. ``completed_doc_ids`` reads only the ``doc_id``
column of finished partitions, so a restarted run anti-joins them out
and never reprocesses a document (J4 in SURVEY.md §2.4).
"""
from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Optional

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not installable in this sandbox
    import lance  # type: ignore
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

STAGE_VERSION = "r1"
MANIFEST_NAME = "_manifest.json"


def read_documents(path: str, columns: Optional[list[str]] = None):
    """Read a documents/output table as a Ray Dataset (Lance if the path
    is a Lance dataset and pylance is available, else Parquet)."""
    import ray.data as rd
    if HAVE_LANCE and str(path).endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_documents(ds, path: str, **kwargs) -> None:
    """Write a documents/output Dataset (Lance when available and the
    path requests it, else partitioned Parquet)."""
    if HAVE_LANCE and str(path).endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def _partition_dirs(output_path: str) -> list[str]:
    if not os.path.isdir(output_path):
        return []
    out = []
    for name in sorted(os.listdir(output_path)):
        p = os.path.join(output_path, name)
        if name.startswith("part-") and os.path.isdir(p) \
                and os.path.exists(os.path.join(p, MANIFEST_NAME)):
            out.append(p)
    return out


def completed_doc_ids(output_path: str) -> set[str]:
    """Doc ids already extracted by finished (manifested) partitions —
    a column-pruned read; at very large scale this becomes a broadcast
    set / Bloom filter shipped via ``ray.put``."""
    ids: set[str] = set()
    for part in _partition_dirs(output_path):
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(part, f), columns=["doc_id"])
                ids.update(t.column("doc_id").to_pylist())
    return ids


def next_partition_index(output_path: str) -> int:
    parts = _partition_dirs(output_path)
    if not parts:
        return 0
    return max(int(os.path.basename(p).split("-")[1]) for p in parts) + 1


def write_partition(ds, output_path: str, part_index: int,
                    lineage: Optional[dict[str, Any]] = None) -> dict[str, Any]:
    """Write one finished partition atomically: stream to a tmp dir,
    write the manifest, rename into place. Idempotent — a crashed write
    leaves no half-visible partition."""
    os.makedirs(output_path, exist_ok=True)
    final_dir = os.path.join(output_path, f"part-{part_index:05d}")
    tmp_dir = tempfile.mkdtemp(prefix=f".part-{part_index:05d}-", dir=output_path)
    t0 = time.time()
    ds.write_parquet(tmp_dir)

    num_docs = 0
    num_valid = 0
    min_id: Optional[str] = None
    max_id: Optional[str] = None
    for f in os.listdir(tmp_dir):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(tmp_dir, f), columns=["doc_id", "valid"])
        num_docs += t.num_rows
        num_valid += sum(1 for v in t.column("valid").to_pylist() if v)
        if t.num_rows:
            ids = t.column("doc_id").to_pylist()
            lo, hi = min(ids), max(ids)
            min_id = lo if min_id is None or lo < min_id else min_id
            max_id = hi if max_id is None or hi > max_id else max_id

    manifest = {
        "part": part_index,
        "num_docs": num_docs,
        "num_valid": num_valid,
        "doc_id_min": min_id,
        "doc_id_max": max_id,
        "stage_version": STAGE_VERSION,
        "wall_time_sec": round(time.time() - t0, 3),
        "lineage": lineage or {},
    }
    with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp_dir, final_dir)
    return manifest


def load_manifests(output_path: str) -> list[dict[str, Any]]:
    out = []
    for part in _partition_dirs(output_path):
        with open(os.path.join(part, MANIFEST_NAME)) as f:
            out.append(json.load(f))
    return out
