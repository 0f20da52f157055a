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

BLOOM_BITS_PER_KEY = 20
BLOOM_K = 8


class BloomFilter:
    """Manifest-embedded Bloom filter over a partition's doc_ids.

    Double hashing over the two 64-bit halves of blake2b(doc_id):
    position_i = (h1 + i*h2) % m. No false negatives; false-positive
    rate ~1.4e-4 at 20 bits/key, k=8 — at resume time a false positive
    skips an unprocessed doc, so this is the AT-SCALE path gated behind
    an exact-set default (see pipelines.extraction.run_resumable)."""

    def __init__(self, m_bits: int, k: int = BLOOM_K,
                 bits: Optional[bytearray] = None) -> None:
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else bytearray((m_bits + 7) // 8)

    @staticmethod
    def _hashes(doc_id: str) -> tuple[int, int]:
        import hashlib
        d = hashlib.blake2b(doc_id.encode(), digest_size=16).digest()
        return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1

    def add(self, doc_id: str) -> None:
        h1, h2 = self._hashes(doc_id)
        for i in range(self.k):
            p = (h1 + i * h2) % self.m
            self.bits[p >> 3] |= 1 << (p & 7)

    def might_contain(self, doc_id: str) -> bool:
        h1, h2 = self._hashes(doc_id)
        for i in range(self.k):
            p = (h1 + i * h2) % self.m
            if not self.bits[p >> 3] & (1 << (p & 7)):
                return False
        return True

    @staticmethod
    def hash_batch(doc_ids: list[str]):
        """(h1, h2) uint64 arrays for a batch — one blake2b per doc,
        shared across every partition Bloom a CompletedFilter probes."""
        import hashlib
        import numpy as np
        b2 = hashlib.blake2b
        h1 = np.empty(len(doc_ids), np.uint64)
        h2 = np.empty(len(doc_ids), np.uint64)
        for j, d in enumerate(doc_ids):
            dig = b2(d.encode(), digest_size=16).digest()
            h1[j] = int.from_bytes(dig[:8], "big")
            h2[j] = int.from_bytes(dig[8:], "big") | 1
        return h1, h2

    def might_contain_batch(self, h1, h2):
        """Vectorized probe over pre-hashed ids (``hash_batch``).

        Bit-exact with the scalar path: Python computes
        ``(h1 + i*h2) % m`` in arbitrary precision (the sum exceeds
        2^64), so the numpy twin reduces both operands mod m FIRST —
        ``((h1 % m) + i*(h2 % m)) % m`` is the same residue and stays
        under 2^64 for any m < 2^59 (m is 20 bits/key, so that bound is
        ~2.8e16 keys per partition)."""
        import numpy as np
        assert self.m < 1 << 59, self.m
        bits = np.frombuffer(bytes(self.bits), dtype=np.uint8)
        m = np.uint64(self.m)
        r1 = h1 % m
        r2 = h2 % m
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            p = (r1 + np.uint64(i) * r2) % m
            byte = bits[(p >> np.uint64(3)).astype(np.int64)]
            out &= ((byte >> (p & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        return out

    @classmethod
    def build(cls, doc_ids, n_expected: Optional[int] = None) -> "BloomFilter":
        ids = list(doc_ids)
        m = max(1024, BLOOM_BITS_PER_KEY * (n_expected or len(ids)))
        bf = cls(m)
        for d in ids:
            bf.add(str(d))
        return bf

    def to_manifest(self) -> dict[str, Any]:
        import base64
        return {"m": self.m, "k": self.k,
                "b64": base64.b64encode(bytes(self.bits)).decode()}

    @classmethod
    def from_manifest(cls, d: dict[str, Any]) -> "BloomFilter":
        import base64
        return cls(d["m"], d["k"], bytearray(base64.b64decode(d["b64"])))


def read_documents(path: str, columns: Optional[list[str]] = None):
    """Read a documents/output table as a Ray Dataset. Format by path
    suffix: ``.lance`` (when pylance is available), ``.jsonl``/``.json``
    (a JSON-lines interchange dir written by ``write_documents``), else
    Parquet."""
    import ray.data as rd
    if HAVE_LANCE and str(path).endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    if str(path).endswith((".jsonl", ".json")):
        from .schema import docs_to_table
        ds = rd.read_json(path)

        def coerce(batch):
            # JSON roundtrips span structs as dicts with inferred int64
            # offsets — rebuild the spans column through the canonical
            # schema so every downstream stage sees DOCUMENT_SCHEMA's
            # span type; all OTHER columns (valid, statement_type, ...)
            # pass through untouched
            if "spans" in batch.column_names:
                docs = [{"doc_id": d,
                         "spans": [(s["kind"], s["text"], s["media_ref"],
                                    s["offset"]) for s in spans]}
                        for d, spans in zip(batch["doc_id"].to_pylist(),
                                            batch["spans"].to_pylist())]
                canon = docs_to_table(docs)
                batch = batch.set_column(
                    batch.column_names.index("spans"), "spans",
                    canon.column("spans"))
            if columns is not None:
                batch = batch.select(columns)
            return batch

        return ds.map_batches(coerce, batch_format="pyarrow")
    return rd.read_parquet(path, columns=columns)


def write_documents(ds, path: str, **kwargs) -> None:
    """Write a documents/output Dataset (format by path suffix, as in
    ``read_documents``; default partitioned Parquet)."""
    if HAVE_LANCE and str(path).endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
    elif str(path).endswith((".jsonl", ".json")):
        ds.write_json(path, **kwargs)
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


STALE_TMP_AGE_SEC = 3600


def sweep_stale_tmp_dirs(output_path: str,
                         min_age_sec: float = STALE_TMP_AGE_SEC) -> int:
    """Delete orphaned ``.part-*`` tmp dirs left by crashed writes.

    A crashed run's tmp dir is invisible to readers (dot-prefixed,
    never renamed) but holds the failed partition's full parquet
    payload forever. Age-gated so a CONCURRENT writer's live tmp dir
    (another shard mid-write) is never touched — the same pragmatic
    contract as Hadoop/Spark ``_temporary`` cleanup. The age is the
    NEWEST mtime inside the dir (the dir's own mtime only changes when
    a file is created/renamed, so a slow shard streaming into one
    large file for over an hour would look stale by dir-mtime and get
    swept mid-write by a concurrent writer). Returns the number of
    dirs removed."""
    import shutil
    removed = 0
    if not os.path.isdir(output_path):
        return 0
    now = time.time()
    for name in os.listdir(output_path):
        p = os.path.join(output_path, name)
        if not (name.startswith(".part-") and os.path.isdir(p)):
            continue
        newest = os.path.getmtime(p)
        try:
            for f in os.listdir(p):
                newest = max(newest, os.path.getmtime(os.path.join(p, f)))
        except OSError:
            continue  # concurrently renamed/removed — not ours to touch
        if now - newest > min_age_sec:
            shutil.rmtree(p, ignore_errors=True)
            removed += 1
    return removed


def write_partition(ds, output_path: str, part_index: int,
                    lineage: Optional[dict[str, Any]] = None) -> dict[str, Any]:
    """Write one finished partition atomically: stream to a tmp dir,
    write the manifest, rename into place. Idempotent — a crashed write
    leaves no half-visible partition (its stale tmp dir is swept by the
    next write once older than STALE_TMP_AGE_SEC)."""
    os.makedirs(output_path, exist_ok=True)
    sweep_stale_tmp_dirs(output_path)
    final_dir = os.path.join(output_path, f"part-{part_index:05d}")
    tmp_dir = tempfile.mkdtemp(prefix=f".part-{part_index:05d}-", dir=output_path)
    t0 = time.time()
    ds.write_parquet(tmp_dir)

    num_docs = 0
    num_valid = 0
    min_id: Optional[str] = None
    max_id: Optional[str] = None
    all_ids: list[str] = []
    for f in os.listdir(tmp_dir):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(tmp_dir, f), columns=["doc_id", "valid"])
        num_docs += t.num_rows
        num_valid += sum(1 for v in t.column("valid").to_pylist() if v)
        if t.num_rows:
            ids = t.column("doc_id").to_pylist()
            all_ids.extend(ids)
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
        # per-partition Bloom: resume can filter from manifests alone,
        # independent of corpus size (see completed_filter)
        "bloom": BloomFilter.build(all_ids).to_manifest(),
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


class CompletedFilter:
    """Manifest-only membership test over finished partitions: per
    partition, a doc_id-range prune then the partition's Bloom. No
    false negatives; a false positive (~1.4e-4/doc within a matching id
    range) skips an already-range-colliding doc — acceptable for the
    at-scale resume path, which is why the exact-set path stays the
    default below RESUME_EXACT_MAX_DOCS."""

    def __init__(self, parts: list[tuple[str, str, BloomFilter]]) -> None:
        self.parts = parts

    def might_contain(self, doc_id: str) -> bool:
        for lo, hi, bf in self.parts:
            if lo <= doc_id <= hi and bf.might_contain(doc_id):
                return True
        return False

    def might_contain_batch(self, doc_ids: list[str]):
        """Vectorized membership over a batch: hash each id once, then
        per partition a numpy range prune + batched Bloom probe on the
        not-yet-matched, in-range subset only."""
        import numpy as np
        out = np.zeros(len(doc_ids), dtype=bool)
        if not len(doc_ids) or not self.parts:
            return out
        ids = np.asarray(doc_ids, dtype=np.str_)
        h1, h2 = BloomFilter.hash_batch(doc_ids)
        for lo, hi, bf in self.parts:
            mask = (ids >= lo) & (ids <= hi) & ~out
            if mask.any():
                idx = np.flatnonzero(mask)
                out[idx] = bf.might_contain_batch(h1[idx], h2[idx])
        return out


def completed_filter(output_path: str) -> Optional[CompletedFilter]:
    """Build the manifest-only resume filter; None when any finished
    partition predates Bloom manifests (caller falls back to the exact
    column scan)."""
    parts = []
    for m in load_manifests(output_path):
        if m.get("num_docs", 0) == 0:
            continue  # an empty partition (no-op resume) can't contain any doc
        if "bloom" not in m or m["doc_id_min"] is None:
            return None
        parts.append((m["doc_id_min"], m["doc_id_max"],
                      BloomFilter.from_manifest(m["bloom"])))
    return CompletedFilter(parts)
