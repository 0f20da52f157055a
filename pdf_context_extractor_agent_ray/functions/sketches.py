"""Mergeable sketches: one serialized sketch per batch, merged in a
tiny second stage (the sketch pattern from the Ray guide — designed
for exactly this per-batch-emit / merge shape).

HyperLogLog (p=12, md5-derived 64-bit hashes) for approximate distinct
counts. The estimate is a pure function of the VALUE SET (registers
are element-wise maxima), so it is deterministic and invariant to
partitioning/batching — and since r3 it is SQL-replicable bit-for-bit:
the harmonic sum is folded as an EXACT integer (sum of 2^(64-reg) —
float summation order would differ between numpy and DuckDB in the
last ulp), the alpha*m^2*2^64 numerator is a single precomputed double
literal shared with the oracle SQL, and rounding is floor(e + 0.5) on
both sides (Python round() is half-even, DuckDB round() half-away).
The only residual implementation dependence is libm ln() in the
linear-counting branch — sub-ulp, and deterministic per corpus.
"""
from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# the raw-estimate numerator alpha * m^2 * 2^64 as ONE double literal:
# repr() round-trips, so the oracle SQL interpolates the same value
EST_NUMER = _ALPHA * HLL_M * HLL_M * 2.0 ** 64


def _registers(values: list[str]) -> np.ndarray:
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if not values:
        return regs
    hs = np.frombuffer(
        b"".join(hashlib.md5(v.encode()).digest()[:8] for v in values), dtype=">u8")
    idx = (hs >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (hs << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining bits + 1 (>=1 always:
    # x < 2^(64-k) <=> lz(x) >= k, so rank = 1 + max such k)
    ranks = np.ones(len(hs), dtype=np.uint8)
    for k in range(1, 64 - HLL_P + 1):
        mask = rest < np.uint64(1) << np.uint64(64 - k)
        ranks[mask] = k + 1
    np.maximum.at(regs, idx, ranks)
    return regs


def estimate(regs: np.ndarray) -> int:
    # exact integer harmonic sum: sum over registers of 2^(64-reg),
    # via the register-value histogram (<= 53 distinct values)
    counts = np.bincount(regs.astype(np.int64), minlength=65)
    inv_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    e = EST_NUMER / float(inv_int)
    zeros = int(counts[0])
    if e <= 2.5 * HLL_M and zeros:
        e = HLL_M * math.log(HLL_M / zeros)  # linear counting
    return int(math.floor(e + 0.5))


def approx_distinct_tokens(sf_dir: str):
    """Approximate distinct whitespace-token count over documents:
    per-batch HLL sketch → element-wise-max merge → estimate."""
    import ray.data as rd
    from .text import norm_expr

    from .util import strip_schema_metadata

    ds = strip_schema_metadata(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]))

    def sketch(batch: pa.Table) -> pa.Table:
        norm = norm_expr(batch["text"])
        toks: set[str] = set()
        for n in norm.to_pylist():
            if n:  # '' would register a phantom token for empty docs
                toks.update(n.split(" "))
        regs = _registers(sorted(toks))
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    def merge(batch: pa.Table) -> pa.Table:
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for b in batch["sketch"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pa.table({
            "n_distinct_tokens_approx": pa.array([estimate(merged)], pa.int64())})

    return ds.map_batches(sketch, batch_format="pyarrow") \
        .repartition(1).map_batches(merge, batch_format="pyarrow")
