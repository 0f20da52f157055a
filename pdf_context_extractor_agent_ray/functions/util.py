"""Small numeric helpers shared by operators and their SQL oracles."""
from __future__ import annotations

import numpy as np


def round_half_away_e(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """Integer-scale with round-half-away-from-zero — DuckDB's round()
    semantics (numpy's default is half-to-even, which diverges on exact
    .5 boundaries)."""
    v = np.asarray(x, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)
