"""Small numeric helpers shared by operators and their SQL oracles."""
from __future__ import annotations

import numpy as np


def round_half_away_e(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """Integer-scale with round-half-away-from-zero — DuckDB's round()
    semantics (numpy's default is half-to-even, which diverges on exact
    .5 boundaries)."""
    v = np.asarray(x, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)


def finish_grouped(partials, keys: list[str],
                   aggs: dict[str, str] | None = None):
    """Finish a pre-aggregated partial stream (one row per key per
    input batch) whose key cardinality is BOUNDED — statement flags,
    regions, market segments, sources, labels, query ids, time
    windows: coalesce the tiny partials to one block and fold with a
    single vectorized pandas groupby.

    This replaces ``Dataset.groupby(...).aggregate(...)`` for bounded
    keys: the hash-aggregate exchange costs a fixed ~2-3 s regardless
    of row count AND its reduce stage emits empty partitions as
    zero-schema blocks (``RefBundle ... different schema`` warnings;
    reproducible on a bare range→groupby→aggregate, Ray-internal).
    The partials are a few rows per input block, so the single
    partition holds keys × blocks rows, never corpus-proportional
    data. ``aggs``: output column -> 'sum' | 'max' | 'min'; None sums
    every non-key column.
    """
    import pandas as pd

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        a = aggs or {c: "sum" for c in df.columns if c not in keys}
        return df.groupby(keys, as_index=False).agg(a) \
            .sort_values(keys).reset_index(drop=True)

    return partials.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)
