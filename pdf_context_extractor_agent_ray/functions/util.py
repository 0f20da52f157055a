"""Small numeric helpers shared by operators and their SQL oracles."""
from __future__ import annotations

import numpy as np


def round_half_away_e(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """Integer-scale with round-half-away-from-zero — DuckDB's round()
    semantics (numpy's default is half-to-even, which diverges on exact
    .5 boundaries)."""
    v = np.asarray(x, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)


def strip_schema_metadata(ds):
    """Drop schema-level metadata from every Arrow block (zero-copy;
    fuses with the upstream read).

    Parquet files written by pandas embed a ``b'pandas'`` key-value
    blob that makes ``pa.Schema`` UNHASHABLE (its metadata compares as
    a dict), so Ray Data's schema-dedup fast path in
    ``transform_pyarrow.unify_schemas`` (``len(set(schemas)) == 1``)
    throws and every shuffle reduce task logs "Failed to hash the
    schemas" and falls back to a full unify. Stripping once at the
    source keeps every downstream groupby/sort/join on the fast path
    and the bench artifact clean.

    Caveat: the appended stage makes ``ds.count()`` execute the plan
    instead of resolving from parquet metadata — callers that gate on
    row counts should resolve them via ``parquet_num_rows`` and pass
    ``n_docs`` explicitly (see ``dedup.lsh_candidate_pairs``).
    """
    import pyarrow as pa  # noqa: F401  (documents the batch type)

    # batch_size=None = one batch per block: the strip itself must not
    # concat blocks (concat unifies the still-dirty schemas and logs
    # the very warning this helper removes)
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow", batch_size=None)


def set_seed_schema(ds, empty_table):
    """Attach a 0-row Arrow table carrying THIS dataset's schema, known
    statically (parquet footer for reads; the map fn applied to the
    upstream seed for chained stages — see ``relational._map_pa``).

    Why: Ray silently SKIPS 0-row blocks everywhere — read tasks emit
    no block when the pushed filter matches nothing, map operators drop
    empty outputs even mid-fused-chain, and the hash shuffle returns
    before the join schema broadcast at ``block.num_rows == 0``. So a
    join side that filters to zero rows presents ZERO blocks and acero
    dies on a schemaless partition ("No match ... for key field").
    The seed lets ``relational._inner_join`` union a 1-row
    schema-anchor sentinel into each side so the broadcast always
    happens. The attribute lives on THIS object only —
    ``map_batches`` returns a new Dataset, so chains must re-seed."""
    ds._graft_seed_table = empty_table
    return ds


def seed_schema_table(ds):
    """The statically-known 0-row schema table of a Dataset (see
    ``set_seed_schema``), or None when none was attached."""
    return getattr(ds, "_graft_seed_table", None)


def mark_known_empty(ds, empty_table):
    """Tag a Dataset as KNOWN empty at plan time (a fully-pruned
    windowed read): join helpers short-circuit driver-side instead of
    executing any exchange. Implies ``set_seed_schema``."""
    ds._graft_known_empty = True
    return set_seed_schema(ds, empty_table)


def known_empty_table(ds):
    """The 0-row schema table of a plan-time-known-empty Dataset (see
    ``mark_known_empty``), or None for a normal Dataset."""
    if getattr(ds, "_graft_known_empty", False):
        return getattr(ds, "_graft_seed_table", None)
    return None


def table_from_pandas(df):
    """``pa.Table.from_pandas(df, preserve_index=False)`` minus the
    ``b'pandas'`` schema-metadata blob it attaches — the blob makes the
    schema unhashable and knocks downstream shuffles off the dedup fast
    path (see ``strip_schema_metadata``)."""
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def parquet_num_rows(path: str) -> int:
    """Row count from the parquet footer (driver-side, no data read) —
    the metadata-cheap count a raw ``read_parquet`` would give, usable
    after ``strip_schema_metadata`` made ``ds.count()`` a full pass."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def parquet_column_max(path: str, column: str):
    """Column max from parquet footer statistics (driver-side, no data
    read); falls back to a single-column scan only when a row group
    lacks min/max stats (pyarrow/pandas writers always emit them for
    integer columns, so the fallback is a defensive path)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index(column)
    maxes = []
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            import pyarrow.compute as pc
            return pc.max(pq.read_table(path, columns=[column])[column]).as_py()
        maxes.append(st.max)
    return max(maxes)


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


def bucket_hash(key, num_buckets: int):
    """THE bucket hash: ``((key * 2654435761) & 0xFFFFFFFF) % buckets``
    as int64. Every co-bucketed union join depends on BOTH sides using
    byte-identical hashing — use this helper, never an inline copy (a
    one-character divergence silently mis-buckets a join with no test
    to catch it at scale)."""
    import numpy as np
    k = np.asarray(key).astype(np.uint64)
    b = ((k * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) % num_buckets
    return b.astype(np.int64)


def disc_percentiles(values, counts, q_nums):
    """THE DuckDB ``percentile_disc`` twin on an ASC-sorted value/count
    histogram: for each q (percent numerator, e.g. 50 for 0.5) the
    smallest value whose cumulative count >= ceil(q*n/100), computed
    in exact integer arithmetic (``(n * q + 99) // 100``) — verified
    against DuckDB for n = 1..300 at every q the repo uses. Every
    discrete-percentile fold must call this helper, never an inline
    copy (a side= or rounding tweak in one copy silently diverges the
    other from the oracle)."""
    import numpy as np

    counts = np.asarray(counts, dtype=np.int64)
    values = np.asarray(values, dtype=np.int64)
    n = int(counts.sum())
    cum = counts.cumsum()
    out = []
    for q in q_nums:
        pos = (n * q + 99) // 100
        out.append(int(values[np.searchsorted(cum, pos, side="left")]))
    return out


def bucket_count(n_rows: int, rows_per_bucket: int,
                 parallelism: int | None = None) -> int:
    """Bucket count for hash-bucketed ``groupby(bucket).map_groups``
    folds: enough buckets to (a) bound per-bucket rows (a bucket block
    must fit a worker heap) AND (b) keep every core busy at small
    scale — a single bucket serializes the fold behind the exchange
    and costs 3-6x wall (measured: customer_distribution 18.3 s at one
    bucket vs 3.0 s at 32 on sf0.1/32 cpus). Only valid where bucket
    count is semantically free (pure hash-bucketed folds) — NOT for
    semantic bucket counts like pack_sequences' PACK_BUCKETS."""
    if parallelism is None:
        try:
            import ray
            parallelism = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            parallelism = 4
    return max(1, parallelism, -(-n_rows // rows_per_bucket))
