"""JSON scalar functions over string payload columns (§2.8 parity —
the reference parses JSON configs/LLM responses; the engine exposes
field extraction + aggregation over a JSON column at scale)."""
from __future__ import annotations

import json
import math

import pyarrow as pa


def events_json_stats(sf_dir: str):
    """Parse ``events.props`` JSON per row, extract the ``k`` field,
    aggregate per event_type (partials per batch → small groupby)."""
    import ray.data as rd
    from ray.data.aggregate import Sum, Max, Count

    from .util import strip_schema_metadata

    ds = strip_schema_metadata(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]))

    def extract(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch["props"].to_pylist():
            # mirror the oracle's coalesce(CAST(json_extract(...)), 0):
            # non-object roots ('null', '5', '[1]') and missing/non-
            # numeric k degrade to 0; float k rounds half-away like a
            # DuckDB numeric cast
            try:
                v = json.loads(p)
                k = v.get("k") if isinstance(v, dict) else None
                if isinstance(k, bool) or not isinstance(k, (int, float)):
                    ks.append(0)
                elif isinstance(k, int):
                    ks.append(k)
                else:
                    ks.append(int(math.floor(abs(k) + 0.5)) * (1 if k >= 0 else -1))
            except (json.JSONDecodeError, TypeError, ValueError):
                ks.append(0)
        return pa.table({"event_type": batch["event_type"],
                         "k": pa.array(ks, pa.int64())})

    from .util import finish_grouped

    def partial(batch: pa.Table) -> pa.Table:
        return extract(batch).group_by("event_type").aggregate(
            [("k", "count"), ("k", "sum"), ("k", "max")]) \
            .rename_columns(["event_type", "n", "sum_k", "max_k"])

    return finish_grouped(ds.map_batches(partial, batch_format="pyarrow"),
                          ["event_type"],
                          {"n": "sum", "sum_k": "sum", "max_k": "max"})
