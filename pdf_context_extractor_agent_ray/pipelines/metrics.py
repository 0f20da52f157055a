"""Run-level metrics rollup (A6/A7): per-batch partial counters →
one tiny global aggregate, recorded into partition manifests by the
resumable runner. Mirrors the reference's match statistics and run
summaries (balance_sheet.py:264-273, scripts/extract_full_notes.py:119-127)."""
from __future__ import annotations

import pyarrow as pa

from ..schema import spans_column_views

_KINDS = ["item", "subtotal", "total", "unmatched",
          "note_title", "note_text", "note_table", "media", "error"]


def run_metrics(out_ds):
    """Global metrics over an extraction output Dataset: doc counts,
    valid counts, span counts per kind, error count — partials per
    batch, then a single-row aggregate (no wide shuffle)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _ids, offs, kinds, _t, _r, _o = spans_column_views(batch)
        counts = {k: 0 for k in _KINDS}
        for k in kinds:
            if k in counts:
                counts[k] += 1
        n_err = sum(len(e) for e in batch.column("errors").to_pylist())
        n_valid = sum(1 for v in batch.column("valid").to_pylist() if v)
        row = {"n_docs": [len(batch)], "n_valid": [n_valid], "n_errors": [n_err]}
        for k in _KINDS:
            row[f"n_{k}"] = [counts[k]]
        return pa.table(row)

    aggs = [Sum("n_docs", alias_name="n_docs"),
            Sum("n_valid", alias_name="n_valid"),
            Sum("n_errors", alias_name="n_errors")]
    aggs += [Sum(f"n_{k}", alias_name=f"n_{k}") for k in _KINDS]
    return out_ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
