"""The flagship extraction pipeline and its resumable runner.

Pipeline shape (Ray-Data-first, SURVEY.md §7):

    read/synth (Dataset of doc rows)
      → map_batches(ExtractDocuments, batch_format="pyarrow",
                    concurrency=N actors)        # the only heavy stage
      → partitioned parquet sink with manifests  # checkpoint/lineage

There are NO shuffles in the core chain: a document is one row, every
per-doc fold stays inside one task, and output ordering is
within-document only (SURVEY.md §2.9). The only cross-doc exchange is
the resume anti-join, done as a broadcast-set filter
(``ray.put`` once → filter inside map_batches), never a shuffle join.
"""
from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa

from .. import io as dio
from ..stages.extract import ExtractDocuments, process_batch


def _default_concurrency() -> int:
    """FIXED actor-pool size, capped BELOW the cluster CPU count.

    - Below the CPU count because an actor pool that reserves every CPU
      starves the read/generate/write task stages and the pipeline
      deadlocks (observed on 8 CPUs with concurrency=8).
    - Fixed (not autoscaling) because the (1, N) autoscaling pool ramps
      up far too slowly for a throughput job: measured 1.8k docs/s with
      (1,30) vs 7.8k docs/s with fixed 30 on the same 100k-doc corpus.
    """
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, cpus - 2)


def extraction_pipeline(ds, *, concurrency: Optional[int] = None,
                        batch_size: int = 48, config=None,
                        expected_rows: Optional[int] = None):
    """Attach the extraction stage to a documents Dataset.

    ``batch_size=48`` documents/batch: measured best on 200k docs at 32
    cpus (48: ~10.8k docs/s, 64: ~9.4k, 96: ~5.9k) — small enough for
    load balance, large enough to amortize the per-batch Arrow flatten.

    Execution mode: with no ``config`` the stage runs as a TASK pool
    over the pure ``process_batch`` — the pattern banks compile lazily
    once per (reused) worker process, there is no actor-pool startup
    tax, and the scheduler interleaves the read/generate stages with
    extraction across every CPU (measured 12.4-13.0k docs/s vs
    9.3-11.5k for a 30-actor pool on the same 200k-doc corpus: pinned
    actors starve the upstream stage). A ``config`` forces the actor
    pool, because user bank extensions must activate per-actor — never
    via process-global state a later job could inherit.
    ``expected_rows``: when the input size is known (e.g. parquet row
    count), cap the actor pool so a tiny corpus doesn't pay full-pool
    startup (ignored in task mode, which has no pool).
    """
    if config is None:
        # an explicit concurrency still caps the task pool (callers on
        # shared boxes rely on it); None = let the scheduler fan out
        kwargs = {} if concurrency is None else {"concurrency": concurrency}
        return ds.map_batches(process_batch, batch_format="pyarrow",
                              batch_size=batch_size, num_cpus=1, **kwargs)
    if concurrency is None:
        concurrency = _default_concurrency()
    if expected_rows is not None:
        concurrency = max(1, min(concurrency, -(-expected_rows // batch_size)))
    return ds.map_batches(
        ExtractDocuments,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"config": config},
    )


def _make_drop_counter():
    """Zero-CPU counter actor: the resume anti-join reports how many
    input docs it dropped (per batch, delivered synchronously so the
    total is complete when the pipeline finishes) — replacing the old
    separate ``ds.count()`` pass over the input, which executed the
    whole input pipeline a second time for derived sources."""
    import ray

    @ray.remote(num_cpus=0)
    class _DropCounter:
        def __init__(self):
            self.n = 0

        def add(self, k: int) -> None:
            self.n += k

        def total(self) -> int:
            return self.n

    return _DropCounter.remote()


def _broadcast_anti_join(ds, completed: set[str], counter=None):
    """Resume anti-join (J4): drop already-completed doc_ids via a
    broadcast set — no shuffle. The set ships through the object store
    once (``ray.put``) and each task reads it zero-copy."""
    if not completed:
        return ds
    import ray
    import pyarrow.compute as pc
    ref = ray.put(pa.array(sorted(completed), pa.string()))

    def drop_done(batch: pa.Table) -> pa.Table:
        done = ray.get(ref)
        mask = pc.invert(pc.is_in(batch.column("doc_id"), value_set=done))
        out = batch.filter(mask)
        if counter is not None and len(out) != len(batch):
            ray.get(counter.add.remote(len(batch) - len(out)))
        return out

    return ds.map_batches(drop_done, batch_format="pyarrow")


def _bloom_anti_join(ds, cf, counter=None):
    """At-scale resume filter: the manifest-derived CompletedFilter
    (range-pruned Blooms) ships once via ``ray.put``; no parquet
    doc_id columns are read and no driver set is built, so resume cost
    is independent of how much of the corpus is already done."""
    import ray
    ref = ray.put(cf)

    def drop_done(batch: pa.Table) -> pa.Table:
        f = ray.get(ref)
        keep = ~f.might_contain_batch(batch.column("doc_id").to_pylist())
        out = batch.filter(pa.array(keep, pa.bool_()))
        if counter is not None and len(out) != len(batch):
            ray.get(counter.add.remote(len(batch) - len(out)))
        return out

    return ds.map_batches(drop_done, batch_format="pyarrow")


# above this many finished docs, resume switches from the exact
# doc_id-set anti-join (reads one column of every finished partition)
# to the manifest-only Bloom filter (no data files touched)
RESUME_EXACT_MAX_DOCS = 10_000_000


def run_resumable(ds_factory, output_path: str, *,
                  concurrency: Optional[int] = None,
                  batch_size: int = 48,
                  config=None,
                  resume_exact_max_docs: int = RESUME_EXACT_MAX_DOCS,
                  lineage: Optional[dict[str, Any]] = None) -> dict[str, Any]:
    """Run extraction over ``ds_factory()`` writing a new atomic
    partition; docs already present in finished partitions are skipped.
    A killed run loses only its unfinished partition (tmp dir is never
    visible), so rerunning converges without reprocessing.

    ``batch_size=48`` matches extraction_pipeline's measured optimum.

    Resume filtering is size-gated: exact doc_id sets below
    ``resume_exact_max_docs`` finished docs, manifest-only Bloom
    filters above (constant cost in corpus size; ~1.4e-4 per-doc
    false-positive skip rate, disclosed in CompletedFilter).

    Manifest extras: ``skipped_docs`` = docs of THIS run's input that
    were dropped as already done (not the size of the previously-
    finished set, which says nothing about this input);
    ``prior_done_docs`` = finished docs found on disk. Skips are
    counted INSIDE the anti-join filter (zero-CPU counter actor, one
    synchronous add per filtered batch) rather than by an extra
    ``ds.count()`` pass, which for derived inputs (CLI --pages /
    --max-spans wrap map_batches around the read) executed the whole
    input pipeline twice. Caveat: a Ray lineage re-execution of a
    filter task would double-count its batch; the metric is
    informational, never used for resume decisions."""
    import ray

    n_done = sum(m["num_docs"] for m in dio.load_manifests(output_path))
    ds = ds_factory()
    cf = dio.completed_filter(output_path) if n_done > resume_exact_max_docs else None
    counter = None
    if cf is not None:
        counter = _make_drop_counter()
        ds = _bloom_anti_join(ds, cf, counter)
    else:
        completed = dio.completed_doc_ids(output_path)
        if completed:
            counter = _make_drop_counter()
        ds = _broadcast_anti_join(ds, completed, counter)
    out = extraction_pipeline(ds, concurrency=concurrency,
                              batch_size=batch_size, config=config)
    part = dio.next_partition_index(output_path)
    manifest = dio.write_partition(out, output_path, part, lineage=lineage)
    manifest["skipped_docs"] = ray.get(counter.total.remote()) if counter else 0
    manifest["prior_done_docs"] = n_done
    return manifest
