"""Command-line entry point (the reference's ``main.py`` CLI surface,
main.py:500-547, re-expressed over the Ray pipeline).

Usage::

    python -m pdf_context_extractor_agent_ray.cli extract \
        --input /path/to/documents_parquet --output /tmp/out \
        [--pages 2-4] [--format parquet|json|csv] [--num-cpus 32] \
        [--max-spans 2048] [--keyword-library lib.json] [--resume] \
        [--choices-log logs/user_choices.json]

    python -m pdf_context_extractor_agent_ray.cli synth \
        --n-docs 10000 --output /tmp/corpus

    python -m pdf_context_extractor_agent_ray.cli metrics --output /tmp/out

Owns its Ray session (the driver contract in ``__ray_entry__`` does
NOT; scripts must, per the repo rules).
"""
from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import os

    import ray
    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone runs default to a local session
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if address == "local":
            kwargs["include_dashboard"] = False
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def _parse_pages(spec: str) -> tuple[int, int]:
    """'N' or 'N-M' (1-based, inclusive) -> (start, end); clean error
    on anything else instead of a raw traceback after Ray init."""
    try:
        start_s, _, end_s = spec.partition("-")
        start = int(start_s)
        end = int(end_s) if end_s else start
    except ValueError:
        raise SystemExit(f"error: --pages expects 'N' or 'N-M', got {spec!r}")
    if start < 1 or end < start:
        raise SystemExit(
            f"error: --pages needs 1 <= start <= end, got {spec!r}")
    return start, end


def cmd_extract(args: argparse.Namespace) -> int:
    from . import io as dio
    from .config import load_keyword_library
    from .pipelines.export import write_flat_csv, write_output_json
    from .pipelines.extraction import extraction_pipeline, run_resumable
    from .stages.pages import select_page_range
    from .stages.skew import rebalanced_documents

    _init_ray(args.num_cpus)
    config = load_keyword_library(args.keyword_library) if args.keyword_library else None
    if getattr(args, "choices_log", None):
        from .config import EngineConfig, load_decision_log
        config = config or EngineConfig()
        config.choice_replay = load_decision_log(args.choices_log)

    page_range = _parse_pages(args.pages) if args.pages else None

    def build_input():
        ds = dio.read_documents(args.input)
        if page_range:
            ds = select_page_range(ds, *page_range)
        if args.max_spans:
            ds = rebalanced_documents(ds, args.max_spans)
        return ds

    if args.format == "parquet":
        manifest = run_resumable(
            build_input, args.output, batch_size=args.batch_size, config=config,
            lineage={"input": args.input, "pages": args.pages or "all"})
        if not args.resume and manifest.get("skipped_docs"):
            print("note: output dir had finished partitions; "
                  "skipped already-extracted docs (use --resume to silence)",
                  file=sys.stderr)
        print(json.dumps(manifest))
    else:
        out = extraction_pipeline(build_input(), batch_size=args.batch_size,
                                  config=config)
        if args.format == "json":
            write_output_json(out, args.output)
        else:
            write_flat_csv(out, args.output)
        print(json.dumps({"output": args.output, "format": args.format}))
    import ray
    ray.shutdown()
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    from . import io as dio
    from .sources.synth_source import synth_documents

    _init_ray(args.num_cpus)
    ds = synth_documents(args.n_docs, seed=args.seed)
    dio.write_documents(ds, args.output)
    print(json.dumps({"output": args.output, "n_docs": args.n_docs, "seed": args.seed}))
    import ray
    ray.shutdown()
    return 0


def cmd_verify(args: argparse.Namespace) -> int:
    """Spot-check an environment: run the distributed pipeline AND the
    sequential oracle on a sample of the input and compare span-for-span
    (the per-row invariant). Exit 1 on any mismatch."""
    from . import io as dio
    from .oracle.extractor import extract_doc_dict
    from .pipelines.extraction import extraction_pipeline

    from .schema import docs_to_table

    _init_ray(args.num_cpus)
    rows = dio.read_documents(args.input).limit(args.sample).take_all()
    # feed the pipeline the SAME fetched rows — one storage read, and
    # both sides provably see the identical sample
    import ray.data as rd
    sample = [{"doc_id": r["doc_id"],
               "spans": [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]} for r in rows]
    out = extraction_pipeline(rd.from_arrow(docs_to_table(sample)))
    got = {}
    for r in out.take_all():
        got[r["doc_id"]] = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]]
    mismatches = []
    for r in rows:
        spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        oracle = extract_doc_dict({"doc_id": r["doc_id"], "spans": spans})
        if got.get(r["doc_id"]) != oracle["spans"]:
            mismatches.append(r["doc_id"])
    verdict = {"checked": len(rows), "mismatches": mismatches,
               "ok": not mismatches}
    print(json.dumps(verdict))
    import ray
    ray.shutdown()
    return 0 if verdict["ok"] else 1


def cmd_export_excel(args: argparse.Namespace) -> int:
    """Excel report export (S7-S9) over an extracted output dir."""
    from . import io as dio
    from .pipelines.excel import (
        export_multi_statement_workbook,
        export_notes_workbooks,
        export_statement_workbooks,
    )

    _init_ray(args.num_cpus)
    ds = dio.read_documents(args.output)
    if args.mode == "statements":
        n = export_statement_workbooks(ds, args.dest, limit=args.limit)
    elif args.mode == "workbook":
        n = export_multi_statement_workbook(ds, args.dest, limit=args.limit)
    else:
        n = export_notes_workbooks(ds, args.dest, limit=args.limit)
    print(json.dumps({"mode": args.mode, "written": n, "dest": args.dest}))
    import ray
    ray.shutdown()
    return 0


def cmd_metrics(args: argparse.Namespace) -> int:
    from . import io as dio
    from .pipelines.metrics import run_metrics

    _init_ray(args.num_cpus)
    ds = dio.read_documents(args.output)
    row = run_metrics(ds)
    print(json.dumps(row))
    manifests = dio.load_manifests(args.output)
    if manifests:
        print(json.dumps({"partitions": len(manifests),
                          "stage_versions": sorted({m["stage_version"] for m in manifests})}))
    import ray
    ray.shutdown()
    return 0


def cmd_clean(args: argparse.Namespace) -> int:
    """Run the corpus-cleaning funnel (exact dedup -> near-dup
    keep-best -> decontaminate -> quality gate) over a documents table,
    write the cleaned corpus as parquet, and print the 5-stage
    survivor report as JSON. With ``--manifest`` the run is the CDC
    INCREMENTAL loop: only the recrawl delta re-derives features; pass
    ``--write-manifest`` to hand the next run its manifest."""
    import ray.data as rd

    from .functions.dedup import (corpus_clean_funnel,
                                  corpus_clean_funnel_incremental)
    from .functions.util import parquet_num_rows, strip_schema_metadata

    _init_ray(args.num_cpus)
    docs = strip_schema_metadata(
        rd.read_parquet(f"{args.sf_dir}/documents.parquet"))
    n = parquet_num_rows(f"{args.sf_dir}/documents.parquet")
    manifest = getattr(args, "manifest", None)
    out_manifest = getattr(args, "write_manifest", None)
    if manifest:
        report, stats = corpus_clean_funnel_incremental(
            docs, manifest, n_docs=n, output_path=args.output,
            output_manifest_path=out_manifest, return_stats=True)
        extra = {"incremental": stats}
    else:
        report = corpus_clean_funnel(
            docs, n_docs=n, output_path=args.output,
            checkpoint_stages=bool(getattr(args, "checkpoints", False)))
        extra = {}
        if out_manifest:
            from .functions.dedup import write_funnel_manifest
            extra["manifest_features"] = write_funnel_manifest(
                docs, out_manifest, n_docs=n)
    print(json.dumps({
        "output": args.output,
        "funnel": {r["stage"]: int(r["n_docs"])
                   for _, r in report.iterrows()},
        **extra,
    }))
    import ray
    ray.shutdown()
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run any registered analytics query (the ``__ray_entry__``
    ``queries()`` registry) over a table directory and write the
    result as parquet (or print to stdout with --show) — so every
    pipeline the engine ships is runnable from the command line, not
    only through the driver contract."""
    import importlib

    try:
        entry = importlib.import_module("__ray_entry__")
    except ModuleNotFoundError:
        # running from outside the repo root: the registry module sits
        # next to the package (driver-side import only; Ray workers
        # still need the repo root on THEIR path — run from the repo
        # root or set PYTHONPATH, see CLAUDE.md)
        import os
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        entry = importlib.import_module("__ray_entry__")
    registry = entry.queries()
    if args.name == "list":
        for name in registry:
            print(name)
        return 0
    if args.name not in registry:
        raise SystemExit(
            f"error: unknown query {args.name!r} — "
            f"`query list` prints the {len(registry)} available names")
    if not args.show and not args.dest:
        raise SystemExit("error: pass --dest DIR or --show")

    _init_ray(args.num_cpus)
    result = registry[args.name](args.sf_dir)
    import pandas as pd
    if isinstance(result, pd.DataFrame):
        import ray.data as rd
        from .functions.util import table_from_pandas
        result = rd.from_arrow(table_from_pandas(result))
    if args.show:
        df = result.to_pandas()
        print(df.head(args.limit).to_string(index=False))
        print(f"[{len(df)} rows]")
    else:
        result.write_parquet(args.dest)
        print(json.dumps({"query": args.name, "dest": args.dest}))
    import ray
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pdf_context_extractor_agent_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline")
    pe.add_argument("--input", required=True, help="documents table (parquet dir/file or .lance)")
    pe.add_argument("--output", required=True)
    pe.add_argument("--pages", help="1-based inclusive page range, e.g. 2-4")
    pe.add_argument("--format", choices=["parquet", "json", "csv"], default="parquet")
    pe.add_argument("--num-cpus", type=int)
    pe.add_argument("--batch-size", type=int, default=48)
    pe.add_argument("--max-spans", type=int, help="split docs above this span count")
    pe.add_argument("--keyword-library", help="JSON keyword library (EngineConfig)")
    pe.add_argument("--choices-log",
                    help="recorded arbitration log (reference user_choices.json "
                         "array or engine JSONL) replayed on disagreement")
    pe.add_argument("--resume", action="store_true")
    pe.set_defaults(fn=cmd_extract)

    ps = sub.add_parser("synth", help="generate a deterministic corpus")
    ps.add_argument("--n-docs", type=int, required=True)
    ps.add_argument("--seed", type=int, default=42)
    ps.add_argument("--output", required=True)
    ps.add_argument("--num-cpus", type=int)
    ps.set_defaults(fn=cmd_synth)

    pv = sub.add_parser("verify", help="oracle-vs-pipeline spot check on a sample")
    pv.add_argument("--input", required=True, help="documents table to sample")
    pv.add_argument("--sample", type=int, default=100)
    pv.add_argument("--num-cpus", type=int)
    pv.set_defaults(fn=cmd_verify)

    px = sub.add_parser("export-excel", help="write xlsx reports from an output dir")
    px.add_argument("--output", required=True, help="extracted output dir")
    px.add_argument("--dest", required=True,
                    help="directory (statements/notes) or .xlsx path (workbook)")
    px.add_argument("--mode", choices=["statements", "workbook", "notes"],
                    default="statements")
    px.add_argument("--limit", type=int, default=100)
    px.add_argument("--num-cpus", type=int)
    px.set_defaults(fn=cmd_export_excel)

    pm = sub.add_parser("metrics", help="roll up metrics over an output dir")
    pm.add_argument("--output", required=True)
    pm.add_argument("--num-cpus", type=int)
    pm.set_defaults(fn=cmd_metrics)

    pc_ = sub.add_parser(
        "clean", help="run the corpus-cleaning funnel over a documents "
                      "table and write the cleaned corpus")
    pc_.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                     help="directory holding documents.parquet")
    pc_.add_argument("--output", required=True,
                     help="directory for the cleaned corpus parquet")
    pc_.add_argument("--checkpoints", action="store_true",
                     help="persist each stage's survivors under "
                          "<output>/_ckpt and resume completed stages "
                          "on re-run")
    pc_.add_argument("--manifest",
                     help="previous run's feature manifest: clean "
                          "INCREMENTALLY (only the recrawl delta "
                          "re-derives features)")
    pc_.add_argument("--write-manifest",
                     help="write this run's feature manifest here for "
                          "the next incremental clean")
    pc_.add_argument("--num-cpus", type=int)
    pc_.set_defaults(fn=cmd_clean)

    pq_ = sub.add_parser(
        "query", help="run a registered analytics query ('query list' "
                      "prints the registry) over a table dir")
    pq_.add_argument("name", help="query name, or 'list'")
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                     help="directory holding the input parquet tables")
    pq_.add_argument("--dest", help="output parquet directory")
    pq_.add_argument("--show", action="store_true",
                     help="print the result instead of writing parquet")
    pq_.add_argument("--limit", type=int, default=20,
                     help="rows to print with --show")
    pq_.add_argument("--num-cpus", type=int)
    pq_.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
