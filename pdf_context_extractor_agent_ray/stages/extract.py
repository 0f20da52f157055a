"""Ray Data extraction stage: actor-pool ``map_batches`` over zero-copy
Arrow batches.

The stage is a callable CLASS so Ray runs it as an actor pool
(``map_batches(ExtractDocuments, concurrency=N, batch_format="pyarrow")``):
the compiled pattern banks (hundreds of regexes — the reference compiles
them per parser instance, src/parsers/balance_sheet.py:25-112 etc.) are
built ONCE per actor in ``__init__`` and amortized across batches.

Hot-path layout: the batch's span list-array is flattened ONCE
(``schema.spans_column_views``) and each document is sliced out of the
flat lists by list offsets — no per-row ``to_pylist`` churn. A document
is always exactly one row, so per-document ordered folds (column cache,
note continuity) never cross a task boundary (SURVEY.md §7.4.1).

Per-document failures are contained: a crashing document emits an
``error`` span and ``valid=false`` instead of killing the block,
reproducing the reference's continue-on-error envelope
(main.py:102-106, batch_notes_extractor.py:88-99).
"""
from __future__ import annotations

import pyarrow as pa

from .. import docproc
from ..patterns import banks
from ..schema import OUTPUT_SCHEMA, build_spans_array, spans_column_views


def process_batch(batch: pa.Table) -> pa.Table:
    """Extract every document in one Arrow batch (pure function)."""
    doc_ids, list_offsets, kinds, texts, refs, offs = spans_column_views(batch)

    out_k: list[str] = []
    out_t: list[str] = []
    out_r: list[str] = []
    out_o: list[int] = []
    out_bounds: list[int] = [0]
    valid: list[bool] = []
    confidence: list[float] = []
    statement_type: list[str] = []
    errors_flat: list[str] = []
    errors_bounds: list[int] = [0]

    for i in range(len(doc_ids)):
        lo, hi = int(list_offsets[i]), int(list_offsets[i + 1])
        dk, dt, dr, do = kinds[lo:hi], texts[lo:hi], refs[lo:hi], offs[lo:hi]
        # inputs are stored offset-sorted; tolerate unsorted spans
        if any(do[j] > do[j + 1] for j in range(len(do) - 1)):
            order = sorted(range(len(do)), key=lambda j: do[j])
            dk = [dk[j] for j in order]
            dt = [dt[j] for j in order]
            dr = [dr[j] for j in order]
            do = [do[j] for j in order]
        try:
            res = docproc.extract_document(dk, dt, dr, do)
        except Exception as exc:  # continue-on-error envelope
            res = {"kinds": ["error"], "texts": [f"extract_failed:{type(exc).__name__}"],
                   "media_refs": [""], "offsets": [0], "valid": False,
                   "confidence": 0.0, "statement_type": "",
                   "errors": [f"exception:{type(exc).__name__}:{exc}"]}
        out_k.extend(res["kinds"])
        out_t.extend(res["texts"])
        out_r.extend(res["media_refs"])
        out_o.extend(res["offsets"])
        out_bounds.append(len(out_k))
        valid.append(res["valid"])
        confidence.append(res["confidence"])
        statement_type.append(res["statement_type"])
        errors_flat.extend(res["errors"])
        errors_bounds.append(len(errors_flat))

    spans = build_spans_array(out_k, out_t, out_r, out_o, out_bounds)
    errors = pa.ListArray.from_arrays(pa.array(errors_bounds, pa.int32()),
                                      pa.array(errors_flat, pa.string()))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), spans,
         pa.array(valid, pa.bool_()), pa.array(confidence, pa.float32()),
         pa.array(statement_type, pa.string()), errors],
        schema=OUTPUT_SCHEMA)


class ExtractDocuments:
    """Actor-pool stage: pattern banks compiled once per actor.

    ``config`` (an ``EngineConfig``) ships user extensions — extra
    pattern banks / column keywords — to every worker; activation and
    compilation happen once per actor, never per batch.
    """

    def __init__(self, config=None) -> None:
        if config is not None:
            config.activate()
        banks()  # force-compile the (possibly extended) banks

    def __call__(self, batch: pa.Table) -> pa.Table:
        return process_batch(batch)
