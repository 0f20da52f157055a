"""Multimodal column plumbing: media spans as opaque binary refs with
typed metadata, decoded/feature-extracted by an actor-pool stage.

The image/audio codec libraries are not in this container, so the
decode itself is a clearly-marked deterministic STUB (`FakeDecoder`)
behind the real interface — the Ray-side plumbing (schema, small batch
size for large payloads, actor signature, output layout) is real and
tested. Slot a real decoder in by replacing ``FakeDecoder.decode``.
"""
from __future__ import annotations

import hashlib

import pyarrow as pa

from ..schema import spans_column_views

MEDIA_BATCH_SIZE = 16  # large binary payloads => small batches


def _pool_size(requested: int | None = None) -> int:
    """Fixed actor-pool size, always BELOW cluster CPUs: a pool that
    reserves every CPU starves the read stage and the pipeline hangs
    (observed; see CLAUDE.md invariants)."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    cap = max(1, cpus - 2)
    return min(requested, cap) if requested else cap

MEDIA_FEATURE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_bytes", pa.int64()),
    ("phash", pa.string()),
])


class FakeDecoder:
    """Deterministic stand-in for an image/video decoder: derives
    (width, height, n_bytes, perceptual-hash, n_frames) purely from the
    media_ref so results are stable across runs/partitions AND
    SQL-checkable (each field is an md5-digit slice the DuckDB oracle
    reproduces). A real implementation would decode ``payload`` bytes
    (PIL/ffmpeg) — unavailable here."""

    def probe(self, media_ref: str, payload: bytes | None = None) -> dict:
        # SINGLE source of the md5-derived formulas — the DuckDB
        # oracles encode exactly these; decode() delegates so the two
        # surfaces can never diverge
        h = hashlib.md5(media_ref.encode()).digest()
        return {
            "width": 64 + h[0] * 8,
            "height": 64 + h[1] * 8,
            "n_bytes": int.from_bytes(h[2:6], "big") % 1_000_000,
            "phash": h.hex()[:16],
            "n_frames": int.from_bytes(h[6:8], "big") % 300 + 1,
        }

    def decode(self, media_ref: str, payload: bytes | None = None):
        p = self.probe(media_ref, payload)
        return p["width"], p["height"], p["n_bytes"], p["phash"]


class MediaFeatureStage:
    """Actor-pool stage: decoder constructed once per actor; per batch,
    emits one feature row per media span of each document."""

    def __init__(self, decoder_cls=FakeDecoder) -> None:
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, list_offsets, kinds, texts, refs, _offs = spans_column_views(batch)
        out = {name: [] for name in MEDIA_FEATURE_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(list_offsets[i]), int(list_offsets[i + 1])
            for j in range(lo, hi):
                if kinds[j] != "media":
                    continue
                w, h, nb, ph = self.decoder.decode(refs[j])
                out["doc_id"].append(doc_ids[i])
                out["media_ref"].append(refs[j])
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(nb)
                out["phash"].append(ph)
        return pa.Table.from_pydict(out, schema=MEDIA_FEATURE_SCHEMA)


def _stage(docs_ds, stage_cls, concurrency, batch_size, decoder_cls=None,
           **stage_kwargs):
    """Execution-mode dispatch shared by the media stages: the default
    (stub) decoder is stateless, so the stage ships as a plain callable
    and runs as a TASK pool — no actor startup, no CPU pinning (same
    rationale as pipelines.extraction). A custom decoder_cls forces the
    actor-pool path so a real decoder's per-worker state (codec
    contexts, model weights) is built once per actor in __init__."""
    if decoder_cls is None:
        kwargs = {}
        if concurrency is not None:
            # honor an explicit cap on the task path too (bounds memory
            # for large media batches)
            kwargs["concurrency"] = concurrency
        return docs_ds.map_batches(stage_cls(**stage_kwargs),
                                   batch_format="pyarrow",
                                   batch_size=batch_size, **kwargs)
    return docs_ds.map_batches(
        stage_cls, batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool_size(concurrency),
        fn_constructor_kwargs={"decoder_cls": decoder_cls, **stage_kwargs})


def media_features(docs_ds, concurrency: int | None = None, decoder_cls=None):
    """Per-media-span features over an interleaved-documents Dataset.

    With a real decoder: fixed-size actor pool (autoscaling (1, N)
    pools measured 4x slower on this engine's stages — see CLAUDE.md)
    and MEDIA_BATCH_SIZE-small batches for the binary payloads."""
    return _stage(docs_ds, MediaFeatureStage, concurrency,
                  MEDIA_BATCH_SIZE, decoder_cls)


MEDIA_STATS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("n_media", pa.int64()),
    ("total_bytes", pa.int64()),
])


class MediaStatsStage:
    """Per-document media rollup computed INSIDE the span pass: a doc's
    spans live in one row, so count/sum per doc needs no groupby — the
    stage emits one row per document with >=1 media span and the
    pipeline has zero shuffles."""

    def __init__(self, decoder_cls=FakeDecoder) -> None:
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, list_offsets, kinds, _texts, refs, _offs = spans_column_views(batch)
        out = {name: [] for name in MEDIA_STATS_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(list_offsets[i]), int(list_offsets[i + 1])
            n = 0
            total = 0
            for j in range(lo, hi):
                if kinds[j] == "media":
                    n += 1
                    total += self.decoder.decode(refs[j])[2]
            if n:
                out["doc_id"].append(doc_ids[i])
                out["n_media"].append(n)
                out["total_bytes"].append(total)
        return pa.Table.from_pydict(out, schema=MEDIA_STATS_SCHEMA)


def media_stats(docs_ds, concurrency: int | None = None, batch_size: int = 128,
                decoder_cls=None):
    """Corpus-level media rollup: count + total bytes per doc (docs
    with no media are omitted). The stub decoder carries no payload, so
    the batch can be much larger than MEDIA_BATCH_SIZE; shrink it when
    a real decoder materializes frames."""
    return _stage(docs_ds, MediaStatsStage, concurrency, batch_size, decoder_cls)


RESIZE_MAX_SIDE = 256

RESIZE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("target_w", pa.int32()),
    ("target_h", pa.int32()),
])


class MediaResizeStage:
    """Actor-pool resize stage: integer aspect-preserving downscale to
    RESIZE_MAX_SIDE (no-op for smaller images). The dimension math is
    pure integer arithmetic so the DuckDB oracle reproduces it; a real
    implementation resizes the decoded pixels and re-encodes."""

    def __init__(self, decoder_cls=FakeDecoder, max_side: int = RESIZE_MAX_SIDE) -> None:
        self.decoder = decoder_cls()
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, list_offsets, kinds, _t, refs, _o = spans_column_views(batch)
        out = {name: [] for name in RESIZE_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(list_offsets[i]), int(list_offsets[i + 1])
            for j in range(lo, hi):
                if kinds[j] != "media":
                    continue
                p = self.decoder.probe(refs[j])
                w, h = p["width"], p["height"]
                long_side = max(w, h)
                if long_side <= self.max_side:
                    tw, th = w, h
                else:
                    tw = w * self.max_side // long_side
                    th = h * self.max_side // long_side
                out["doc_id"].append(doc_ids[i])
                out["media_ref"].append(refs[j])
                out["width"].append(w)
                out["height"].append(h)
                out["target_w"].append(tw)
                out["target_h"].append(th)
        return pa.Table.from_pydict(out, schema=RESIZE_SCHEMA)


def media_resize(docs_ds, concurrency: int | None = None,
                 batch_size: int = 128, decoder_cls=None):
    """Per-media-span resize plan over an interleaved-documents
    Dataset (one row per media span)."""
    return _stage(docs_ds, MediaResizeStage, concurrency, batch_size, decoder_cls)


FRAME_SAMPLE_K = 4

FRAME_SAMPLE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("n_frames", pa.int32()),
    ("sample_idx", pa.int32()),
    ("frame_idx", pa.int32()),
])


class FrameSampleStage:
    """Actor-pool frame sampler: k evenly spaced frame indices per
    media span (frame_idx = sample_idx * n_frames // k) — the standard
    uniform temporal sampling for video training data. Index math is
    integer so the SQL oracle matches; a real implementation seeks and
    decodes those frames."""

    def __init__(self, decoder_cls=FakeDecoder, k: int = FRAME_SAMPLE_K) -> None:
        self.decoder = decoder_cls()
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, list_offsets, kinds, _t, refs, _o = spans_column_views(batch)
        out = {name: [] for name in FRAME_SAMPLE_SCHEMA.names}
        for i in range(len(doc_ids)):
            lo, hi = int(list_offsets[i]), int(list_offsets[i + 1])
            for j in range(lo, hi):
                if kinds[j] != "media":
                    continue
                n_frames = self.decoder.probe(refs[j])["n_frames"]
                for s in range(self.k):
                    out["doc_id"].append(doc_ids[i])
                    out["media_ref"].append(refs[j])
                    out["n_frames"].append(n_frames)
                    out["sample_idx"].append(s)
                    out["frame_idx"].append(s * n_frames // self.k)
        return pa.Table.from_pydict(out, schema=FRAME_SAMPLE_SCHEMA)


def media_frame_sample(docs_ds, concurrency: int | None = None,
                       batch_size: int = 128, decoder_cls=None):
    """k uniformly spaced frame indices per media span."""
    return _stage(docs_ds, FrameSampleStage, concurrency, batch_size, decoder_cls)
