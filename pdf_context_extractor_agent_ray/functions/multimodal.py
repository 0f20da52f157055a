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

MEDIA_FEATURE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_bytes", pa.int64()),
    ("phash", pa.string()),
])


class FakeDecoder:
    """Deterministic stand-in for an image decoder: derives (width,
    height, n_bytes, perceptual-hash) purely from the media_ref so
    results are stable across runs/partitions. A real implementation
    would decode ``payload`` bytes (PIL/ffmpeg) — unavailable here."""

    def decode(self, media_ref: str, payload: bytes | None = None):
        h = hashlib.md5(media_ref.encode()).digest()
        width = 64 + h[0] * 8
        height = 64 + h[1] * 8
        n_bytes = int.from_bytes(h[2:6], "big") % 1_000_000
        return width, height, n_bytes, h.hex()[:16]


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


def media_features(docs_ds, concurrency=(1, 4)):
    """Per-media-span features over an interleaved-documents Dataset."""
    return docs_ds.map_batches(MediaFeatureStage, batch_format="pyarrow",
                               batch_size=MEDIA_BATCH_SIZE, concurrency=concurrency)


def media_stats(docs_ds, concurrency=(1, 4)):
    """Corpus-level media rollup: count + total bytes per doc."""
    from ray.data.aggregate import Count, Sum
    feats = media_features(docs_ds, concurrency=concurrency)
    return feats.groupby("doc_id").aggregate(
        Count(alias_name="n_media"), Sum("n_bytes", alias_name="total_bytes"))
