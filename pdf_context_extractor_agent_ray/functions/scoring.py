"""Batched model inference: a vectorized quality-scoring stage.

The "model" is a deterministic linear scorer with a hard-sigmoid link.
With default weights the stage ships as a plain task-pool callable (no
actor startup); custom weights broadcast ONCE per actor via a
``ray.put`` handle (never re-shipped per batch) on a fixed-size actor
pool. Either way inference is one vectorized pass per batch — the
plumbing a real learned quality model (fastText-style) drops into. The
hard-sigmoid (piecewise-linear) link keeps the score integer-exact
against the SQL oracle (no libm divergence).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import DIGIT_RE, PUNCT_RE, STOPWORD_RES, TOKEN_RE
from .util import round_half_away_e

# fixed demo weights (a real model would be trained; exact decimals so
# the arithmetic is reproducible in SQL)
FEATURES = ("n_chars", "n_tokens", "n_punct", "n_digits", "n_stopwords")
WEIGHTS = {"n_chars": 0.002, "n_tokens": 0.01, "n_punct": -0.05,
           "n_digits": -0.02, "n_stopwords": 0.08}
BIAS = -1.0
# hard sigmoid: clamp(0.5 + z/8, 0, 1)
HS_SLOPE = 0.125


def _features(batch: pa.Table) -> dict[str, np.ndarray]:
    text = batch["text"]
    def cnt(rx):
        return pc.count_substring_regex(text, rx).to_numpy(zero_copy_only=False).astype(np.float64)
    return {
        "n_chars": pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64),
        "n_tokens": cnt(TOKEN_RE),
        "n_punct": cnt(PUNCT_RE),
        "n_digits": cnt(DIGIT_RE),
        "n_stopwords": cnt(STOPWORD_RES["en"]),
    }


class QualityModel:
    """Scoring UDF: weights resolved once per worker (from a broadcast
    handle when given, else module defaults); per batch one vectorized
    score pass."""

    def __init__(self, weights_ref=None) -> None:
        if weights_ref is not None:
            import ray
            weights, self.bias = ray.get(weights_ref)
            # partial overrides merge over the defaults — a missing
            # feature weight must not crash actor startup
            self.weights = {**WEIGHTS, **weights}
        else:
            self.weights, self.bias = dict(WEIGHTS), BIAS

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = _features(batch)
        # explicit left-to-right accumulation: the SQL oracle evaluates
        # w1*f1 + w2*f2 + ... left-associatively; a matmul's pairwise
        # summation could differ by an ulp and flip an e6 boundary
        z = np.zeros(len(batch), dtype=np.float64)
        for f in FEATURES:
            z = z + feats[f] * self.weights[f]
        z = z + self.bias
        score = np.clip(0.5 + z * HS_SLOPE, 0.0, 1.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "score_e6": pa.array(round_half_away_e(score), pa.int64()),
        })


def model_scores(ds, weights: dict | None = None, bias: float | None = None,
                 concurrency: int | None = None, batch_size: int = 1024):
    """Score a documents Dataset with the quality model.

    Default weights are stateless, so the stage ships as a plain
    callable (task pool — no actor startup; same rationale as the
    extraction stage). Custom weights broadcast once via ``ray.put``
    and force a FIXED-size actor pool (autoscaling pools are the
    measured 4x-slower anti-pattern; see CLAUDE.md)."""
    if weights is None and bias is None:
        return ds.map_batches(QualityModel(), batch_format="pyarrow",
                              batch_size=batch_size)
    import ray
    ref = ray.put((weights or {}, BIAS if bias is None else bias))
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, cpus - 2)
    return ds.map_batches(QualityModel, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"weights_ref": ref})
