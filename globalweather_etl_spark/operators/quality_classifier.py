"""Trainable document-quality classifier: hashed n-gram logistic
regression, the public fastText/CCNet recipe re-expressed for Spark.

Public background: CCNet and most open LLM-data pipelines score
document quality with a linear classifier over hashed token n-grams
(fastText's model shape) trained on "good" (e.g. curated reference
text) vs "bad" (raw crawl) examples. The model is a single weight
vector over a hashed feature space — small enough to broadcast — so
both training and scoring distribute trivially; what needs care in
Spark is keeping the per-epoch work to ONE bounded shuffle and the
Python boundary Arrow-batched.

Design (scale shape first):
- Featurization is ALL in-plan expressions (lower/regex tokenize,
  unigrams + bigrams, xxhash64 % dim, array_distinct): binary
  presence features, no Python in the hot path. `dim` defaults to
  2^18, so a model is 2 MB of float64 — broadcastable at any corpus
  size.
- Training is full-batch gradient descent: per epoch, the weight
  vector is broadcast, per-document margins are computed by ONE
  Arrow-batched pandas UDF (a gather-sum over the index array), and
  the gradient is a single explode → groupBy(feature) → sum residual
  aggregate whose output is bounded by `dim` rows REGARDLESS of
  corpus size. Driver state is the weight vector itself — O(dim),
  like kmeans' k×d centroids. Epochs × (one scan + one bounded
  shuffle) total; nothing quadratic, nothing driver-looped over rows.
- Scoring is one broadcast + one pandas UDF — scan-stage, no shuffle.

Like kmeans/pagerank, training is iterative float math with
order-dependent double summation, so the operator is test-verified
against a NumPy twin (tolerance parity + holdout accuracy) rather
than oracle-graded — the reason is recorded here per the registry
convention.

Reference parity note: the reference repo (a Snowflake SQL ETL) has
no ML surface; this operator is part of the training-data-pipeline
extension tier the build brief mandates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType

__all__ = [
    "QualityModel",
    "hashed_features",
    "train_quality_classifier",
    "score_quality",
]

_TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


@dataclass(frozen=True)
class QualityModel:
    """Broadcastable model state: hashed-feature weights + intercept.
    ``dim``, ``ngrams`` and ``hash_fn`` pin the featurization the
    weights were trained under — score_quality re-derives features
    with them."""

    weights: np.ndarray  # float64[dim]
    bias: float
    dim: int
    ngrams: int
    hash_fn: str = "xxhash64"

    def __post_init__(self):
        if self.weights.shape != (self.dim,):
            raise ValueError(
                f"weights shape {self.weights.shape} != ({self.dim},)"
            )


def _feature_expr(
    text: Column, dim: int, ngrams: int, hash_fn: str = "xxhash64"
) -> Column:
    """In-plan hashed feature indices for one document: distinct
    hash buckets of word unigrams (+ n-grams up to ``ngrams``),
    lowercased, punctuation-split. Pure expressions — no UDF.

    ``hash_fn``: 'xxhash64' (default, fastest — JVM codegen) or 'md5'
    (the repo's engine-portable 60-bit scheme, operators/dedup.py:89)
    for cross-engine-checkable scoring — a DuckDB twin can recompute
    the exact same feature indices.

    NULL text is routine in web corpora (the sibling text kernel is
    NULL-safe throughout): coalesce to '' so a NULL document yields an
    EMPTY feature array (margin = bias) instead of a NULL array that
    would crash the Arrow gather downstream (advisor finding, r6)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    toks = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), _TOKEN_SPLIT),
        lambda t: t != "",
    )
    grams = [toks]
    for k in range(2, ngrams + 1):
        # n-gram i joins tokens[i..i+k-1]; zip_with over a sliced copy
        # builds them scan-stage (arrays_zip-free: nested transform)
        grams.append(
            F.transform(
                F.slice(toks, 1, F.greatest(F.size(toks) - (k - 1), F.lit(0))),
                lambda _t, i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
                ),
            )
        )
    allg = grams[0]
    for g in grams[1:]:
        allg = F.concat(allg, g)
    if hash_fn == "md5":
        # 60-bit md5 prefix (always positive) — DuckDB twin:
        # CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % dim
        bucket = lambda t: (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
            % dim
        ).cast("int")
    else:
        bucket = lambda t: (F.abs(F.xxhash64(t)) % dim).cast("int")
    return F.array_distinct(F.transform(allg, bucket))


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1 << 18,
    ngrams: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, features int-array) — binary presence features in the
    hashed space. Scan-stage only."""
    return df.select(
        F.col(id_col).alias("id"),
        _feature_expr(F.col(text_col), dim, ngrams, hash_fn).alias(
            "features"
        ),
    )


def _margin_udf(weights: np.ndarray, bias: float):
    """Arrow-batched gather-sum: margin_i = b + sum(w[features_i])."""

    @F.pandas_udf(DoubleType())
    def margin(features):
        # None features (a NULL array reaching the UDF through some
        # other caller's plan) degrade to the empty feature set —
        # margin = bias — mirroring _feature_expr's NULL coalesce.
        return features.map(
            lambda idx: bias
            + (
                float(weights[np.asarray(idx, dtype=np.int64)].sum())
                if idx is not None
                else 0.0
            )
        )

    return margin


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    dim: int = 1 << 18,
    ngrams: int = 2,
    epochs: int = 20,
    lr: float = 1.0,
    l2: float = 1e-6,
    hash_fn: str = "xxhash64",
) -> QualityModel:
    """Full-batch gradient descent for L2 logistic regression over
    hashed features. ``label_col`` is 0/1 (1 = good). Per epoch: one
    scan (margins via broadcast weights) + one shuffle bounded by
    ``dim`` rows (the gradient aggregate). The features frame is
    persisted across epochs — featurization runs once."""
    feats = (
        hashed_features(df, id_col, text_col, dim, ngrams, hash_fn)
        .join(
            df.select(
                F.col(id_col).alias("id"),
                F.col(label_col).cast("double").alias("y"),
            ),
            "id",
        )
        .persist()
    )
    n = feats.count()  # also materializes the persist
    if n == 0:
        raise ValueError("empty training frame")
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    try:
        for _ in range(epochs):
            m = _margin_udf(w, b)
            resid = feats.select(
                "features",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-m(F.col("features"))))
                    - F.col("y")
                ).alias("r"),
            )
            agg = resid.select(
                F.explode("features").alias("j"), "r"
            ).groupBy("j").agg(F.sum("r").alias("g"))
            rows = agg.collect()  # <= dim rows: bounded driver state
            grad = np.zeros(dim, dtype=np.float64)
            for row in rows:
                grad[row["j"]] = row["g"]
            b_grad = resid.agg(F.sum("r")).collect()[0][0]
            w -= lr * (grad / n + l2 * w)
            b -= lr * (b_grad / n)
    finally:
        feats.unpersist()
    return QualityModel(
        weights=w, bias=b, dim=dim, ngrams=ngrams, hash_fn=hash_fn
    )


def score_quality(
    df: DataFrame,
    model: QualityModel,
    text_col: str,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append P(good) under the model — one broadcast + one
    Arrow-batched UDF, scan-stage (no shuffle)."""
    m = _margin_udf(model.weights, model.bias)
    feats = _feature_expr(
        F.col(text_col), model.dim, model.ngrams, model.hash_fn
    )
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-m(feats)))
    )
