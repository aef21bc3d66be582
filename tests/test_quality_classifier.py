"""Quality classifier: NumPy training-twin parity, holdout accuracy,
and the featurization contract. Training is iterative double math
(order-dependent sums), so like kmeans/pagerank it is twin-verified,
not oracle-graded — parity here is the correctness statement."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.quality_classifier import (
    QualityModel,
    hashed_features,
    score_quality,
    train_quality_classifier,
)

GOOD_WORDS = ["theorem", "analysis", "method", "result", "careful"]
BAD_WORDS = ["click", "winner", "free", "casino", "pills"]
SHARED = ["the", "and", "of"]


def _docs(n_each=40, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_each):
        g = " ".join(
            rng.choice(GOOD_WORDS, 6).tolist()
            + rng.choice(SHARED, 3).tolist()
        )
        b = " ".join(
            rng.choice(BAD_WORDS, 6).tolist()
            + rng.choice(SHARED, 3).tolist()
        )
        rows.append((2 * i, g, 1))
        rows.append((2 * i + 1, b, 0))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _docs(), "doc_id long, text string, label int"
    )


class TestFeaturization:
    def test_distinct_bounded_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, "Alpha beta alpha, beta gamma!")], "id long, t string"
        )
        f1 = hashed_features(df, "id", "t", dim=1 << 12).collect()[0][
            "features"
        ]
        f2 = hashed_features(df, "id", "t", dim=1 << 12).collect()[0][
            "features"
        ]
        assert f1 == f2
        assert len(f1) == len(set(f1))
        assert all(0 <= j < (1 << 12) for j in f1)
        # 3 distinct unigrams (case-folded, punctuation split) + 4
        # bigrams with one repeat ("alpha beta" twice? no — "beta
        # alpha" differs) -> strictly more than unigrams alone
        uni = hashed_features(df, "id", "t", dim=1 << 12, ngrams=1)
        assert len(f1) > len(uni.collect()[0]["features"]) == 3

    def test_null_text_is_empty_features_and_scorable(self, spark):
        """Regression (round-6 advisory): a NULL document used to reach
        the margin UDF as a None features array and crash both train
        and score with a TypeError. NULL text now featurizes to [] and
        scores at sigmoid(bias)."""
        df = spark.createDataFrame(
            [(1, "real text here"), (2, None)], "id long, t string"
        )
        got = {
            r["id"]: r["features"]
            for r in hashed_features(df, "id", "t", dim=256).collect()
        }
        assert got[2] == []
        model = QualityModel(
            weights=np.ones(256), bias=0.5, dim=256, ngrams=2
        )
        scores = {
            r["id"]: r["quality_prob"]
            for r in score_quality(df, model, "t").collect()
        }
        assert scores[2] == pytest.approx(1.0 / (1.0 + np.exp(-0.5)))
        assert scores[1] > scores[2]  # positive weights on real tokens
        # training over a frame containing a NULL document must not crash
        tr = spark.createDataFrame(
            [(1, "good solid text", 1), (2, None, 0), (3, "spam spam", 0)],
            "id long, t string, y int",
        )
        m = train_quality_classifier(
            tr, "id", "t", "y", dim=256, epochs=2
        )
        assert np.isfinite(m.bias) and np.isfinite(m.weights).all()

    def test_short_docs_no_bigrams(self, spark):
        df = spark.createDataFrame(
            [(1, "word"), (2, ""), (3, "two tokens")], "id long, t string"
        )
        got = {
            r["id"]: r["features"]
            for r in hashed_features(df, "id", "t", dim=256).collect()
        }
        assert len(got[1]) == 1
        assert got[2] == []
        assert len(got[3]) == 3  # 2 unigrams + 1 bigram


class TestTraining:
    def test_numpy_twin_parity(self, spark, corpus):
        """Three epochs of Spark GD must match the identical NumPy
        loop on the same features to float-sum tolerance."""
        dim, epochs, lr, l2 = 512, 3, 0.5, 1e-4
        model = train_quality_classifier(
            corpus, "doc_id", "text", "label",
            dim=dim, ngrams=2, epochs=epochs, lr=lr, l2=l2,
        )
        feats = {
            r["id"]: np.asarray(r["features"], dtype=np.int64)
            for r in hashed_features(
                corpus, "doc_id", "text", dim=dim
            ).collect()
        }
        ys = {
            r["doc_id"]: float(r["label"]) for r in corpus.collect()
        }
        n = len(ys)
        w = np.zeros(dim)
        b = 0.0
        for _ in range(epochs):
            grad = np.zeros(dim)
            bg = 0.0
            for i, idx in feats.items():
                m = b + w[idx].sum()
                r = 1.0 / (1.0 + np.exp(-m)) - ys[i]
                grad[idx] += r
                bg += r
            w -= lr * (grad / n + l2 * w)
            b -= lr * (bg / n)
        np.testing.assert_allclose(model.weights, w, atol=1e-9)
        assert abs(model.bias - b) < 1e-9

    def test_holdout_accuracy_and_score_shape(self, spark, corpus):
        model = train_quality_classifier(
            corpus, "doc_id", "text", "label",
            dim=1 << 14, epochs=25, lr=2.0,
        )
        holdout = spark.createDataFrame(
            [
                (1, "careful analysis of the method and result", 1),
                (2, "theorem result analysis of careful method", 1),
                (3, "free pills click the casino winner", 0),
                (4, "winner winner free casino click and pills", 0),
            ],
            "doc_id long, text string, label int",
        )
        scored = score_quality(holdout, model, "text")
        rows = scored.collect()
        assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)
        acc = sum(
            1
            for r in rows
            if (r["quality_prob"] > 0.5) == (r["label"] == 1)
        ) / len(rows)
        assert acc == 1.0

    def test_empty_frame_is_loud(self, spark):
        empty = spark.createDataFrame(
            [], "doc_id long, text string, label int"
        )
        with pytest.raises(ValueError, match="empty"):
            train_quality_classifier(
                empty, "doc_id", "text", "label", dim=64, epochs=1
            )

    def test_model_shape_guard(self):
        with pytest.raises(ValueError, match="shape"):
            QualityModel(
                weights=np.zeros(4), bias=0.0, dim=8, ngrams=2
            )
