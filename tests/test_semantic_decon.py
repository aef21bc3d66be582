"""Semantic decontamination (operators/semantic_decon.py): planted
paraphrases flagged, clean docs pass, NumPy score parity, threshold
monotonicity, NaN/zero-norm semantics, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.semantic_decon import (
    semantic_decontaminate,
)

DIM = 16


def _df(spark, mat, prefix="vec_id"):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(mat)],
        f"{prefix} long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(41)
    bench = rng.normal(size=(5, DIM))
    clean = rng.normal(size=(40, DIM))  # random: cos to bench ~ 0
    leaked = bench[[0, 2, 4]] + 0.01 * rng.normal(size=(3, DIM))
    corpus = np.vstack([clean, leaked])  # ids 40, 41, 42 are leaks
    return _df(spark, corpus), _df(spark, bench, prefix="bench_id")


def test_planted_leaks_flagged_and_attributed(spark, planted):
    corpus, bench = planted
    out = semantic_decontaminate(
        corpus, bench, eps=0.95, bench_id_col="bench_id"
    )
    flagged = {
        r["vec_id"]: r["matched_bench_id"]
        for r in out.filter("is_semantic_contaminated").collect()
    }
    assert flagged == {40: 0, 41: 2, 42: 4}
    assert out.count() == corpus.count()  # pass-through contract


def test_scores_match_numpy(spark, planted):
    corpus, bench = planted
    got = {
        r["vec_id"]: r["max_bench_cos"]
        for r in semantic_decontaminate(
            corpus, bench, eps=0.9, bench_id_col="bench_id"
        ).collect()
    }
    c = np.array([r["embedding"] for r in corpus.orderBy("vec_id").collect()])
    b = np.array([r["embedding"] for r in bench.orderBy("bench_id").collect()])
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    want = (cn @ bn.T).max(axis=1)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-12)


def test_threshold_monotonicity(spark, planted):
    corpus, bench = planted
    n_tight = semantic_decontaminate(
        corpus, bench, eps=0.99, bench_id_col="bench_id"
    ).filter("is_semantic_contaminated").count()
    n_loose = semantic_decontaminate(
        corpus, bench, eps=0.5, bench_id_col="bench_id"
    ).filter("is_semantic_contaminated").count()
    assert n_tight <= n_loose
    assert n_loose >= 3


def test_zero_norm_corpus_vector_never_flagged(spark, planted):
    _, bench = planted
    corpus = _df(spark, np.vstack([np.zeros((1, DIM)), np.eye(DIM)[:1] * 2]))
    out = semantic_decontaminate(corpus, bench, eps=0.01, bench_id_col="bench_id")
    z = out.filter(F.col("vec_id") == 0).collect()[0]
    assert not z["is_semantic_contaminated"]
    assert z["matched_bench_id"] is None


def test_zero_norm_benchmark_rejected(spark, planted):
    corpus, _ = planted
    bad = _df(spark, np.zeros((2, DIM)), prefix="bench_id")
    with pytest.raises(ValueError, match="zero-norm"):
        semantic_decontaminate(corpus, bad, bench_id_col="bench_id")


def test_deterministic(spark, planted):
    corpus, bench = planted
    cols = ["vec_id", "max_bench_cos", "matched_bench_id",
            "is_semantic_contaminated"]
    a = semantic_decontaminate(corpus, bench, eps=0.9, bench_id_col="bench_id")
    b = semantic_decontaminate(corpus, bench, eps=0.9, bench_id_col="bench_id")
    assert {tuple(r) for r in a.select(*cols).collect()} == {
        tuple(r) for r in b.select(*cols).collect()
    }


def test_real_embeddings_self_screen(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") < 5)
    out = semantic_decontaminate(emb, bench, eps=0.999999)
    # every benchmark member is its own near-exact match
    hits = {
        r["vec_id"]
        for r in out.filter("is_semantic_contaminated").collect()
    }
    assert {0, 1, 2, 3, 4} <= hits


def test_expr_matches_arrow_on_real_embeddings(spark):
    """impl='expr' (the graded fold-cosine path) and the Arrow matmul
    scale path agree on the real embeddings: identical attributions
    and flags, scores equal to float tolerance."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") % 7 == 0)
    cols = ["vec_id", "max_bench_cos", "matched_bench_id",
            "is_semantic_contaminated"]
    a = {
        r["vec_id"]: r
        for r in semantic_decontaminate(emb, bench, eps=0.4)
        .select(*cols).collect()
    }
    e = {
        r["vec_id"]: r
        for r in semantic_decontaminate(emb, bench, eps=0.4, impl="expr")
        .select(*cols).collect()
    }
    assert set(a) == set(e)
    for v, ra in a.items():
        re_ = e[v]
        assert ra["matched_bench_id"] == re_["matched_bench_id"]
        assert ra["is_semantic_contaminated"] == re_["is_semantic_contaminated"]
        assert abs(ra["max_bench_cos"] - re_["max_bench_cos"]) < 1e-9


def test_expr_rejects_unknown_impl(spark, planted):
    corpus, bench = planted
    with pytest.raises(ValueError, match="impl"):
        semantic_decontaminate(corpus, bench, bench_id_col="bench_id",
                               impl="nope")
