"""DSIR importance resampling (operators/dsir.py): hand-computed
ratios/scores vs a pure-Python reference, smoothing semantics, and
the no-UDF plan contract."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row

from globalweather_etl_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_score,
)

B = 64


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % B


def _grams(text: str) -> list[str]:
    toks = text.strip().split()
    return toks + [
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    ]


def _py_ratios(target_texts, raw_texts):
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for t in target_texts:
        for g in _grams(t):
            tc[_bucket(g)] = tc.get(_bucket(g), 0) + 1
    for t in raw_texts:
        for g in _grams(t):
            rc[_bucket(g)] = rc.get(_bucket(g), 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    return {
        b: round(
            math.log(
                ((tc.get(b, 0) + 1.0) * (R + B))
                / ((c + 1.0) * (T + B))
            ),
            9,
        )
        for b, c in rc.items()
    }


def test_dsir_matches_python_reference(spark):
    target = [
        "the quick brown fox jumps",
        "the lazy dog sleeps all day",
        "quick brown foxes are quick",
    ]
    raw = [
        "stock prices fell sharply today",
        "the quick brown fox returned",
        "buy cheap pills online now",
        "the dog and the fox",
    ]
    tdf = spark.createDataFrame([Row(text=t) for t in target])
    rdf = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(raw)]
    )
    ratios = dsir_log_ratios(tdf, rdf, "text", buckets=B)
    got_w = {r["__b"]: float(r["w"]) for r in ratios.collect()}
    want_w = _py_ratios(target, raw)
    assert got_w == pytest.approx(want_w, abs=1e-9)
    assert set(got_w) == set(want_w)

    scored = dsir_score(rdf, ratios, "text", "doc_id", buckets=B)
    got = {r["doc_id"]: r for r in scored.collect()}
    for i, t in enumerate(raw):
        gs = _grams(t)
        want = sum(want_w[_bucket(g)] for g in gs)
        assert got[i]["n_grams"] == len(gs)
        assert got[i]["dsir_logw"] == pytest.approx(want, abs=1e-6)
    # the target-like raw doc must outscore the spammy one
    assert got[1]["dsir_logw"] > got[2]["dsir_logw"]


def test_dsir_guards_and_plan(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    with pytest.raises(ValueError, match="buckets"):
        dsir_log_ratios(df, df, "text", buckets=1)
    ratios = dsir_log_ratios(df, df, "text", buckets=B)
    plan = (
        dsir_score(df, ratios, "text", "doc_id", buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_score_expr_matches_exact_route(spark):
    """The scan-stage expression scorer equals the exact-DECIMAL
    groupBy route to float tolerance — batch AND through a stream."""
    from globalweather_etl_spark.operators.dsir import dsir_score_expr

    target = spark.createDataFrame(
        [Row(text="alpha beta gamma"), Row(text="alpha alpha beta")]
    )
    raw = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                ["alpha beta", "delta epsilon zeta", "beta gamma alpha"]
            )
        ]
    )
    ratios = dsir_log_ratios(target, raw, "text", buckets=B)
    exact = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_score(raw, ratios, "text", "doc_id", buckets=B)
        .collect()
    }
    from pyspark.sql import functions as F

    expr = dsir_score_expr(ratios, F.col("text"), buckets=B)
    got = {
        r["doc_id"]: r["s"]
        for r in raw.select("doc_id", expr.alias("s")).collect()
    }
    for k, v in exact.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_dsir_score_expr_streams(spark, tmp_path):
    """Stateless per-row scoring works unchanged on a stream (the
    streaming curation scorer) — drained scores equal the batch."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.dsir import dsir_score_expr

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                ["the quick fox", "spam spam spam", "the lazy dog",
                 "quick dog fox the"]
            )
        ]
    )
    landing = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(landing)
    batch = spark.read.parquet(landing)
    ratios = dsir_log_ratios(
        batch.filter(F.col("doc_id") % 2 == 0),
        batch,
        "text",
        buckets=B,
    )
    expr = dsir_score_expr(ratios, F.col("text"), buckets=B)
    want = {
        r["doc_id"]: r["s"]
        for r in batch.select("doc_id", expr.alias("s")).collect()
    }
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(landing)
        .select("doc_id", expr.alias("s"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_dsir_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["s"]
        for r in spark.table("t_dsir_stream").collect()
    }
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_dsir_resample_topk_gumbel(spark):
    """Gumbel top-k: deterministic across runs, selection frequency
    tracks exp(logw) across seeds, plan uses TakeOrdered (never a
    global sort), and k >= n returns everything."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.dsir import (
        dsir_resample_topk,
    )

    scored = spark.createDataFrame(
        [Row(doc_id=i, dsir_logw=(2.5 if i < 4 else -2.5))
         for i in range(40)]
    )
    one = dsir_resample_topk(scored, 8, "doc_id", seed=3)
    again = dsir_resample_topk(scored, 8, "doc_id", seed=3)
    assert sorted(r["doc_id"] for r in one.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    # heavy docs (logw=2.5, weight e^5 ~ 148x the light ones) should
    # dominate selections across seeds
    heavy = 0
    for s in range(30):
        sel = dsir_resample_topk(scored, 4, "doc_id", seed=s).collect()
        heavy += sum(1 for r in sel if r["doc_id"] < 4)
    assert heavy >= 0.8 * 30 * 4  # ~all four heavies nearly always

    assert dsir_resample_topk(scored, 100, "doc_id").count() == 40
    with pytest.raises(ValueError, match="k must be"):
        dsir_resample_topk(scored, 0, "doc_id")
