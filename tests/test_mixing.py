"""mix_corpora: proportions, determinism, shortfall semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.mixing import mix_corpora
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpora(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    a = docs.filter(F.col("doc_id") % 2 == 0)  # ~250 rows
    b = docs.filter(F.col("doc_id") % 2 == 1)  # ~250 rows
    return a, b


def test_target_rows_proportions(spark, corpora):
    a, b = corpora
    out = mix_corpora(
        {"web": (a, 3.0), "code": (b, 1.0)},
        F.col("doc_id"),
        total_rows=200,
        seed=5,
    )
    by_src = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    # 75/25 of 200 with 1/65536-resolution hash rates: generous ±20%
    assert 120 <= by_src["web"] <= 180
    assert 30 <= by_src["code"] <= 70


def test_no_target_scarcest_source_binds(spark, corpora):
    # With weights 1:9 over two ~equal-size corpora, the 9-weight source
    # is the scarcest per weight unit: it keeps 100% and the other
    # downsamples to ~1/9 of it, preserving the target proportions.
    a, b = corpora
    nb = b.count()
    out = mix_corpora(
        {"big": (a, 1.0), "small": (b, 9.0)}, F.col("doc_id"), seed=5
    )
    by_src = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["small"] == nb
    expected_big = nb / 9.0
    # hash-rate sampling at 1/65536 resolution: generous ±60% band
    assert 0.4 * expected_big <= by_src["big"] <= 1.6 * expected_big


def test_no_target_equal_weights_equal_sizes_keeps_all(spark, corpora):
    # Equal weights over equal-size corpora: every source is equally
    # scarce, so nothing downsamples. (Same frame twice — per-source key
    # salting keeps the draws independent.)
    a, _ = corpora
    out = mix_corpora({"x": (a, 1.0), "y": (a, 1.0)}, F.col("doc_id"), seed=5)
    assert out.count() == 2 * a.count()


def test_deterministic_and_tagged(spark, corpora):
    a, b = corpora
    args = dict(key=F.col("doc_id"), total_rows=150, seed=11)
    one = mix_corpora({"x": (a, 1.0), "y": (b, 1.0)}, **args)
    two = mix_corpora({"x": (a.repartition(7), 1.0), "y": (b, 1.0)}, **args)
    s1 = {(r["doc_id"], r["mix_source"]) for r in one.collect()}
    s2 = {(r["doc_id"], r["mix_source"]) for r in two.collect()}
    assert s1 == s2
    assert {t[1] for t in s1} == {"x", "y"}


def test_shortfall_not_reweighted(spark, corpora):
    a, b = corpora
    tiny = b.limit(10)
    out = mix_corpora(
        {"main": (a, 1.0), "tiny": (tiny, 1.0)},
        F.col("doc_id"),
        total_rows=400,
        seed=3,
    )
    by_src = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    # tiny cannot fill its 200-row share: it contributes all 10 rows
    # and main is NOT inflated to compensate
    assert by_src["tiny"] == 10
    assert by_src["main"] <= 250


def test_streaming_source_rejected(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from globalweather_etl_spark.sources import write_jsonl
    from globalweather_etl_spark.streaming import jsonl_stream_from_dir

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "landing")
    write_jsonl(docs, path, partitions=1)
    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    stream = jsonl_stream_from_dir(spark, path, schema)
    with pytest.raises(ValueError, match="streaming"):
        mix_corpora({"s": (stream, 1.0)}, F.col("doc_id"), total_rows=10)
