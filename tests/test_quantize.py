"""int8 embedding quantization: error bound, round-trip, ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.quantize import (
    dequantize_embeddings,
    quantize_embeddings,
)
from globalweather_etl_spark.operators.similarity import cosine_topk
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_roundtrip_error_bound(spark, emb):
    """|x - dequant(quant(x))| <= scale/254 component-wise (round to
    nearest of a 1/127-scale grid)."""
    q = quantize_embeddings(emb.select("vec_id", "embedding"), "embedding")
    back = dequantize_embeddings(
        q.join(
            emb.select("vec_id", F.col("embedding").alias("orig")), "vec_id"
        ),
        "embedding",
        out_col="deq",
    )
    worst = back.select(
        F.array_max(
            F.zip_with(
                "orig",
                "deq",
                lambda a, b: F.abs(a.cast("double") - b.cast("double")),
            )
        ).alias("err"),
        F.array_max(F.transform("orig", lambda x: F.abs(x))).alias("scale"),
    ).select(F.max(F.col("err") / (F.col("scale") / 254.0)).alias("ratio"))
    # allow float32 rounding slack on the bound itself
    assert worst.collect()[0]["ratio"] <= 1.01


def test_schema_and_size(spark, emb):
    q = quantize_embeddings(emb.select("vec_id", "embedding"), "embedding")
    types = dict(q.dtypes)
    assert types["embedding_q8"] == "array<tinyint>"
    assert types["embedding_scale"] == "float"
    assert q.count() == emb.count()


def test_ann_recall_on_quantized(spark, emb):
    """Top-10 cosine neighbors computed on dequantized int8 vectors
    must recall >=90% of the full-precision top-10 (measured, not
    assumed; typical observed is ~99%)."""
    base = emb.select("vec_id", "embedding")
    queries = base.orderBy("vec_id").limit(20)
    exact = cosine_topk(base, queries, k=10)
    deq = dequantize_embeddings(
        quantize_embeddings(base, "embedding"), "embedding"
    )
    approx = cosine_topk(deq, queries, k=10)

    def pairs(df):
        return {(r["query_id"], r["cand_id"]) for r in df.collect()}

    e, a = pairs(exact), pairs(approx)
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"recall {recall}"
