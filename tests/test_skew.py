"""salted_join must be result-identical to the plain join and actually
spread a hot key across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.skew import salted_join
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    build = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(build, "l_orderkey")
    salted = salted_join(li, build, "l_orderkey", salt=4)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted.select(*sorted(salted.columns))) == _sorted_rows(
        plain.select(*sorted(plain.columns))
    )


def test_salt_spreads_hot_key(spark):
    """A single hot key must occupy every salt bucket, i.e. the skewed
    work is divisible across `salt` tasks — asserted on the operator's
    OWN bucket assignment (keep_salt), not a test-side recomputation."""
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(1).select(F.lit(1).alias("k"), F.lit("x").alias("attr"))
    out = salted_join(hot, dim, "k", salt=8, keep_salt=True)
    assert out.count() == 10_000
    per_bucket = {
        r["__salt"]: r["count"]
        for r in out.groupBy("__salt").count().collect()
    }
    assert len(per_bucket) == 8  # every bucket used
    # and the spread is roughly uniform (no bucket hoards the hot key)
    assert max(per_bucket.values()) < 10_000 * 0.5
