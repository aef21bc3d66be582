"""salted_join must be result-identical to the plain join and actually
spread a hot key across salt buckets."""

from __future__ import annotations

import pytest
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


# ------------------------------------------- round-5 skew diagnostics

def test_key_skew_report_and_summary(spark):
    import duckdb

    from globalweather_etl_spark.operators.skew_report import (
        key_skew_report,
        skew_summary,
    )

    rows = [("hot",)] * 50 + [("warm",)] * 10 + [(k,) for k in "abcde"]
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, "k", top_k=3).collect()
    assert [(r["k"], r["n_rows"]) for r in rep] == [
        ("hot", 50), ("warm", 10), ("a", 1)  # tie among a-e -> 'a'
    ]
    assert rep[0]["share"] == 50 / 65
    [s] = skew_summary(df, "k").collect()
    assert s["n_groups"] == 7 and s["max_group"] == 50
    assert s["mean_group"] == pytest.approx(65 / 7)
    assert s["skew_ratio"] == pytest.approx(50 / (65 / 7))

    # DuckDB twin of the top-k report on real events
    from globalweather_etl_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = [
        (r["event_type"], r["n_rows"])
        for r in key_skew_report(ev, "event_type", top_k=5).collect()
    ]
    want = duckdb.connect().execute(
        "SELECT event_type, count(*)::BIGINT FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') "
        "GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_skew_report_topk_plan(spark):
    from globalweather_etl_spark.operators.skew_report import (
        key_skew_report,
    )

    df = spark.createDataFrame([("a",)], "k string")
    plan = (
        key_skew_report(df, "k")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # bounded top-k, no global sort


def test_skew_report_errors(spark):
    from globalweather_etl_spark.operators.skew_report import (
        key_skew_report,
        skew_summary,
    )

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        key_skew_report(df, [])
    with pytest.raises(ValueError):
        key_skew_report(df, "k", top_k=0)
    with pytest.raises(ValueError):
        skew_summary(df, [])
