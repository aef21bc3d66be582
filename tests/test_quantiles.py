"""Bucketed quantile threshold: hand-computed + DuckDB parity +
placement independence."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.quantiles import (
    bucketed_quantile_threshold,
    quantile_keep_flag,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hand_computed(spark):
    # values 0.0, 0.1, ..., 0.9 at resolution 0.1: buckets 0..9, one
    # row each; q=0.5 -> tgt=floor(0.5*10)=5 -> largest b with cc<=5 is
    # b=4 (cc=5) -> threshold=0.5; exactly 5 rows kept.
    df = spark.createDataFrame(
        [(i / 10.0,) for i in range(10)], "v double"
    )
    row = bucketed_quantile_threshold(df, F.col("v"), 0.5, 0.1).collect()[0]
    assert row["threshold"] == 0.5
    assert row["n_total"] == 10
    assert row["n_below"] == 5
    kept = quantile_keep_flag(df, F.col("v"), 0.5, 0.1)
    assert kept.filter(F.col("quantile_kept")).count() == 5
    assert kept.columns[-2:] == ["quantile_threshold", "quantile_kept"]


def test_q_zero_keeps_everything(spark):
    df = spark.createDataFrame([(0.3,), (0.7,)], "v double")
    row = bucketed_quantile_threshold(df, F.col("v"), 0.0, 0.1).collect()[0]
    # tgt=0, no bucket has cc<=0 -> fall back to min bucket lower edge
    assert row["threshold"] == 0.3 - (0.3 % 0.1) or row["threshold"] <= 0.3
    assert row["n_below"] == 0
    kept = quantile_keep_flag(df, F.col("v"), 0.0, 0.1)
    assert kept.filter(F.col("quantile_kept")).count() == 2


def test_ties_in_boundary_bucket_kept(spark):
    # 6 identical values: any q keeps all (single bucket never <= tgt
    # unless tgt >= 6, then threshold moves past it and keeps none --
    # q=1.0 is the degenerate drop-everything case).
    df = spark.createDataFrame([(0.5,)] * 6, "v double")
    assert (
        quantile_keep_flag(df, F.col("v"), 0.5, 0.1)
        .filter(F.col("quantile_kept"))
        .count()
        == 6
    )


def test_placement_independent_duckdb_parity(spark):
    """Threshold over real doc lengths matches DuckDB recomputing the
    same histogram formula, for several q, regardless of input
    partitioning."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    for q in (0.1, 0.5, 0.9):
        want_t, want_n, want_b = con.execute(
            f"""
WITH hist AS (
  SELECT floor(n_chars / 10.0) AS b, count(*) AS c
  FROM documents GROUP BY 1),
cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM hist),
tot AS (SELECT count(*) AS n FROM documents)
SELECT coalesce(max(CASE WHEN cc <= floor({q} * n) THEN b + 1 END),
                (SELECT min(b) FROM hist)) * 10.0,
       (SELECT n FROM tot),
       coalesce(max(CASE WHEN cc <= floor({q} * n) THEN cc END), 0)
FROM cum, tot"""
        ).fetchone()
        for part in (docs, docs.repartition(13), docs.repartition(1)):
            row = bucketed_quantile_threshold(
                part, F.col("n_chars").cast("double"), q, 10.0
            ).collect()[0]
            assert (
                row["threshold"], row["n_total"], row["n_below"]
            ) == (want_t, want_n, want_b), q
