"""column_profile: exact stats vs DuckDB on real tables, error bound on
the approximate distinct, null accounting, and the one-pass shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.profile import column_profile
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_exact_stats_match_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {r["column"]: r for r in column_profile(docs).collect()}
    con = duckdb.connect()
    for c in ["doc_id", "lang", "source", "n_chars"]:
        n, nn, nd, mn, mx = con.execute(
            f"""SELECT count(*), count({c}), count(DISTINCT {c}),
                       CAST(min({c}) AS VARCHAR), CAST(max({c}) AS VARCHAR)
                FROM read_parquet('{SF_DIR}/documents.parquet')"""
        ).fetchone()
        p = got[c]
        assert p["n_rows"] == n
        assert p["n_nulls"] == n - nn
        assert p["min_str"] == mn and p["max_str"] == mx
        # HLL++ at rsd=0.05: allow 4 sigma
        assert abs(p["approx_distinct"] - nd) <= max(2, 0.2 * nd), (c, p, nd)


def test_null_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "k long, v string"
    )
    got = {r["column"]: r for r in column_profile(df).collect()}
    assert got["v"]["n_nulls"] == 2 and got["k"]["n_nulls"] == 0
    assert got["v"]["min_str"] == "a" and got["v"]["max_str"] == "a"


def test_column_selection_and_errors(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    assert {r["column"] for r in column_profile(df, ["k"]).collect()} == {"k"}
    with pytest.raises(ValueError, match="unknown columns"):
        column_profile(df, ["nope"])


def test_one_pass_plan(spark):
    """All columns' stats ride ONE aggregate — no per-column scans."""
    events = load_table(spark, SF_DIR, "events")
    plan = column_profile(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
