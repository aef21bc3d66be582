"""Bucketed tables must give shuffle-free joins: the plan property is
the test — a join of two co-bucketed tables may not contain an
Exchange, and its result must match the plain join."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from globalweather_etl_spark.sources import load_table
from globalweather_etl_spark.sources.bucketed import bucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert warehouse  # managed tables need a warehouse dir
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


@pytest.fixture()
def no_autobroadcast(spark):
    """At sf0.001 the planner would broadcast the small side (bypassing
    bucketing entirely); disabling auto-broadcast simulates the 100 TB
    regime where neither side fits in memory."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, prev)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_autobroadcast):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
    plan = _plan(joined.select("l_orderkey", "o_totalprice"))
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        .groupBy()
        .count()
        .collect()[0]["count"]
    )
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    want = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy()
        .count()
        .collect()[0]["count"]
    )
    assert got == want
