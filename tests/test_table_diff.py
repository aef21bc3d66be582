"""Snapshot diff / CDC: hand-computed classifications incl. NULL-safe
semantics, summary identity, SCD2 composition sanity, and a DuckDB
full-outer twin over real orders snapshots."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.table_diff import (
    diff_summary,
    table_diff,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (3, "c", 30.0),
            (4, "d", 40.0),
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),     # unchanged
            (2, "b", None),     # unchanged (NULL == NULL)
            (3, "c", 31.0),     # updated: v
            (5, "e", None),     # inserted
        ],
        "k long, s string, v double",
    )
    return old, new


def test_hand_computed_classification(snaps):
    old, new = snaps
    got = {
        r["k"]: (r["diff_status"], r["changed_cols"])
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("unchanged", ""),
        2: ("unchanged", ""),
        3: ("updated", "v"),
        4: ("deleted", ""),
        5: ("inserted", ""),
    }


def test_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k long, s string")
    got = {
        r["k"]: r["diff_status"]
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "updated", 2: "updated"}


def test_multi_column_changed_list_order(spark):
    old = spark.createDataFrame([(1, "a", 1.0, "p")], "k long, s string, v double, t string")
    new = spark.createDataFrame([(1, "b", 1.0, "q")], "k long, s string, v double, t string")
    [r] = table_diff(old, new, ["k"]).collect()
    assert r["changed_cols"] == "s,t"  # old's column order, v skipped
    assert r["old_s"] == "a" and r["new_s"] == "b"


def test_summary_identity(snaps):
    old, new = snaps
    d = table_diff(old, new, ["k"])
    [s] = diff_summary(d).collect()
    assert (s["n_inserted"], s["n_deleted"], s["n_updated"], s["n_unchanged"]) \
        == (1, 1, 1, 2)
    # row-count identity: diff rows == union of keys
    assert d.count() == 5


def test_errors(snaps):
    old, new = snaps
    with pytest.raises(ValueError):
        table_diff(old, new, [])
    with pytest.raises(ValueError):
        table_diff(old, new, ["nope"])


def test_duckdb_twin_on_orders(spark):
    """Deterministically mutated orders snapshots: deletes (key%5==0
    dropped), inserts (key%3==0 only in new), price updates (key%7==0)
    — the twin recomputes the same full-outer classification."""
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.filter(F.col("o_orderkey") % 3 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    d = table_diff(old, new, ["o_orderkey"])
    got = sorted(
        (r["o_orderkey"], r["diff_status"], r["changed_cols"])
        for r in d.collect()
    )
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
WITH src AS (SELECT o_orderkey, o_totalprice, o_orderstatus
             FROM read_parquet('{SF_DIR}/orders.parquet')),
old AS (SELECT * FROM src WHERE o_orderkey % 3 != 0),
new AS (SELECT o_orderkey,
          CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM src WHERE o_orderkey % 5 != 0)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
  CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
       WHEN n.o_orderkey IS NULL THEN 'deleted'
       WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
         OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       THEN 'updated' ELSE 'unchanged' END AS st,
  CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
        AND (o.o_totalprice IS DISTINCT FROM n.o_totalprice
             OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
       THEN concat_ws(',',
         CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
              THEN 'o_totalprice' END,
         CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
              THEN 'o_orderstatus' END)
       ELSE '' END AS ch
FROM old o FULL OUTER JOIN new n USING (o_orderkey)"""
            ).fetchall(),
        )
    )
    assert got == want
