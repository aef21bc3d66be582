"""Cohort retention: hand-computed fixture + DuckDB parity."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.retention import retention_cohorts
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_weekly(spark):
    # Mondays: 2024-03-04, 03-11, 03-18
    rows = [
        (1, dt.datetime(2024, 3, 4, 10)),   # u1 cohort w0
        (1, dt.datetime(2024, 3, 12, 9)),   # active w1
        (1, dt.datetime(2024, 3, 20, 9)),   # active w2
        (2, dt.datetime(2024, 3, 6, 8)),    # u2 cohort w0 (same week)
        (2, dt.datetime(2024, 3, 6, 9)),    # same week dup -> one activity
        (3, dt.datetime(2024, 3, 11, 8)),   # u3 cohort w1
        (3, dt.datetime(2024, 3, 18, 8)),   # active w2 (offset 1)
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (str(r["cohort"]), r["period_offset"]): (
            r["n_active"], r["n_cohort"], r["retention"]
        )
        for r in retention_cohorts(events, period="week").collect()
    }
    w0, w1 = "2024-03-04 00:00:00", "2024-03-11 00:00:00"
    assert out[(w0, 0)] == (2, 2, 1.0)
    assert out[(w0, 1)] == (1, 2, 0.5)
    assert out[(w0, 2)] == (1, 2, 0.5)
    assert out[(w1, 0)] == (1, 1, 1.0)
    assert out[(w1, 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_bad_period(spark):
    events = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(events, period="fortnight")


@pytest.mark.parametrize("period,trunc", [("day", "day"), ("week", "week"), ("month", "month")])
def test_duckdb_parity(spark, period, trunc):
    events = load_table(spark, SF_DIR, "events")
    got = {
        (str(r["cohort"]), r["period_offset"]): (
            r["n_active"], r["n_cohort"], round(r["retention"], 12)
        )
        for r in retention_cohorts(events, period=period).collect()
    }
    con = duckdb.connect()
    off = {
        "day": "datediff('day', cohort, period)",
        "week": "datediff('day', cohort, period) // 7",
        "month": "(year(period) - year(cohort)) * 12 + (month(period) - month(cohort))",
    }[period]
    want = {
        (str(r[0]), r[1]): (r[2], r[3], round(r[4], 12))
        for r in con.execute(
            f"""
WITH activity AS (
  SELECT DISTINCT user_id AS u,
         date_trunc('{trunc}', ts::TIMESTAMP)::TIMESTAMP AS period
  FROM read_parquet('{SF_DIR}/events.parquet')),
cohorts AS (SELECT u, min(period) AS cohort FROM activity GROUP BY u),
j AS (SELECT a.u, c.cohort, a.period
      FROM activity a JOIN cohorts c USING (u)),
active AS (
  SELECT cohort, ({off})::INTEGER AS period_offset,
         count(*)::BIGINT AS n_active
  FROM j GROUP BY 1, 2),
sizes AS (SELECT cohort, count(*)::BIGINT AS n_cohort
          FROM cohorts GROUP BY 1)
SELECT cohort, period_offset, n_active, n_cohort,
       n_active::DOUBLE / n_cohort::DOUBLE AS retention
FROM active JOIN sizes USING (cohort)"""
        ).fetchall()
    }
    assert got == want
    # offset-0 rows are fully retained by construction
    assert all(v[2] == 1.0 for k, v in got.items() if k[1] == 0)


def test_graded_day_spine_reshape(spark):
    """The registry's day-grain reshape (q_events_tumbling_daily):
    per-day cohort sizes partition the distinct-user population, and
    the comeback columns agree with the raw triangle."""
    from globalweather_etl_spark.queries import q_events_tumbling_daily

    out = q_events_tumbling_daily(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    per_day = {}
    for r in out:
        per_day[r["window_start"]] = (
            r["cohort_size"], r["ret_d1_active"], r["ret_d7_active"]
        )
        if r["cohort_size"] == 0:
            assert r["ret_d1"] == 0.0 and r["ret_d7"] == 0.0
        else:
            assert r["ret_d1"] == r["ret_d1_active"] / r["cohort_size"]
    assert sum(v[0] for v in per_day.values()) == n_users
    tri = {
        (r["cohort"], r["period_offset"]): r["n_active"]
        for r in retention_cohorts(ev, period="day").collect()
    }
    for day, (size, d1, d7) in per_day.items():
        if size:
            assert tri.get((day, 1), 0) == d1
            assert tri.get((day, 7), 0) == d7
