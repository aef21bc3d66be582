"""Resampling: linear interpolation (resample_interpolate) — hand
fixtures, exact-tick reproduction, strict NULL boundaries, and a
DuckDB ASOF-twin on real events."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.resample import (
    resample_interpolate,
    resample_last,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 5, 1, 10, 0, 0)


def _obs(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), float(v)) for u, m, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_hand_computed_lerp(spark):
    # observations at 10:30 (v=10) and 13:30 (v=40): hourly grid from
    # 10:00; ticks at 11:00, 12:00, 13:00 interpolate linearly
    df = _obs(spark, [(1, 30, 10.0), (1, 210, 40.0)])
    got = {
        r["grid_ts"]: r["value_interp"]
        for r in resample_interpolate(
            df, ["user_id"], "ts", "value"
        ).collect()
    }
    assert got[T0] is None  # before the first observation: strict NULL
    assert got[T0 + dt.timedelta(hours=1)] == 15.0  # 30/180 of the way
    assert got[T0 + dt.timedelta(hours=2)] == 25.0
    assert got[T0 + dt.timedelta(hours=3)] == 35.0


def test_tick_on_observation_reproduces_it(spark):
    df = _obs(spark, [(1, 0, 7.0), (1, 60, 9.0)])
    got = {
        r["grid_ts"]: r["value_interp"]
        for r in resample_interpolate(
            df, ["user_id"], "ts", "value"
        ).collect()
    }
    assert got[T0] == 7.0
    assert got[T0 + dt.timedelta(hours=1)] == 9.0


def test_single_observation_only_exact_tick(spark):
    df = _obs(spark, [(1, 0, 3.0)])
    rows = resample_interpolate(df, ["user_id"], "ts", "value").collect()
    assert len(rows) == 1 and rows[0]["value_interp"] == 3.0


def test_interp_matches_duckdb_asof_twin(spark):
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "value"
    )
    got = {
        (r["user_id"], r["grid_ts"]): r["value_interp"]
        for r in resample_interpolate(
            events, ["user_id"], "ts", "value"
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"""
WITH src AS (
  -- TIMESTAMP_NS -> TIMESTAMP truncates ns to us, exactly
  -- load_table's div-1000 repair on the Spark side
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM read_parquet('{SF_DIR}/events.parquet')),
obs AS (SELECT user_id, ts, max(value) AS value FROM src
        GROUP BY user_id, ts),
bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
  FROM src GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
    AS grid_ts
  FROM bounds),
p AS (
  SELECT g.user_id, g.grid_ts, o.ts AS prev_ts, o.value AS prev_value
  FROM grid g ASOF LEFT JOIN obs o
    ON g.user_id = o.user_id AND g.grid_ts >= o.ts),
n AS (
  SELECT g.user_id, g.grid_ts, o.ts AS next_ts, o.value AS next_value
  FROM grid g ASOF LEFT JOIN obs o
    ON g.user_id = o.user_id AND g.grid_ts <= o.ts)
SELECT p.user_id, p.grid_ts,
  round(CASE
    WHEN prev_ts IS NULL OR next_ts IS NULL THEN NULL
    WHEN epoch_us(next_ts) = epoch_us(prev_ts) THEN prev_value
    ELSE prev_value + (next_value - prev_value)
      * (CAST(epoch_us(p.grid_ts) AS DOUBLE)
         - CAST(epoch_us(prev_ts) AS DOUBLE))
      / (CAST(epoch_us(next_ts) AS DOUBLE)
         - CAST(epoch_us(prev_ts) AS DOUBLE)) END, 9)
FROM p JOIN n ON p.user_id = n.user_id AND p.grid_ts = n.grid_ts"""
        ).fetchall()
    }
    assert got == want and len(got) > 100


def test_interp_grid_matches_ffill_grid(spark):
    """Both resample forms must produce the identical grid skeleton
    (same keys, same ticks) so graded columns can join 1:1."""
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "value"
    )
    a = resample_last(
        events, ["user_id"], "ts", ["value"]
    ).select("user_id", "grid_ts")
    b = resample_interpolate(events, ["user_id"], "ts", "value").select(
        "user_id", "grid_ts"
    )
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_time_weighted_avg_hand_computed(spark):
    from globalweather_etl_spark.operators.resample import time_weighted_avg

    # v=10 held 1h, v=40 held 3h -> twap = (10*1 + 40*3) / 4 = 32.5
    df = _obs(spark, [(1, 0, 10.0), (1, 60, 40.0), (1, 240, 99.0)])
    [r] = time_weighted_avg(df, ["user_id"], "ts", "value").collect()
    assert r["twap"] == 32.5
    # singleton key: no interval -> no row (NULL semantics via filter)
    single = _obs(spark, [(2, 0, 7.0)])
    assert time_weighted_avg(single, ["user_id"], "ts", "value").count() == 0


def test_time_weighted_avg_irregular_vs_plain_mean(spark):
    from globalweather_etl_spark.operators.resample import time_weighted_avg

    # many samples at v=100 in one minute, then v=0 held a day:
    # plain mean is ~50+, twap is ~0
    rows = [(1, m / 60, 100.0) for m in range(10)] + [
        (1, 10, 0.0),
        (1, 60 * 24, 0.0),
    ]
    df = _obs(spark, rows)
    [r] = time_weighted_avg(df, ["user_id"], "ts", "value").collect()
    assert r["twap"] < 2.0
