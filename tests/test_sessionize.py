"""Per-event sessionization: hand-computed islands, consistency with
session_window aggregates, DuckDB parity on real events."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.sessionize import sessionize
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hand_computed_islands(spark):
    rows = [
        ("u1", 0.0), ("u1", 10.0), ("u1", 40.0),   # gap 30 == gap -> merge
        ("u1", 80.0),                               # gap 40 > 30 -> new
        ("u2", 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, t double")
    out = sessionize(df, "k", "t", gap_seconds=30.0)
    got = {(r["k"], r["t"]): (r["session_id"], r["session_start"])
           for r in out.collect()}
    assert got == {
        ("u1", 0.0): (1, 0.0),
        ("u1", 10.0): (1, 0.0),
        ("u1", 40.0): (1, 0.0),
        ("u1", 80.0): (2, 80.0),
        ("u2", 5.0): (1, 5.0),
    }


def test_consistent_with_session_window_aggregates(spark):
    """Session count and sizes per user must equal what Spark's own
    session_window computes (the graded events_session_30m path)."""
    events = load_table(spark, SF_DIR, "events")
    per_event = sessionize(events, "user_id", "ts", gap_seconds=1800.0)
    mine = (
        per_event.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("session_start"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    theirs = (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    a = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in mine.collect()}
    b = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in theirs.collect()}
    assert a == b


def test_duckdb_parity(spark):
    import duckdb

    events = load_table(spark, SF_DIR, "events")
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(events, "user_id", "ts", 1800.0).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS s
  FROM read_parquet('{SF_DIR}/events.parquet')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT user_id, event_id,
  sum(s) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
FROM flagged""").fetchall()
    }
    assert got == want
