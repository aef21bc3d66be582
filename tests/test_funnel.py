"""Funnel analysis: hand-computed fixture + DuckDB greedy-match twin."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from globalweather_etl_spark.operators.funnel import funnel
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _t(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


@pytest.fixture(scope="module")
def fixture(spark):
    rows = [
        # u1 converts: A(9) -> B(10) -> C(11); later A ignored (greedy first)
        (1, 1, _t(9), "A"), (2, 1, _t(10), "B"), (3, 1, _t(11), "C"),
        (4, 1, _t(12), "A"),
        # u2: B before A doesn't count; reaches A then B, no C
        (5, 2, _t(8), "B"), (6, 2, _t(9), "A"), (7, 2, _t(10), "B"),
        # u3: only C -> 0 steps
        (8, 3, _t(9), "C"),
        # u4: A then C (no B) -> 1 step
        (9, 4, _t(9), "A"), (10, 4, _t(10), "C"),
        # u5: tie on ts — B at the same ts as A but larger event id counts
        (11, 5, _t(9), "A"), (12, 5, _t(9), "B"),
        # u6: irrelevant types only
        (13, 6, _t(9), "X"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_fixture_semantics(fixture):
    out = {
        r["user_id"]: (r["steps_reached"], r["converted"], r["t_first"], r["t_last"])
        for r in funnel(fixture, ["A", "B", "C"]).collect()
    }
    assert out[1] == (3, True, _t(9), _t(11))
    assert out[2] == (2, False, _t(9), _t(10))
    assert out[3] == (0, False, None, None)
    assert out[4] == (1, False, _t(9), _t(9))
    assert out[5] == (2, False, _t(9), _t(9))
    assert 6 not in out  # no funnel-relevant events -> no row


def test_within_horizon(fixture):
    # one-hour horizon: u1's C at 11:00 is 2h after A -> only A+B count
    out = {
        r["user_id"]: r["steps_reached"]
        for r in funnel(fixture, ["A", "B", "C"], within_seconds=3600).collect()
    }
    assert out[1] == 2
    assert out[2] == 2  # B one hour after A: exactly at the horizon


def test_duckdb_parity(spark):
    """signup -> click -> purchase over the real events table vs a
    chained greedy-earliest SQL twin, without and with a horizon."""
    events = load_table(spark, SF_DIR, "events")
    for within in (None, 3 * 86400):
        got = {
            r["user_id"]: (
                r["steps_reached"], r["converted"], r["t_first"], r["t_last"]
            )
            for r in funnel(
                events, ["signup", "click", "purchase"],
                within_seconds=within,
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"""CREATE VIEW events AS
            SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type
            FROM read_parquet('{SF_DIR}/events.parquet')"""
        )
        w = "NULL" if within is None else str(within)
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(
                f"""
WITH m1 AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) = 1),
m2 AS (
  SELECT e.user_id, e.ts, e.event_id
  FROM events e JOIN m1 ON m1.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND (e.ts > m1.ts OR (e.ts = m1.ts AND e.event_id > m1.event_id))
  QUALIFY row_number() OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id) = 1),
m3 AS (
  SELECT e.user_id, e.ts, e.event_id
  FROM events e JOIN m2 ON m2.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND (e.ts > m2.ts OR (e.ts = m2.ts AND e.event_id > m2.event_id))
  QUALIFY row_number() OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id) = 1),
seen AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')),
raw AS (
  SELECT s.user_id, m1.ts AS t1, m2.ts AS t2, m3.ts AS t3
  FROM seen s
  LEFT JOIN m1 USING (user_id)
  LEFT JOIN m2 USING (user_id)
  LEFT JOIN m3 USING (user_id)),
lim AS (
  SELECT user_id, t1,
    CASE WHEN {w} IS NULL THEN t2
         WHEN t2 IS NOT NULL
              AND epoch(t2) - epoch(t1) <= {w} THEN t2 END AS t2,
    CASE WHEN {w} IS NULL THEN t3
         WHEN t3 IS NOT NULL
              AND epoch(t3) - epoch(t1) <= {w} THEN t3 END AS t3
  FROM raw)
SELECT user_id,
  (CASE WHEN t1 IS NULL THEN 0
        WHEN t2 IS NULL THEN 1
        WHEN t3 IS NULL THEN 2 ELSE 3 END)::INTEGER AS steps_reached,
  t1 IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL AS converted,
  t1 AS t_first,
  coalesce(t3, t2, t1) AS t_last
FROM lim"""
            ).fetchall()
        }
        assert got == want, f"within={within}"
        assert any(v[1] for v in got.values())  # someone converts
