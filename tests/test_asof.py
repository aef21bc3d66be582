"""asof_join edge semantics: inclusive ties, no-match NULLs, per-key
isolation — pinned explicitly (the DuckDB oracle covers the bulk)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(9)),    # before any right row -> NULL
            (2, "u1", _ts(10)),   # exact tie with right at 10:00 -> matches it
            (3, "u1", _ts(11)),   # between 10:00 and 12:00 -> 10:00
            (4, "u1", _ts(13)),   # after 12:00 -> 12:00
            (5, "u2", _ts(12)),   # other key: only u2's rows visible
        ],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), 100.0),
            ("u1", _ts(12), 120.0),
            ("u2", _ts(11), 999.0),
        ],
        "k string, rt timestamp, v double",
    )
    out = asof_join(left, right, ["k"], "t", "rt", ["rt", "v"])
    return {r["id"]: r for r in out.collect()}


def test_no_preceding_row_gives_null(joined):
    assert joined[1]["v"] is None and joined[1]["rt"] is None


def test_equal_timestamps_match_inclusively(joined):
    assert joined[2]["v"] == 100.0


def test_latest_preceding_wins(joined):
    assert joined[3]["v"] == 100.0
    assert joined[4]["v"] == 120.0 and joined[4]["rt"] == _ts(12)


def test_keys_are_isolated(joined):
    assert joined[5]["v"] == 999.0
    assert len(joined) == 5  # every left row exactly once


def test_null_value_in_matched_row_is_not_torn(spark):
    """The matched right row travels as a unit: a NULL value in the
    latest preceding row must surface as NULL, never spliced with an
    older row's value (regression: per-column carry-forward)."""
    left = spark.createDataFrame(
        [(1, "u", _ts(13))], "id long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 5.0), ("u", _ts(12), None)],
        "k string, rt timestamp, v double",
    )
    row = asof_join(left, right, ["k"], "t", "rt", ["rt", "v"]).collect()[0]
    assert row["rt"] == _ts(12)
    assert row["v"] is None


def _mk(spark):
    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 25.0, 2), ("a", 40.0, 3), ("b", 5.0, 4)],
        "k string, t double, lid long",
    )
    right = spark.createDataFrame(
        [("a", 8.0, "r8"), ("a", 30.0, "r30"), ("b", 50.0, "r50")],
        "k string, t double, v string",
    )
    return left, right


def _match(df):
    return {r["lid"]: r["v"] for r in df.collect()}


def test_asof_forward_hand_computed(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, ["k"], "t", "t", ["v"], direction="forward"
    )
    # lid1 t=10 -> next right at 30; lid2 t=25 -> 30; lid3 t=40 -> none;
    # lid4 (b) t=5 -> 50
    assert _match(out) == {1: "r30", 2: "r30", 3: None, 4: "r50"}


def test_asof_forward_inclusive_tie(spark):
    left = spark.createDataFrame([("a", 30.0, 1)], "k string, t double, lid long")
    right = spark.createDataFrame([("a", 30.0, "rx")], "k string, t double, v string")
    out = asof_join(left, right, ["k"], "t", "t", ["v"], direction="forward")
    assert _match(out) == {1: "rx"}


def test_asof_nearest_hand_computed(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, ["k"], "t", "t", ["v"], direction="nearest"
    )
    # lid1 t=10: back r8 (d2) vs fwd r30 (d20) -> r8
    # lid2 t=25: back r8 (d17) vs fwd r30 (d5) -> r30
    # lid3 t=40: back r30 (d10), no fwd -> r30
    # lid4 t=5:  no back, fwd r50 (d45) -> r50
    assert _match(out) == {1: "r8", 2: "r30", 3: "r30", 4: "r50"}


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([("a", 20.0, 1)], "k string, t double, lid long")
    right = spark.createDataFrame(
        [("a", 10.0, "back"), ("a", 30.0, "fwd")], "k string, t double, v string"
    )
    out = asof_join(left, right, ["k"], "t", "t", ["v"], direction="nearest")
    assert _match(out) == {1: "back"}


def test_asof_tolerance(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, ["k"], "t", "t", ["v"],
        direction="backward", tolerance=3.0,
    )
    # lid1 t=10 back r8 d=2 <=3 keep; lid2 t=25 back r8 d=17 drop;
    # lid3 t=40 back r30 d=10 drop; lid4 no back -> None
    assert _match(out) == {1: "r8", 2: None, 3: None, 4: None}
    near = asof_join(
        left, right, ["k"], "t", "t", ["v"],
        direction="nearest", tolerance=5.0,
    )
    # lid2 nearest is r30 d=5 <=5 keep; lid1 r8 d=2 keep; others drop
    assert _match(near) == {1: "r8", 2: "r30", 3: None, 4: None}


def test_asof_forward_matches_duckdb(spark):
    """Forward as-of on the real events/users data must equal DuckDB's
    windowed min-over-following construction."""
    import duckdb

    from globalweather_etl_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("t")
    )
    # synthetic right side: each user's first event of each type-ish
    # slice; reuse events sampled down as the quote stream
    quotes = events.filter(F.col("event_id") % 5 == 0).select(
        "user_id", "t", F.col("event_id").alias("qid")
    )
    got = {
        r["event_id"]: r["qid"]
        for r in asof_join(
            events, quotes, ["user_id"], "t", "t", ["qid"],
            direction="forward",
        ).collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(f"""
WITH e AS (SELECT event_id, user_id, epoch(ts) AS t
           FROM read_parquet('{sf}/events.parquet')),
q AS (SELECT user_id, epoch(ts) AS t, event_id AS qid
      FROM read_parquet('{sf}/events.parquet') WHERE event_id % 5 = 0)
SELECT e.event_id,
  (SELECT q.qid FROM q
   WHERE q.user_id = e.user_id AND q.t >= e.t
   ORDER BY q.t, q.qid DESC LIMIT 1) AS qid
FROM e""").fetchall()
    }
    assert got == want


def test_asof_nearest_matches_duckdb(spark):
    """Nearest as-of on real events vs an explicit two-candidate DuckDB
    construction (closer side wins, ties -> backward, same
    greatest-struct pick within equal right times)."""
    import duckdb

    from globalweather_etl_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("t")
    )
    quotes = events.filter(F.col("event_id") % 5 == 0).select(
        "user_id", "t", F.col("event_id").alias("qid")
    )
    got = {
        r["event_id"]: r["qid"]
        for r in asof_join(
            events, quotes, ["user_id"], "t", "t", ["qid"],
            direction="nearest",
        ).collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(f"""
WITH e AS (SELECT event_id, user_id, epoch(ts) AS t
           FROM read_parquet('{sf}/events.parquet')),
q AS (SELECT user_id, epoch(ts) AS t, event_id AS qid
      FROM read_parquet('{sf}/events.parquet') WHERE event_id % 5 = 0),
cand AS (
  SELECT e.event_id,
    (SELECT q.qid FROM q WHERE q.user_id = e.user_id AND q.t <= e.t
     ORDER BY q.t DESC, q.qid DESC LIMIT 1) AS back_q,
    (SELECT q.t FROM q WHERE q.user_id = e.user_id AND q.t <= e.t
     ORDER BY q.t DESC, q.qid DESC LIMIT 1) AS back_t,
    (SELECT q.qid FROM q WHERE q.user_id = e.user_id AND q.t >= e.t
     ORDER BY q.t ASC, q.qid DESC LIMIT 1) AS fwd_q,
    (SELECT q.t FROM q WHERE q.user_id = e.user_id AND q.t >= e.t
     ORDER BY q.t ASC, q.qid DESC LIMIT 1) AS fwd_t,
    e.t
  FROM e)
SELECT event_id,
  CASE WHEN fwd_q IS NULL THEN back_q
       WHEN back_q IS NULL THEN fwd_q
       WHEN (t - back_t) <= (fwd_t - t) THEN back_q
       ELSE fwd_q END
FROM cand""").fetchall()
    }
    assert got == want


def test_directions_matches_three_separate_joins(spark):
    """asof_join_directions must equal three asof_join calls
    column-for-column, including tolerance semantics."""
    from globalweather_etl_spark.operators.asof import asof_join_directions
    from globalweather_etl_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("t")
    )
    quotes = events.filter(F.col("event_id") % 5 == 0).select(
        "user_id", "t", F.col("event_id").alias("qid")
    )
    for tol in (None, 3600.0):
        combo = {
            r["event_id"]: (r["qid"], r["next_qid"], r["nearest_qid"])
            for r in asof_join_directions(
                events, quotes, ["user_id"], "t", "t", ["qid"],
                prefixes=("", "next_", "nearest_"), tolerance=tol,
            ).collect()
        }
        singles = {}
        for i, d in enumerate(("backward", "forward", "nearest")):
            for r in asof_join(
                events, quotes, ["user_id"], "t", "t", ["qid"],
                direction=d, tolerance=tol,
            ).collect():
                singles.setdefault(r["event_id"], [None, None, None])[i] = r["qid"]
        assert combo == {k: tuple(v) for k, v in singles.items()}, f"tol={tol}"
