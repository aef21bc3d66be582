"""Session paths: hand-computed journeys, truncation, top-paths
ranking, and a DuckDB twin over real events."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from globalweather_etl_spark.operators.paths import session_paths, top_paths
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, 1.0)
            for i, (u, m, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_hand_computed_journeys(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "signup"), (1, 5, "click"), (1, 10, "purchase"),
            (1, 120, "click"),           # new session after 110-min gap
            (2, 0, "click"),
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_path"], r["n_path_events"], r["n_event_types"]
        )
        for r in session_paths(ev, gap_seconds=1800).collect()
    }
    assert got == {
        (1, 1): ("signup>click>purchase", 3, 3),
        (1, 2): ("click", 1, 1),
        (2, 1): ("click", 1, 1),
    }


def test_truncation_caps_carried_state(spark):
    ev = _ev(spark, [(1, m, "click") for m in range(12)])
    [r] = session_paths(ev, max_events=4).collect()
    assert r["session_path"] == ">".join(["click"] * 4)
    assert r["n_path_events"] == 4
    assert r["n_event_types"] == 1  # distinct types over the FULL session


def test_top_paths(spark):
    ev = _ev(
        spark,
        [(u, 0, "a") for u in range(5)]
        + [(u, 1, "b") for u in range(5)]      # 5x a>b
        + [(10 + u, 0, "c") for u in range(3)]  # 3x c
        + [(20, 0, "d")],
    )
    p = session_paths(ev)
    got = [
        (r["session_path"], r["n_sessions"], r["share"])
        for r in top_paths(p, k=2).collect()
    ]
    assert got == [("a>b", 5, 5 / 9), ("c", 3, 3 / 9)]


def test_duckdb_twin_on_real_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    got = sorted(
        (r["user_id"], r["session_id"], r["session_path"],
         r["n_path_events"], r["n_event_types"])
        for r in session_paths(ev).collect()
    )
    want = sorted(
        map(
            tuple,
            duckdb.connect().execute(
                f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM read_parquet('{SF_DIR}/events.parquet')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
      ORDER BY ts, event_id) AS rnk
  FROM sessions)
SELECT user_id, CAST(session_id AS BIGINT),
  string_agg(event_type, '>' ORDER BY rnk)
    FILTER (WHERE rnk <= 8) AS session_path,
  CAST(count(*) FILTER (WHERE rnk <= 8) AS BIGINT),
  CAST(count(DISTINCT event_type) AS BIGINT)
FROM ranked GROUP BY user_id, session_id"""
            ).fetchall(),
        )
    )
    assert got == want


def test_errors(spark):
    ev = _ev(spark, [(1, 0, "a")])
    with pytest.raises(ValueError):
        session_paths(ev, max_events=0)
    with pytest.raises(ValueError):
        top_paths(session_paths(ev), k=0)


def test_transitions_hand_computed(spark):
    from globalweather_etl_spark.operators.paths import (
        session_transitions,
        transition_matrix,
    )

    ev = _ev(
        spark,
        [
            (1, 0, "signup"), (1, 5, "click"), (1, 10, "purchase"),
            (1, 120, "click"),           # second session
            (2, 0, "click"),
        ],
    )
    steps = {
        (r["user_id"], r["session_id"], r["src"], r["dst"])
        for r in session_transitions(ev, gap_seconds=1800).collect()
    }
    assert steps == {
        (1, 1, "(start)", "signup"),
        (1, 1, "signup", "click"),
        (1, 1, "click", "purchase"),
        (1, 1, "purchase", "(end)"),
        (1, 2, "(start)", "click"),
        (1, 2, "click", "(end)"),
        (2, 1, "(start)", "click"),
        (2, 1, "click", "(end)"),
    }
    mat = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in transition_matrix(ev, gap_seconds=1800).collect()
    }
    assert mat[("(start)", "signup")] == (1, round(1 / 3, 9))
    assert mat[("(start)", "click")] == (2, round(2 / 3, 9))
    assert mat[("click", "(end)")] == (2, round(2 / 3, 9))


def test_transition_rows_per_session_is_n_plus_1(spark):
    from globalweather_etl_spark.operators.paths import session_transitions

    ev = _ev(spark, [(1, m, "click") for m in range(5)] + [(2, 0, "click")])
    t = session_transitions(ev)
    assert t.count() == 6 + 2  # (5 events + 1) + (1 event + 1)


def test_transition_probabilities_are_row_stochastic(spark):
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.paths import transition_matrix

    events = load_table(spark, SF_DIR, "events")
    mat = transition_matrix(events)
    sums = (
        mat.groupBy("src").agg(F.sum("p").alias("s")).collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-6, r
    # '(end)' is absorbing: never a src; '(start)' never a dst
    assert mat.filter(F.col("src") == "(end)").count() == 0
    assert mat.filter(F.col("dst") == "(start)").count() == 0


def test_transition_matrix_duckdb_twin(spark):
    from globalweather_etl_spark.operators.paths import transition_matrix

    events = load_table(spark, SF_DIR, "events")
    got = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in transition_matrix(events).collect()
    }
    con = duckdb.connect()
    # DuckDB reads the TIMESTAMP(NANOS) column natively; ordering and
    # 30-minute gap comparisons are value-identical to load_table's
    # exact nanos->micros repair on the Spark side.
    con.execute(
        f"CREATE VIEW events AS SELECT event_id, user_id, event_type, ts"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
trans AS (
  SELECT coalesce(lag(event_type) OVER sw, '(start)') AS src,
         event_type AS dst
  FROM sessions
  WINDOW sw AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
  UNION ALL
  SELECT event_type, '(end)' FROM sessions
  QUALIFY row_number() OVER (PARTITION BY user_id, session_id
                             ORDER BY ts DESC, event_id DESC) = 1)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
  round(count(*) / sum(count(*)) OVER (PARTITION BY src), 9) AS p
FROM trans GROUP BY src, dst"""
        ).fetchall()
    }
    assert got == want and len(got) > 3


def test_cooccurrence_hand_computed(spark):
    from globalweather_etl_spark.operators.paths import cooccurrence

    ev = _ev(
        spark,
        [
            # session 1 (user 1): {signup, click}
            (1, 0, "signup"), (1, 5, "click"), (1, 6, "click"),
            # session 2 (user 1): {click, purchase}
            (1, 120, "click"), (1, 125, "purchase"),
            # session 3 (user 2): {click}
            (2, 0, "click"),
        ],
    )
    got = {
        (r["type_a"], r["type_b"]): (r["n_both"], r["support"], r["lift"])
        for r in cooccurrence(ev, gap_seconds=1800).collect()
    }
    # 3 sessions; click in all 3, signup in 1, purchase in 1
    assert got[("click", "signup")] == (1, round(1 / 3, 9),
                                        round((1 / 3) / ((3 / 3) * (1 / 3)), 9))
    assert got[("click", "purchase")][0] == 1
    assert ("purchase", "signup") not in got  # never co-occur
    # click+anything lift == 1.0: click is in every session
    assert got[("click", "signup")][2] == 1.0


def test_cooccurrence_duckdb_twin(spark):
    from globalweather_etl_spark.operators.paths import cooccurrence

    events = load_table(spark, SF_DIR, "events")
    got = {
        (r["type_a"], r["type_b"]): (r["n_both"], r["support"], r["lift"])
        for r in cooccurrence(events).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT event_id, user_id, event_type, ts"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    rows = con.execute(
        """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
st AS (SELECT DISTINCT user_id, session_id, event_type FROM sessions),
n AS (SELECT CAST(count(DISTINCT (user_id, session_id)) AS DOUBLE) AS ns
      FROM sessions),
singles AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, n_both,
  round(n_both / ns, 9) AS support,
  round((n_both / ns) / ((sa.n_t / ns) * (sb.n_t / ns)), 9) AS lift
FROM pairs, n
JOIN singles sa ON sa.event_type = pairs.type_a
JOIN singles sb ON sb.event_type = pairs.type_b"""
    ).fetchall()
    want = {(r[0], r[1]): (r[2], r[3], r[4]) for r in rows}
    assert got == want and len(got) >= 3


def test_session_rollup_matches_composed_operators(spark):
    """session_rollup's one-aggregate fusion must be column-for-column
    equal to composing session_paths + session_transitions + the
    ordinal groupBy over real events — the contract that lets the
    graded session slot run ONE sessionize instead of three."""
    import pyspark.sql.functions as F

    from globalweather_etl_spark.operators.paths import (
        session_rollup,
        session_transitions,
    )

    ev = load_table(spark, SF_DIR, "events")
    roll = {
        (r["user_id"], r["session_id"]): (
            r["session_start"],
            r["session_path"],
            r["n_path_events"],
            r["n_event_types"],
            r["n_distinct_transitions"],
        )
        for r in session_rollup(ev).collect()
    }
    paths = {
        (r["user_id"], r["session_id"]): (
            r["session_path"], r["n_path_events"], r["n_event_types"]
        )
        for r in session_paths(ev).collect()
    }
    trans = {
        (r["user_id"], r["session_id"]): r["n"]
        for r in session_transitions(ev)
        .groupBy("user_id", "session_id")
        .agg(F.count_distinct("src", "dst").cast("long").alias("n"))
        .collect()
    }
    from globalweather_etl_spark.operators.sessionize import sessionize

    starts = {
        (r["user_id"], r["session_id"]): r["s"]
        for r in sessionize(ev, "user_id", "ts", 1800.0)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"))
        .collect()
    }
    assert set(roll) == set(paths) == set(trans) == set(starts)
    for k, (s0, p, np_, nt, ndt) in roll.items():
        assert s0 == starts[k], k
        assert (p, np_, nt) == paths[k], k
        assert ndt == trans[k], k
