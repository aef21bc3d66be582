"""Robust rolling anomaly detection (operators/anomaly.py): hand-
computed values, the DuckDB twin (median/mad window aggregates), the
MAD==0 degenerate fallback, and the masking property that motivates
median/MAD over mean/stddev."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from globalweather_etl_spark.operators.anomaly import rolling_anomalies


def _series(spark, values, user="u1"):
    return spark.createDataFrame(
        [
            Row(user_id=user, seq=i, value=float(v))
            for i, v in enumerate(values)
        ]
    )


def test_hand_computed_window3(spark):
    df = rolling_anomalies(
        _series(spark, [1.0, 2.0, 4.0, 10.0]),
        "value", ["seq"], ["user_id"], window_rows=3,
    ).orderBy("seq")
    rows = df.collect()
    # window contents: [1], [1,2], [1,2,4], [2,4,10]
    assert [r["VALUE_ROLL_MED"] for r in rows] == [1.0, 1.5, 2.0, 4.0]
    assert [r["VALUE_ROLL_MAD"] for r in rows] == [0.0, 0.5, 1.0, 2.0]
    # z for the last row: 0.6745 * (10 - 4) / 2 = 2.0235
    assert rows[3]["VALUE_ROBUST_Z"] == pytest.approx(2.0235)
    assert rows[3]["VALUE_IS_ANOMALY"] is False
    # MAD == 0 single-row window: x == med -> not anomalous
    assert rows[0]["VALUE_ROBUST_Z"] is None
    assert rows[0]["VALUE_IS_ANOMALY"] is False


def test_spike_flagged_and_mean_would_mask(spark):
    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 10.8, 9999.0, 10.1]
    rows = (
        rolling_anomalies(
            _series(spark, vals), "value", ["seq"], ["user_id"],
            window_rows=7,
        )
        .orderBy("seq")
        .collect()
    )
    assert rows[6]["VALUE_IS_ANOMALY"] is True  # the spike
    # the row AFTER the spike is normal and must stay unflagged even
    # though the spike sits in its window (median/MAD absorb it; a
    # mean/stddev screen would have a blown-up sigma and, worse, a
    # dragged mean)
    assert rows[7]["VALUE_IS_ANOMALY"] is False


def test_constant_series_fallback(spark):
    rows = (
        rolling_anomalies(
            _series(spark, [5.0] * 5 + [6.0]), "value", ["seq"],
            ["user_id"], window_rows=4,
        )
        .orderBy("seq")
        .collect()
    )
    assert all(r["VALUE_ROLL_MAD"] == 0.0 for r in rows[:5])
    assert all(r["VALUE_IS_ANOMALY"] is False for r in rows[:5])
    # the step lands in a constant window: MAD 0, x != med -> flagged
    assert rows[5]["VALUE_IS_ANOMALY"] is True
    assert rows[5]["VALUE_ROBUST_Z"] is None


def test_duckdb_twin_bit_identical(spark):
    import random

    rng = random.Random(42)
    data = [
        (f"u{i % 5}", i, round(rng.gauss(50.0, 10.0), 6))
        for i in range(400)
    ]
    # salt in some spikes
    data += [(f"u{i % 5}", 400 + i, 500.0 + i) for i in range(10)]
    sdf = spark.createDataFrame(
        [Row(user_id=u, seq=s, value=float(v)) for u, s, v in data]
    )
    got = (
        rolling_anomalies(sdf, "value", ["seq"], ["user_id"],
                          window_rows=7)
        .orderBy("user_id", "seq")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (user_id VARCHAR, seq INT, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)", [list(r) for r in data]
    )
    want = con.execute(
        """
        SELECT user_id, seq,
          round(median(value) OVER w, 9) AS med,
          round(mad(value) OVER w, 9) AS mad,
          CASE WHEN mad(value) OVER w > 0 THEN
            round(0.6745 * (value - median(value) OVER w)
                  / mad(value) OVER w, 9) END AS z,
          CASE WHEN mad(value) OVER w > 0 THEN
            abs(round(0.6745 * (value - median(value) OVER w)
                      / mad(value) OVER w, 9)) > 3.5
          ELSE value <> median(value) OVER w END AS flag
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY seq
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, seq
        """
    ).fetchall()
    assert len(got) == len(want)
    n_flagged = 0
    for g, w in zip(got, want):
        assert (g["user_id"], g["seq"]) == (w[0], w[1])
        assert g["VALUE_ROLL_MED"] == w[2]
        assert g["VALUE_ROLL_MAD"] == w[3]
        assert g["VALUE_ROBUST_Z"] == w[4]
        assert g["VALUE_IS_ANOMALY"] == w[5]
        n_flagged += bool(w[5])
    assert n_flagged >= 10  # the salted spikes are found


def test_validates_window(spark):
    with pytest.raises(ValueError, match="window_rows"):
        rolling_anomalies(
            _series(spark, [1.0]), "value", ["seq"], ["user_id"],
            window_rows=0,
        )
