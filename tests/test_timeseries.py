"""EWMA + CUSUM series monitoring (operators/timeseries.py): hand-
computed folds, the bit-identical DuckDB list_reduce twin (zero-state
prepended as the fold seed), and alarm/reset behavior on a drifting
series."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from globalweather_etl_spark.operators.timeseries import series_monitor


def _df(spark, series: dict[str, list[float]]):
    rows = [
        Row(user_id=u, seq=i, value=float(v))
        for u, vs in series.items()
        for i, v in enumerate(vs)
    ]
    return spark.createDataFrame(rows)


def test_ewma_hand_computed(spark):
    out = series_monitor(
        _df(spark, {"u": [10.0, 20.0, 30.0]}),
        "value", ["seq"], ["user_id"], alpha=0.5,
    ).collect()[0]
    # s = 10 -> 0.5*20+0.5*10 = 15 -> 0.5*30+0.5*15 = 22.5
    assert out["ewma"] == 22.5
    assert out["n"] == 3
    assert out["mean"] == 20.0


def test_cusum_drift_alarms_and_resets(spark):
    # mean ~ 0 for the flat prefix; the +3 drift accumulates past
    # h=5 (k=0.5), alarms, resets, accumulates again
    vals = [0.0, 0.0, 0.0, 0.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0]
    out = series_monitor(
        _df(spark, {"u": vals}), "value", ["seq"], ["user_id"],
        slack_k=0.5, threshold_h=5.0,
    ).collect()[0]
    assert out["cusum_alarms"] >= 1
    # a flat series never alarms
    flat = series_monitor(
        _df(spark, {"u": [7.0] * 12}), "value", ["seq"], ["user_id"],
    ).collect()[0]
    assert flat["cusum_alarms"] == 0
    assert flat["cusum_pos"] == 0.0 and flat["cusum_neg"] == 0.0
    assert flat["ewma"] == 7.0


def test_duckdb_twin_bit_identical(spark):
    import random

    rng = random.Random(11)
    series = {
        f"u{i}": [
            round(rng.gauss(20.0, 5.0), 6)
            for _ in range(rng.randint(3, 60))
        ]
        for i in range(12)
    }
    # salt drift into a few series
    for i in (2, 5):
        series[f"u{i}"] = series[f"u{i}"] + [
            40.0 + j for j in range(10)
        ]
    got = {
        r["user_id"]: r
        for r in series_monitor(
            _df(spark, series), "value", ["seq"], ["user_id"],
            alpha=0.3, slack_k=0.5, threshold_h=5.0,
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (user_id VARCHAR, seq INT, value DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [
            [u, i, v]
            for u, vs in series.items()
            for i, v in enumerate(vs)
        ],
    )
    want = con.execute(
        """
        WITH g AS (
          SELECT user_id, count(*) AS n,
            CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE)
              / count(*) AS mean_raw,
            list(value ORDER BY seq) AS vals
          FROM t GROUP BY user_id),
        f AS (
          SELECT user_id, n, mean_raw,
            list_reduce(vals,
              (s, v) -> 0.3 * v + (1.0 - 0.3) * s) AS ewma_raw,
            list_reduce(
              -- three DuckDB lambda gotchas engineered around here:
              -- (1) a bare 0.0 literal is DECIMAL(2,1) and would
              -- coerce the whole state struct (silent per-step
              -- rounding), so every zero is CAST AS DOUBLE;
              -- (2) list_reduce updates the accumulator struct
              -- FIELD BY FIELD in declaration order, so a later
              -- field reads earlier fields' NEW values — 'alarms'
              -- must be declared FIRST, before the pos/neg resets
              -- overwrite the state it inspects;
              -- (3) an outer-column capture inside a list_reduce
              -- lambda mis-binds across rows under grouped
              -- vectorized execution, so the per-series mean rides
              -- INSIDE the elements ('mm') — list_transform
              -- captures are fine and build the carriers
              list_prepend(
                {'alarms': 0, 'pos': CAST(0.0 AS DOUBLE),
                 'neg': CAST(0.0 AS DOUBLE), 'mm': mean_raw},
                list_transform(vals,
                  v -> {'alarms': 0, 'pos': v,
                        'neg': CAST(0.0 AS DOUBLE),
                        'mm': mean_raw})),
              (s, e) -> {
                'alarms': s.alarms
                  + CASE WHEN greatest(CAST(0.0 AS DOUBLE),
                      s.pos + e.pos - e.mm - 0.5) > 5.0
                    THEN 1 ELSE 0 END
                  + CASE WHEN greatest(CAST(0.0 AS DOUBLE),
                      s.neg + e.mm - e.pos - 0.5) > 5.0
                    THEN 1 ELSE 0 END,
                'pos': CASE WHEN greatest(CAST(0.0 AS DOUBLE),
                         s.pos + e.pos - e.mm - 0.5) > 5.0
                       THEN CAST(0.0 AS DOUBLE)
                       ELSE greatest(CAST(0.0 AS DOUBLE),
                         s.pos + e.pos - e.mm - 0.5) END,
                'neg': CASE WHEN greatest(CAST(0.0 AS DOUBLE),
                         s.neg + e.mm - e.pos - 0.5) > 5.0
                       THEN CAST(0.0 AS DOUBLE)
                       ELSE greatest(CAST(0.0 AS DOUBLE),
                         s.neg + e.mm - e.pos - 0.5) END,
                'mm': e.mm}) AS cus
          FROM g)
        SELECT user_id, n, round(mean_raw, 9) AS mean,
          round(ewma_raw, 9) AS ewma,
          round(cus.pos, 9) AS cusum_pos,
          round(cus.neg, 9) AS cusum_neg,
          CAST(cus.alarms AS BIGINT) AS cusum_alarms
        FROM f
        """
    ).fetchall()
    assert len(want) == len(got)
    drifted_alarms = 0
    for u, n, mean, ewma, cp, cn, al in want:
        g = got[u]
        assert g["n"] == n
        assert g["mean"] == mean
        assert g["ewma"] == ewma
        assert g["cusum_pos"] == cp
        assert g["cusum_neg"] == cn
        assert g["cusum_alarms"] == al
        if u in ("u2", "u5"):
            drifted_alarms += al
    assert drifted_alarms >= 2  # the salted drifts are detected


def test_holt_hand_computed(spark):
    """alpha=0.5, beta=0.5 over [10, 20, 30]:
    seed (10, 0); step2: l=0.5*20+0.5*10=15, t=0.5*5+0.5*0=2.5;
    step3: l=0.5*30+0.5*17.5=23.75, t=0.5*8.75+0.5*2.5=5.625."""
    out = series_monitor(
        _df(spark, {"u": [10.0, 20.0, 30.0]}),
        "value", ["seq"], ["user_id"], alpha=0.5, beta=0.5,
    ).collect()[0]
    assert out["holt_level"] == 23.75
    assert out["holt_trend"] == 5.625
    assert out["holt_forecast"] == 29.375
    # a clean linear ramp converges to trend ~ slope, forecast ahead
    ramp = series_monitor(
        _df(spark, {"u": [float(i) for i in range(60)]}),
        "value", ["seq"], ["user_id"], alpha=0.5, beta=0.5,
    ).collect()[0]
    assert ramp["holt_trend"] == pytest.approx(1.0, abs=1e-6)
    assert ramp["holt_forecast"] == pytest.approx(60.0, abs=1e-3)


def test_holt_duckdb_recursive_twin(spark):
    """The graded-oracle shape: a recursive CTE advancing every
    series one step per iteration reproduces the Spark fold
    bit-for-bit (constants CAST to DOUBLE — bare literals are
    DECIMAL in DuckDB)."""
    import random

    rng = random.Random(3)
    series = {
        f"u{i}": [
            round(rng.gauss(10.0, 3.0) + 0.2 * j, 6)
            for j in range(rng.randint(2, 40))
        ]
        for i in range(8)
    }
    got = {
        r["user_id"]: r
        for r in series_monitor(
            _df(spark, series), "value", ["seq"], ["user_id"],
            alpha=0.3, beta=0.1,
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (user_id VARCHAR, seq INT, value DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [[u, i, v] for u, vs in series.items() for i, v in enumerate(vs)],
    )
    want = con.execute(
        """
        WITH RECURSIVE e AS (
          SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY seq)
              AS rn
          FROM t),
        nn AS (SELECT user_id, count(*) AS n FROM t GROUP BY user_id),
        rec AS (
          SELECT user_id, 0 AS rn, CAST(NULL AS DOUBLE) AS l,
                 CAST(0.0 AS DOUBLE) AS tr
          FROM nn
          UNION ALL
          SELECT r.user_id, r.rn + 1,
            CASE WHEN r.l IS NULL THEN e.value
              ELSE CAST(0.3 AS DOUBLE) * e.value
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                   * (r.l + r.tr) END,
            CASE WHEN r.l IS NULL THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(0.1 AS DOUBLE)
                 * ((CAST(0.3 AS DOUBLE) * e.value
                    + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                      * (r.l + r.tr)) - r.l)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE))
                   * r.tr END
          FROM rec r
          JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT r.user_id, round(r.l, 9), round(r.tr, 9),
               round(r.l + r.tr, 9)
        FROM rec r JOIN nn ON nn.user_id = r.user_id AND r.rn = nn.n
        """
    ).fetchall()
    assert len(want) == len(got)
    for u, l, tr, fc in want:
        g = got[u]
        assert g["holt_level"] == l
        assert g["holt_trend"] == tr
        assert g["holt_forecast"] == fc


def test_max_series_rows_guard_raises_loudly(spark):
    from py4j.protocol import Py4JJavaError

    df = _df(spark, {"u": [float(i) for i in range(10)]})
    with pytest.raises(Exception) as ei:
        series_monitor(
            df, "value", ["seq"], ["user_id"], max_series_rows=5
        ).collect()
    assert "max_series_rows" in str(ei.value)
    # at the limit it still runs
    out = series_monitor(
        df, "value", ["seq"], ["user_id"], max_series_rows=10
    ).collect()
    assert out[0]["n"] == 10


def test_explicit_cusum_target(spark):
    # with target fixed at 0, a +3 drift alarms immediately while the
    # mean-target form needs the drift to clear the series' own mean
    vals = [3.0] * 6
    out = series_monitor(
        _df(spark, {"u": vals}), "value", ["seq"], ["user_id"],
        target=0.0, slack_k=0.5, threshold_h=5.0,
    ).collect()[0]
    assert out["cusum_alarms"] >= 1
    # mean-target on the same flat series never alarms
    base = series_monitor(
        _df(spark, {"u": vals}), "value", ["seq"], ["user_id"],
        slack_k=0.5, threshold_h=5.0,
    ).collect()[0]
    assert base["cusum_alarms"] == 0
    # mean is still reported either way
    assert out["mean"] == base["mean"] == 3.0


def test_series_monitor_big_parity(spark):
    """Segmented two-level fold == sequential fold to 1e-9 (the maps
    compose exactly in real arithmetic; float disagreement decays —
    contraction)."""
    import random

    from globalweather_etl_spark.operators.timeseries import (
        series_monitor_big,
    )

    rng = random.Random(23)
    series = {
        f"u{i}": [
            round(rng.gauss(50.0, 10.0), 6)
            for _ in range(rng.randint(1, 80))
        ]
        for i in range(12)
    }
    df = _df(spark, series)
    base = {
        r["user_id"]: r
        for r in series_monitor(
            df, "value", ["seq"], ["user_id"], alpha=0.3, beta=0.1
        ).collect()
    }
    # segment_rows=7 forces many segments per series
    big = {
        r["user_id"]: r
        for r in series_monitor_big(
            df, "value", ["seq"], ["user_id"], alpha=0.3, beta=0.1,
            segment_rows=7,
        ).collect()
    }
    assert set(base) == set(big)
    for u in base:
        assert big[u]["n"] == base[u]["n"]
        assert big[u]["mean"] == base[u]["mean"]
        for c in ("ewma", "holt_level", "holt_trend", "holt_forecast"):
            assert big[u][c] == pytest.approx(base[u][c], abs=2e-9), (
                u, c, big[u][c], base[u][c],
            )


def test_series_monitor_big_single_exchange(spark):
    """Three exchanges, each bounded: window hash(key), the explicit
    (key, segment) spread (the memory-bound guarantee), and the final
    partials-only groupBy(key)."""
    from globalweather_etl_spark.operators.timeseries import (
        series_monitor_big,
    )

    df = _df(spark, {"u": [1.0, 2.0, 3.0], "v": [4.0, 5.0]})
    plan = (
        series_monitor_big(df, "value", ["seq"], ["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 3, plan
    assert "hashpartitioning" in plan.lower(), plan


def test_streaming_series_monitor_fn_parity(spark):
    """Driving the stateful function across 3 'micro-batches' lands on
    the batch operator's result for the same prefix, bit-for-bit at
    the 9dp output rounding."""
    import pandas as pd

    from globalweather_etl_spark.streaming.stateful import (
        make_series_monitor_fn,
    )

    vals = [3.0, 7.5, 1.25, 9.0, 2.0, 8.0, 0.5, 6.0, 4.0, 10.0]
    batch = series_monitor(
        _df(spark, {"u": vals}), "value", ["seq"], ["user_id"],
        target=5.0, slack_k=0.5, threshold_h=4.0,
    ).collect()[0]

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.get = v
            self.exists = True

    fn = make_series_monitor_fn(
        target=5.0, slack_k=0.5, threshold_h=4.0
    )
    st = FakeState()
    out = None
    for lo, hi in ((0, 3), (3, 7), (7, 10)):
        pdf = pd.DataFrame(
            {
                "ts": range(lo, hi),
                "event_id": range(lo, hi),
                "value": vals[lo:hi],
            }
        )
        out = list(fn((1,), [pdf], st))[-1]
    row = out.iloc[0]
    assert int(row["n"]) == batch["n"]
    assert float(row["ewma"]) == batch["ewma"]
    assert float(row["cusum_pos"]) == batch["cusum_pos"]
    assert float(row["cusum_neg"]) == batch["cusum_neg"]
    assert int(row["cusum_alarms"]) == batch["cusum_alarms"]
    assert float(row["holt_level"]) == batch["holt_level"]
    assert float(row["holt_trend"]) == batch["holt_trend"]
    assert float(row["holt_forecast"]) == batch["holt_forecast"]


def test_holt_winters_hand_computed(spark):
    """Fold == the Python reference recursion, including the
    left-fold seed mean and the rotating seasonal index."""
    from globalweather_etl_spark.operators.timeseries import (
        holt_winters,
    )

    vals = [10.0, 14.0, 8.0, 12.0, 11.0, 15.5, 7.25, 13.0, 12.5]
    df = _df(spark, {"u": vals})
    row = holt_winters(
        df, "value", ["seq"], ["user_id"],
        m=4, alpha=0.3, beta=0.1, gamma=0.2,
    ).collect()[0]
    m, a, b, g = 4, 0.3, 0.1, 0.2
    acc = 0.0
    for v in vals[:m]:
        acc = acc + v
    lvl, tr = acc / 4.0, 0.0
    seas = [vals[i] - lvl for i in range(m)]
    for t in range(m, len(vals)):
        pos = (t - m) % m
        so = seas[pos]
        nl = a * (vals[t] - so) + (1 - a) * (lvl + tr)
        seas[pos] = g * (vals[t] - nl) + (1 - g) * so
        tr = b * (nl - lvl) + (1 - b) * tr
        lvl = nl
    pn = (len(vals) - m) % m
    assert row["hw_level"] == round(lvl, 9)
    assert row["hw_trend"] == round(tr, 9)
    assert row["hw_season_next"] == round(seas[pn], 9)
    assert row["hw_forecast"] == round(lvl + tr + seas[pn], 9)
    assert row["n"] == len(vals)


def test_holt_winters_short_series_and_seasonal_recovery(spark):
    from globalweather_etl_spark.operators.timeseries import (
        holt_winters,
    )

    # shorter than m -> NULL level/forecast, n still reported
    short = holt_winters(
        _df(spark, {"u": [5.0, 6.0, 7.0]}), "value", ["seq"],
        ["user_id"], m=4,
    ).collect()[0]
    assert short["n"] == 3 and short["hw_level"] is None
    assert short["hw_forecast"] is None
    # a pure period-4 signal: trend ~ 0, forecast tracks the cycle
    cyc = [10.0, 20.0, 30.0, 40.0] * 8
    row = holt_winters(
        _df(spark, {"u": cyc}), "value", ["seq"], ["user_id"],
        m=4, alpha=0.3, beta=0.1, gamma=0.2,
    ).collect()[0]
    assert abs(row["hw_trend"]) < 1e-9
    # next value in the cycle is 10 (position 0)
    assert abs(row["hw_forecast"] - 10.0) < 1e-6


def test_streaming_holt_winters_fn_parity(spark):
    """Driving the stateful HW function across micro-batches lands on
    the batch fold's 9dp outputs bit-for-bit for each prefix that
    crosses the seed boundary."""
    import pandas as pd

    from globalweather_etl_spark.operators.timeseries import (
        holt_winters,
    )
    from globalweather_etl_spark.streaming.stateful import (
        make_holt_winters_fn,
    )

    vals = [10.0, 14.0, 8.0, 12.0, 11.0, 15.5, 7.25, 13.0, 12.5, 9.0]

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.get = v
            self.exists = True

    fn = make_holt_winters_fn(m=4, alpha=0.3, beta=0.1, gamma=0.2)
    st = FakeState()
    cuts = [(0, 2), (2, 5), (5, 7), (7, 10)]
    for lo, hi in cuts:
        pdf = pd.DataFrame(
            {"ts": range(lo, hi), "event_id": range(lo, hi),
             "value": vals[lo:hi]}
        )
        out = list(fn((1,), [pdf], st))[-1].iloc[0]
        batch = holt_winters(
            _df(spark, {"u": vals[:hi]}), "value", ["seq"],
            ["user_id"], m=4, alpha=0.3, beta=0.1, gamma=0.2,
        ).collect()[0]
        assert int(out["n"]) == batch["n"] == hi
        if batch["hw_level"] is None:
            assert pd.isna(out["hw_level"])
        else:
            assert float(out["hw_level"]) == batch["hw_level"], hi
            assert float(out["hw_trend"]) == batch["hw_trend"], hi
            assert float(out["hw_forecast"]) == batch["hw_forecast"], hi


# ------------------- clamped CUSUM, unbounded batch path (round 12)


def _py_cusum_clamped(vals, target, k, h):
    """Sequential reference: the textbook clamp, NO alarm reset."""
    cp = cn = 0.0
    exc = 0
    for v in vals:
        cp = max(0.0, cp + v - target - k)
        cn = max(0.0, cn + target - v - k)
        exc += (1 if cp > h else 0) + (1 if cn > h else 0)
    return cp, cn, exc


def test_cusum_clamped_vs_sequential_reference(spark):
    """The prefix-sum identity equals the sequential clamped fold —
    exactly in decimal arithmetic, to float tolerance in double."""
    import random

    from pyspark.sql import Row

    from globalweather_etl_spark.operators.timeseries import (
        cusum_clamped,
    )

    rng = random.Random(23)
    rows = []
    series = {}
    for u in range(6):
        vals = [round(rng.uniform(40, 80), 3) for _ in range(50)]
        series[u] = vals
        rows += [
            Row(user_id=u, ts=i, event_id=i, value=float(v))
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows)
    for cast_to in ("double", "decimal(25,6)"):
        got = {
            r["user_id"]: r
            for r in cusum_clamped(
                df, "value", ["ts", "event_id"], ["user_id"],
                target=60.0, slack_k=0.5, threshold_h=5.0,
                cast_to=cast_to,
            ).collect()
        }
        assert len(got) == 6
        for u, vals in series.items():
            cp, cn, exc = _py_cusum_clamped(vals, 60.0, 0.5, 5.0)
            g = got[u]
            assert g["n"] == 50
            assert float(g["cusum_pos"]) == pytest.approx(cp, abs=1e-9)
            assert float(g["cusum_neg"]) == pytest.approx(cn, abs=1e-9)
            assert g["exceedances"] == exc, (u, cast_to)


def test_cusum_clamped_mean_target_and_guards(spark):
    from pyspark.sql import Row

    from globalweather_etl_spark.operators.timeseries import (
        cusum_clamped,
    )

    df = spark.createDataFrame(
        [Row(user_id=0, ts=i, event_id=i, value=float(v))
         for i, v in enumerate([1.0, 2.0, 3.0, 10.0])]
    )
    # target=None -> per-key DECIMAL-exact mean (4.0 here)
    r = cusum_clamped(
        df, "value", ["ts", "event_id"], ["user_id"],
        slack_k=0.0, threshold_h=100.0,
    ).collect()[0]
    cp, cn, exc = _py_cusum_clamped([1.0, 2.0, 3.0, 10.0], 4.0, 0.0, 100.0)
    assert float(r["cusum_pos"]) == pytest.approx(cp, abs=1e-9)
    assert float(r["cusum_neg"]) == pytest.approx(cn, abs=1e-9)
    # decimal domain demands an explicit target
    with pytest.raises(ValueError, match="explicit target"):
        cusum_clamped(
            df, "value", ["ts", "event_id"], ["user_id"],
            cast_to="decimal(25,6)",
        )


def test_cusum_clamped_plan_is_windowed_not_buffered(spark):
    """The scale contract: no collect_list / per-series array buffers
    — two window passes and an aggregate."""
    from pyspark.sql import Row

    from globalweather_etl_spark.operators.timeseries import (
        cusum_clamped,
    )

    df = spark.createDataFrame(
        [Row(user_id=0, ts=0, event_id=0, value=1.0)]
    )
    plan = (
        cusum_clamped(
            df, "value", ["ts", "event_id"], ["user_id"], target=0.0
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "collect_list" not in plan
    assert "Window" in plan
