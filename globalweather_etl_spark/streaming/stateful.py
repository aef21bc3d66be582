"""Custom stateful streaming operators.

Where the built-in windowed aggregations (windows.py) don't express the
semantics, applyInPandasWithState gives an Arrow-batched per-key state
machine: state lives in the state store (checkpointed, fault-tolerant),
keys are hash-partitioned so state never concentrates, and each
micro-batch touches only keys present in that batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TOTALS_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_TOTALS_STATE_SCHEMA = "n long, n_vals long, total double"


def _totals_fn(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, n_vals, total) = state.get if state.exists else (0, 0, 0.0)
    for pdf in batches:
        n += int(len(pdf))
        n_vals += int(pdf["value"].count())  # non-null only
        total += float(pdf["value"].sum())  # skipna, 0.0 if all null
    state.update((n, n_vals, total))
    # SQL sum semantics: NULL (not 0.0) when no non-null value was ever
    # seen — matches the batch groupBy().agg(sum) parity target.
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]], dtype="Int64"),
            "n_events": pd.array([n], dtype="Int64"),
            "total_value": pd.array(
                [total if n_vals else None], dtype="Float64"
            ),
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) across the whole stream — emitted
    once per key per micro-batch in update mode. The canonical
    "cumulative metric" shape the built-in windows can't express
    (no window: the aggregate never closes).

    Batch parity: after draining any prefix of the stream, the latest
    row per user equals the batch groupBy("user_id").agg(count, sum)
    over the same prefix (float sums batch-vs-stream may differ by
    accumulation order; totals here add in arrival order)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, within: str | None = None
) -> DataFrame:
    """Exact streaming deduplication on key columns.

    within=None keeps ALL seen keys in state (exact forever, state grows
    with key cardinality); within="1 hour" + an upstream watermark uses
    dropDuplicatesWithinWatermark so state is evicted once duplicates
    can no longer arrive — the 100 TB/endless-stream configuration."""
    keys = keys or ["event_id"]
    if within is None:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(keys)


# ------------------------------------------- rolling anomaly state
#
# Streaming twin of operators/anomaly.py (rolling median/MAD modified
# z-score): per-key state is ONLY the trailing window_rows-1 values —
# bounded however long the stream runs, the applyInPandasWithState
# contract at its best. Events are assumed in (ts, event_id) order per
# key across micro-batches (the file/commit sources here replay in
# order; out-of-order feeds need an upstream watermark+sort stage).
# Values are processed in arrival order inside each batch after a
# (ts, event_id) sort, so any prefix of the stream emits EXACTLY the
# batch operator's rows for that prefix (parity test-pinned).

_ANOM_OUT_SCHEMA = (
    "user_id long, event_id long, value double, roll_med double, "
    "roll_mad double, robust_z double, is_anomaly boolean"
)
_ANOM_STATE_SCHEMA = "vals array<double>"


def _round9_half_up(x: float) -> float:
    """Spark's F.round semantics on doubles (BigDecimal HALF_UP over
    the shortest decimal repr) — Python's round() is half-even and
    would diverge on exact ties."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
    )


def _py_median(svals: list[float]) -> float:
    """operators.anomaly.array_median, mirrored: middle element (odd)
    or mean of the two middles (even)."""
    n = len(svals)
    if n % 2 == 1:
        return svals[(n + 1) // 2 - 1]
    return (svals[n // 2 - 1] + svals[n // 2]) / 2.0


def make_anomaly_fn(window_rows: int = 7, threshold: float = 3.5):
    """The applyInPandasWithState function for streaming_anomalies —
    exposed so tests can drive it directly."""

    def fn(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tail: list[float] = (
            list(state.get[0]) if state.exists else []
        )
        out: dict[str, list] = {
            k: []
            for k in (
                "event_id", "value", "roll_med", "roll_mad",
                "robust_z", "is_anomaly",
            )
        }
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                win = sorted(tail[-(window_rows - 1):] + [v])
                med = _py_median(win)
                mad = _py_median(sorted(abs(x - med) for x in win))
                if mad > 0:
                    z = _round9_half_up(0.6745 * (v - med) / mad)
                    flag = abs(z) > threshold
                else:
                    z = None
                    flag = v != med
                out["event_id"].append(int(eid))
                out["value"].append(v)
                out["roll_med"].append(_round9_half_up(med))
                out["roll_mad"].append(_round9_half_up(mad))
                out["robust_z"].append(z)
                out["is_anomaly"].append(bool(flag))
                tail = (tail + [v])[-(window_rows - 1):]
        state.update((tail,))
        n = len(out["event_id"])
        yield pd.DataFrame(
            {
                "user_id": pd.array([key[0]] * n, dtype="Int64"),
                "event_id": pd.array(out["event_id"], dtype="Int64"),
                "value": pd.array(out["value"], dtype="Float64"),
                "roll_med": pd.array(out["roll_med"], dtype="Float64"),
                "roll_mad": pd.array(out["roll_mad"], dtype="Float64"),
                "robust_z": pd.array(out["robust_z"], dtype="Float64"),
                "is_anomaly": pd.array(
                    out["is_anomaly"], dtype="boolean"
                ),
            }
        )

    return fn


# --------------------------------------- sequential monitor state
#
# Streaming twin of operators/timeseries.py series_monitor for
# UNBOUNDED series: per-key state is SEVEN scalars (n, ewma, cusum
# pos/neg/alarms, holt level/trend) — O(1) forever, the shape the
# batch fold cannot give a single 10^8-row series.  CUSUM needs an
# EXPLICIT target here: the batch default (the series' own mean) is a
# two-pass statistic a stream can never know; fixing the reference is
# also the textbook process-control usage.  Float arithmetic mirrors
# the batch fold step-for-step (same operation order), so any prefix
# of an in-order stream lands on the batch operator's unrounded state
# bit-for-bit; outputs round at 9dp like the batch twin.

_MON_OUT_SCHEMA = (
    "user_id long, n long, ewma double, cusum_pos double, "
    "cusum_neg double, cusum_alarms long, holt_level double, "
    "holt_trend double, holt_forecast double"
)
_MON_STATE_SCHEMA = (
    "n long, ewma double, pos double, neg double, alarms long, "
    "level double, trend double"
)


def make_series_monitor_fn(
    target: float,
    alpha: float = 0.3,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    beta: float = 0.1,
):
    """The applyInPandasWithState function for
    streaming_series_monitor — exposed so tests can drive it."""

    def fn(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, pos, neg, alarms, level, trend = state.get
        else:
            n, s, pos, neg, alarms, level, trend = (
                0, None, 0.0, 0.0, 0, None, 0.0,
            )
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                v = float(v)
                n += 1
                # EWMA / Holt: identical step order to the batch fold
                if s is None:
                    s = v
                    level, trend = v, 0.0
                else:
                    s = alpha * v + (1.0 - alpha) * s
                    new_level = alpha * v + (1.0 - alpha) * (
                        level + trend
                    )
                    trend = (
                        beta * (new_level - level)
                        + (1.0 - beta) * trend
                    )
                    level = new_level
                # CUSUM with alarm reset, explicit target
                cp = max(0.0, pos + v - target - slack_k)
                cn = max(0.0, neg + target - v - slack_k)
                if cp > threshold_h:
                    alarms += 1
                    cp = 0.0
                if cn > threshold_h:
                    alarms += 1
                    cn = 0.0
                pos, neg = cp, cn
        state.update((n, s, pos, neg, alarms, level, trend))
        yield pd.DataFrame(
            {
                "user_id": pd.array([key[0]], dtype="Int64"),
                "n": pd.array([n], dtype="Int64"),
                "ewma": pd.array(
                    [None if s is None else _round9_half_up(s)],
                    dtype="Float64",
                ),
                "cusum_pos": pd.array(
                    [_round9_half_up(pos)], dtype="Float64"
                ),
                "cusum_neg": pd.array(
                    [_round9_half_up(neg)], dtype="Float64"
                ),
                "cusum_alarms": pd.array([alarms], dtype="Int64"),
                "holt_level": pd.array(
                    [None if level is None else _round9_half_up(level)],
                    dtype="Float64",
                ),
                "holt_trend": pd.array(
                    [None if level is None else _round9_half_up(trend)],
                    dtype="Float64",
                ),
                "holt_forecast": pd.array(
                    [
                        None
                        if level is None
                        else _round9_half_up(level + trend)
                    ],
                    dtype="Float64",
                ),
            }
        )

    return fn


def streaming_series_monitor(
    events: DataFrame,
    target: float,
    alpha: float = 0.3,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    beta: float = 0.1,
) -> DataFrame:
    """Running EWMA/CUSUM/Holt per user over an unbounded stream with
    O(1) state per key (update mode: one row per key per touched
    micro-batch).  Batch parity: after draining any in-order prefix,
    the latest row per key equals series_monitor(prefix,
    target=target) on that prefix (test-pinned)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_series_monitor_fn(
            target, alpha, slack_k, threshold_h, beta
        ),
        outputStructType=_MON_OUT_SCHEMA,
        stateStructType=_MON_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------- Holt-Winters state
#
# Streaming twin of operators/timeseries.py holt_winters: per-key
# state is (count, <m warmup values, level, trend, m seasonal
# components) — O(m) forever. Arithmetic mirrors the batch fold step
# for step (left-fold seed mean over the first m values, rotating
# seasonal index), so any in-order prefix lands on the batch
# operator's 9dp outputs bit-for-bit (test-pinned).

_HW_OUT_SCHEMA = (
    "user_id long, n long, hw_level double, hw_trend double, "
    "hw_forecast double"
)
_HW_STATE_SCHEMA = (
    "cnt long, warm array<double>, lvl double, tr double, "
    "seas array<double>"
)


def make_holt_winters_fn(
    m: int = 4,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
):
    """The applyInPandasWithState function for
    streaming_holt_winters — exposed so tests can drive it."""

    def fn(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnt, warm, lvl, tr, seas = state.get
            warm = list(warm or [])
            seas = list(seas or [])
        else:
            cnt, warm, lvl, tr, seas = 0, [], None, 0.0, []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                v = float(v)
                if cnt < m - 1:
                    warm.append(v)
                elif cnt == m - 1:
                    warm.append(v)
                    acc = 0.0
                    for w in warm:  # left fold, like F.aggregate
                        acc = acc + w
                    lvl = acc / float(m)
                    seas = [w - lvl for w in warm]
                    warm = []
                    tr = 0.0
                else:
                    pos = (cnt - m) % m
                    s_old = seas[pos]
                    nl = alpha * (v - s_old) + (1.0 - alpha) * (
                        lvl + tr
                    )
                    ntr = beta * (nl - lvl) + (1.0 - beta) * tr
                    seas[pos] = gamma * (v - nl) + (1.0 - gamma) * s_old
                    lvl, tr = nl, ntr
                cnt += 1
        state.update((cnt, warm, lvl, tr, seas))
        if lvl is None:
            l9 = t9 = f9 = None
        else:
            s_next = seas[(cnt - m) % m]
            l9 = _round9_half_up(lvl)
            t9 = _round9_half_up(tr)
            f9 = _round9_half_up(lvl + tr + s_next)
        yield pd.DataFrame(
            {
                "user_id": pd.array([key[0]], dtype="Int64"),
                "n": pd.array([cnt], dtype="Int64"),
                "hw_level": pd.array([l9], dtype="Float64"),
                "hw_trend": pd.array([t9], dtype="Float64"),
                "hw_forecast": pd.array([f9], dtype="Float64"),
            }
        )

    return fn


def streaming_holt_winters(
    events: DataFrame,
    m: int = 4,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Running Holt-Winters per user over an unbounded stream with
    O(m) state per key (update mode).  Batch parity: after draining
    any in-order prefix, the latest row per key equals
    holt_winters(prefix) on that prefix (test-pinned)."""
    if m < 2:
        raise ValueError("m (season length) must be >= 2")
    return events.groupBy("user_id").applyInPandasWithState(
        make_holt_winters_fn(m, alpha, beta, gamma),
        outputStructType=_HW_OUT_SCHEMA,
        stateStructType=_HW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_anomalies(
    events: DataFrame, window_rows: int = 7, threshold: float = 3.5
) -> DataFrame:
    """Per-event robust anomaly flags over an unbounded stream with
    O(window_rows) state per key — the streaming twin of
    operators.anomaly.rolling_anomalies (append mode: each event's
    row is final the moment it is processed)."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    return events.groupBy("user_id").applyInPandasWithState(
        make_anomaly_fn(window_rows, threshold),
        outputStructType=_ANOM_OUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
