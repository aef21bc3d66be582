"""Event-time window aggregations — batch/stream agnostic.

Each builder takes any events-shaped DataFrame (batch or streaming) and
returns the aggregated DataFrame. Spark's unified model means the same
logical plan runs incrementally under Structured Streaming; for
streaming inputs, apply with_watermark() first so state can be evicted
and append-mode sinks can finalize windows.

Sum aggregates accumulate as decimal then round back to double: float
summation order differs between partial/final aggregation layouts (and
between engines), decimal is order-independent — so batch, streaming,
and the DuckDB oracle all agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Attach an event-time watermark (late-data bound + state eviction
    horizon). No-op semantics on batch DataFrames — Spark ignores
    watermarks outside streaming, so builders stay shared."""
    return df.withWatermark(ts_col, delay)


def _exact_sum(col: str):
    return F.round(F.sum(F.col(col).cast("decimal(25,10)")).cast("double"), 9)


def tumbling_stats(
    events: DataFrame,
    duration: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-(window, key) count + exact value sum over non-overlapping
    event-time windows. Streaming: one state row per open window per
    key; watermark closes windows for append sinks.

    Exactly sliding_stats with slide == duration."""
    return sliding_stats(events, duration, duration, ts_col, key_col)


def sliding_stats(
    events: DataFrame,
    duration: str = "1 day",
    slide: str = "12 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Overlapping sliding windows: each event lands in duration/slide
    windows. Spark expands the window assignment BEFORE the aggregation
    shuffle (map-side), so the cost model is (expansion factor x rows)
    through one two-phase hash aggregate — no self-joins."""
    return (
        events.groupBy(F.window(ts_col, duration, slide), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _exact_sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "total_value",
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key session windows (gap-based): a session is a maximal run
    of events where consecutive gaps are < gap; window end = last event
    + gap. Spark's session_window merges partial sessions in the
    aggregation, which is what makes this incremental under streaming —
    batch engines need the gaps-and-islands rewrite (see the DuckDB
    oracle) instead."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _exact_sum("value").alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
