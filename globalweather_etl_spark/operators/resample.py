"""Time-series resampling: regularize irregular observations onto a
fixed-interval grid with forward fill (last observation carried
forward) — the standard prep step before joining sensor/weather series
against calendar-aligned facts.

Composition, not custom code: the per-key grid comes from
sequence()+explode (scan-stage, no shuffle), and the fill is the
as-of join operator — one shuffle on the key total. Mirrors exactly in
the oracle as generate_series + DuckDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.asof import asof_join


def resample_last(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_cols: list[str],
    interval: str = "1 hour",
) -> DataFrame:
    """One row per key per grid tick in [trunc(min ts), max ts] stepped
    by `interval`; each tick carries the latest observation at or
    before it. The first tick is truncated to the interval, so it may
    precede the key's first observation — those ticks forward-fill NULL
    (left-join semantics), exactly like the SQL oracle.

    Grid timestamps are interval-aligned per key (date_trunc of the
    key's min ts) — deterministic, engine-portable.
    """
    unit = interval.split()[-1].rstrip("s")  # "1 hour" -> hour
    bounds = df.groupBy(*by).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.max(ts_col).alias("__hi"),
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {interval}"))
        ).alias("grid_ts"),
    )
    return asof_join(
        grid, df.select(*by, ts_col, *value_cols),
        by=by, left_on="grid_ts", right_on=ts_col,
        value_cols=value_cols,
    )
