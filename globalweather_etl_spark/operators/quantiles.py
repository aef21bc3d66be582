"""Distributed exact-at-resolution quantiles (histogram method).

The standard way to pick a corpus-wide quality floor is "keep the top
(1-q) fraction", not a magic constant — but the obvious tools fail the
reproducibility bar this engine holds everywhere else:
``percentile_approx`` is approximate (result depends on sketch
accuracy), and an exact rank needs a global sort (the one shuffle shape
this codebase bans at 100 TB).

``bucketed_quantile_threshold`` instead histograms the value at a fixed
``resolution``: one map-side-combined aggregate over bucket ids, then a
cumulative sum over the HISTOGRAM (at most (max-min)/resolution rows —
for a score in [0,1] at 1e-4 that is <= 10_001 rows, safely a
single-partition window regardless of corpus size). The returned
threshold is exact *for the bucketed value*: deterministic, independent
of partitioning, and bit-reproducible in any engine that does IEEE
double arithmetic (the DuckDB oracle recomputes it from the same
formula). The trade: the cut lands on a bucket boundary, so up to one
bucket's worth of rows near the boundary are kept conservatively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_quantile_threshold(
    df: DataFrame,
    value: Column,
    q: float,
    resolution: float = 1e-4,
) -> DataFrame:
    """One-row DataFrame (threshold double, n_total long, n_below long):
    the smallest bucket upper edge ``(b+1) * resolution`` such that at
    most ``floor(q * n_total)`` rows fall in buckets <= b. Rows with
    ``value >= threshold`` are the kept top fraction; ties within the
    boundary bucket are all kept (conservative). NULL values are
    excluded from the count. When every bucket would overshoot (q ~ 0)
    the threshold falls back to the minimum bucket's lower edge — keep
    everything."""
    from pyspark.sql import Window

    b = F.floor(value / F.lit(float(resolution))).alias("b")
    hist = (
        df.select(b)
        .filter(F.col("b").isNotNull())
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "b",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        F.min("b").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("minb"),
    )
    return cum.select(
        "b", "cc", "n", "minb",
        F.floor(F.lit(float(q)) * F.col("n").cast("double")).alias("tgt"),
    ).groupBy().agg(
        (
            F.coalesce(
                F.max(F.when(F.col("cc") <= F.col("tgt"), F.col("b") + 1)),
                F.min("minb"),
            ).cast("double")
            * F.lit(float(resolution))
        ).alias("threshold"),
        F.max("n").cast("long").alias("n_total"),
        F.coalesce(
            F.max(F.when(F.col("cc") <= F.col("tgt"), F.col("cc"))),
            F.lit(0),
        ).cast("long").alias("n_below"),
    )


def quantile_keep_flag(
    df: DataFrame,
    value: Column,
    q: float,
    resolution: float = 1e-4,
    out_col: str = "quantile_kept",
    threshold_col: str | None = "quantile_threshold",
) -> DataFrame:
    """Attach the top-(1-q) keep flag (``value >= threshold``) — and,
    unless ``threshold_col`` is None, the threshold itself — to every
    row. The 1-row threshold frame broadcasts; the flag is then a pure
    scan-stage comparison."""
    th = bucketed_quantile_threshold(df, value, q, resolution).select(
        "threshold"
    )
    out = df.crossJoin(F.broadcast(th)).withColumn(
        out_col, value >= F.col("threshold")
    )
    if threshold_col:
        out = out.withColumnRenamed("threshold", threshold_col)
    else:
        out = out.drop("threshold")
    return out
