"""Per-series sequential monitoring statistics — EWMA and CUSUM — as
order-fixed array folds.

Both statistics are RECURSIVE (each step depends on the previous
state), which no Spark window frame expresses; the engine shape that
works at scale is ONE groupBy(series) collecting the ordered value
array and folding it with ``F.aggregate`` in whole-stage codegen —
O(series length) per group, one exchange total, no UDF, no driver
loop.  Folds over doubles are order-FIXED by construction (the array
is sorted by the series order first), so DuckDB's ``list_reduce`` over
the same ``list(... ORDER BY ...)`` reproduces every intermediate bit —
the portable-oracle recipe the PQ/SemDeDup/HOF families established.

- EWMA (exponentially weighted moving average, the classic smoothing
  statistic): s_0 = x_0; s_t = alpha * x_t + (1 - alpha) * s_{t-1}.
  Emitted as the series' FINAL smoothed level.
- CUSUM (Page 1954, the standard changepoint/drift detector): the
  one-sided positive/negative cumulative sums around a target with
  slack k — pos_t = max(0, pos_{t-1} + x_t - target - k), mirrored
  for neg — counting threshold crossings (alarms) with reset, the
  textbook tabular form.  ``target`` defaults to the series' own mean
  (computed DECIMAL-exact in the same aggregation so the fold's
  constant is bit-identical cross-engine).
- HOLT (double exponential smoothing — Holt 1957, the level+trend
  forecaster): level_t = alpha*x_t + (1-alpha)*(level+trend);
  trend_t = beta*(level_t - level) + (1-beta)*trend; the one-step
  forecast is level + trend.  Seeded level = x_0, trend = 0 (the
  common convention; a few steps of beta-smoothing wash the seed
  out).

Scale (100 TB): per-series state is one array held only inside the
aggregation buffer of its group — a billion short series parallelize
across the groupBy exchange; a single pathological series is bounded
by the group's row count (use windowed pre-aggregation upstream for
multi-year tick data).  The collected array is the honest trade for
recursion; everything else stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["series_monitor"]


def _ordered_vals(value: Column, order_cols: list[str]) -> Column:
    """Values ordered by the series order: sort an array of
    (order..., value) structs, then project the value — the
    shuffle-free ORDER BY inside an aggregation."""
    tup = F.struct(*[F.col(c) for c in order_cols], value.alias("__v"))
    return F.transform(
        F.array_sort(F.collect_list(tup)), lambda s: s["__v"]
    )


def series_monitor(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    key_cols: list[str],
    alpha: float = 0.3,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    beta: float = 0.1,
) -> DataFrame:
    """One row per series key with:

      n              series length
      mean           DECIMAL-exact mean (the CUSUM target)
      ewma           final EWMA level (9dp)
      cusum_pos/neg  final one-sided CUSUM statistics (9dp)
      cusum_alarms   threshold crossings (with reset) on either side
      holt_level     final Holt level (9dp)
      holt_trend     final Holt trend (9dp)
      holt_forecast  one-step-ahead forecast level + trend (9dp)

    ``slack_k`` and ``threshold_h`` are in VALUE units (the usual
    presentation scales by sigma; pass k = 0.5*sigma etc. if a scaled
    rule is wanted — keeping raw units keeps the fold free of a
    second pass)."""
    x = F.col(value_col).cast("double")
    vals = _ordered_vals(x, order_cols)
    # the raw mean column is named __mean, NOT mean: the output
    # projection aliases round(__mean, 9) AS mean, and if the fold's
    # lambda referenced a column with that same name, Catalyst's
    # alias resolution would bind it to the ROUNDED output — the fold
    # would silently run against a 9dp-truncated target (caught by
    # the DuckDB bit-identity test; a 3e-10 target error triples over
    # three steps and flips the 9dp rounding)
    mean = (
        F.sum(x.cast("decimal(25,10)")).cast("double")
        / F.count(F.lit(1))
    ).alias("__mean")
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        mean,
        vals.alias("__vals"),
    )
    a = F.lit(float(alpha))
    ewma = F.aggregate(
        F.col("__vals"),
        F.lit(None).cast("double"),
        lambda s, v: F.when(s.isNull(), v).otherwise(
            a * v + (F.lit(1.0) - a) * s
        ),
    )
    k = F.lit(float(slack_k))
    h = F.lit(float(threshold_h))
    zero = F.lit(0.0)
    target = F.col("__mean")
    # state struct: (pos, neg, alarms); alarm resets the crossed side
    cusum = F.aggregate(
        F.col("__vals"),
        F.struct(
            zero.alias("pos"), zero.alias("neg"),
            F.lit(0).cast("long").alias("alarms"),
        ),
        lambda s, v: F.struct(
            F.when(
                F.greatest(zero, s["pos"] + v - target - k) > h, zero
            )
            .otherwise(F.greatest(zero, s["pos"] + v - target - k))
            .alias("pos"),
            F.when(
                F.greatest(zero, s["neg"] + target - v - k) > h, zero
            )
            .otherwise(F.greatest(zero, s["neg"] + target - v - k))
            .alias("neg"),
            (
                s["alarms"]
                + F.when(
                    F.greatest(zero, s["pos"] + v - target - k) > h, 1
                ).otherwise(0)
                + F.when(
                    F.greatest(zero, s["neg"] + target - v - k) > h, 1
                ).otherwise(0)
            ).alias("alarms"),
        ),
    )
    b = F.lit(float(beta))
    nl = lambda s, v: a * v + (F.lit(1.0) - a) * (  # noqa: E731
        s["level"] + s["trend"]
    )
    holt = F.aggregate(
        F.col("__vals"),
        F.struct(
            F.lit(None).cast("double").alias("level"),
            zero.alias("trend"),
        ),
        lambda s, v: F.when(
            s["level"].isNull(),
            F.struct(v.alias("level"), zero.alias("trend")),
        ).otherwise(
            F.struct(
                nl(s, v).alias("level"),
                (
                    b * (nl(s, v) - s["level"])
                    + (F.lit(1.0) - b) * s["trend"]
                ).alias("trend"),
            )
        ),
    )
    return agg.select(
        *key_cols,
        "n",
        F.round("__mean", 9).alias("mean"),
        F.round(ewma, 9).alias("ewma"),
        F.round(cusum["pos"], 9).alias("cusum_pos"),
        F.round(cusum["neg"], 9).alias("cusum_neg"),
        cusum["alarms"].alias("cusum_alarms"),
        F.round(holt["level"], 9).alias("holt_level"),
        F.round(holt["trend"], 9).alias("holt_trend"),
        F.round(holt["level"] + holt["trend"], 9).alias(
            "holt_forecast"
        ),
    )
