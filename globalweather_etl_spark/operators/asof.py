"""As-of (nearest-preceding) join for timeseries.

For each left row, attach the most recent right row of the same key
with right_time <= left_time (inclusive backward as-of, the DuckDB /
kdb convention). The classic lake implementation: union both sides
tagged, ONE shuffle on the key, one sort per partition, and a
last-non-null carry-forward window — no per-row lookups, no range-join
blowup, scales to any number of rows per key.

Equivalent ANSI form for the oracle: DuckDB's native ASOF LEFT JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
) -> DataFrame:
    """left columns + value_cols from the as-of matched right row
    (NULL where no right row precedes). Ties (right_time == left_time)
    match — the right row sorts before the left row at equal times.

    Both inputs shuffle once on `by`; the window is partitioned by `by`
    and ordered by (time, side marker), so each task streams its keys'
    merged timeline once.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by else F.col(c) for c in lcols],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = Window.partitionBy(*by).orderBy("__t", "__side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
