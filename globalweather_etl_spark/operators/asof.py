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
    Among right rows sharing (key, time), the greatest value-struct wins
    (deterministic); oracles on engines with unspecified ASOF tie-picks
    should pre-deduplicate their right side to mirror this.

    Both inputs shuffle once on `by`; the window is partitioned by `by`
    and ordered by (time, side marker), so each task streams its keys'
    merged timeline once.
    """
    lcols = left.columns
    # The matched right row travels as ONE struct (non-null whenever a
    # right row exists, even if its members are NULL), so the
    # carry-forward can never tear values from different right rows —
    # per-column last(ignorenulls) would skip a NULL member and splice
    # in an older row's value.
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in value_cols
        ) + ">"
    )
    l_tagged = left.select(
        *lcols,
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        null_struct.alias("__v"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by else F.col(c) for c in lcols],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # __v as the final sort key makes the order total even when the
    # right side has duplicate timestamps per key: the greatest value
    # struct wins deterministically (left rows all carry NULL __v and
    # need no tiebreak — each is its own output row).
    w = Window.partitionBy(*by).orderBy("__t", "__side", "__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__v", ignorenulls=True).over(w).alias("__m"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(*lcols, *[F.col(f"__m.{c}").alias(c) for c in value_cols])
    )
