"""Slowly-changing-dimension maintenance.

The reference's DIM_LOCATION carries SCD bookkeeping columns
(VALID_FROM / VALID_TO / IS_CURRENT, ETL:43-45) but rebuilds the whole
dimension every run, so history never accumulates (SURVEY.md §1.1).
This operator makes the scaffolding real: merge a new snapshot of the
natural-key attribute table into an existing dimension, Type-2 style —
changed rows are closed (VALID_TO = as_of, IS_CURRENT = false) and a
new current version is appended; unchanged rows pass through; new keys
are inserted.

Shape: one full-outer-ish comparison join on the natural key between
current rows and the snapshot — shuffle on the natural key only, no
windows, no driver data. At 100 TB both sides partition by the key and
the merge is a single co-partitioned join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_scd2(
    dim: DataFrame,
    snapshot: DataFrame,
    natural_key: list[str],
    compare_cols: list[str],
    as_of: dt.date,
) -> DataFrame:
    """Merge `snapshot` (natural_key + compare_cols, one row per key)
    into `dim` (same columns + VALID_FROM/VALID_TO/IS_CURRENT).

    Returns the new dimension content:
    - history rows (IS_CURRENT = false) pass through untouched;
    - current rows whose compare_cols still match the snapshot pass
      through;
    - current rows whose key left the snapshot or changed are closed
      (VALID_TO = as_of, IS_CURRENT = false);
    - snapshot rows that are new or changed become new current rows
      (VALID_FROM = as_of, VALID_TO = NULL, IS_CURRENT = true).

    Surrogate keys are intentionally NOT assigned here — feed the output
    through operators.surrogate_key if the target schema needs one.
    """
    # NULL IS_CURRENT is treated as history: the two filters below must
    # partition the dimension (a naive `filter(~c)` / `filter(c)` pair
    # silently drops NULL rows).
    is_current = F.coalesce(F.col("IS_CURRENT"), F.lit(False))
    history = dim.filter(~is_current)
    current = dim.filter(is_current)

    snap = snapshot.select(*natural_key, *compare_cols).withColumn(
        "__in_snap", F.lit(True)
    )
    cur_cmp = current.select(
        *natural_key,
        *[F.col(c).alias(f"__cur_{c}") for c in compare_cols],
        "VALID_FROM",
    ).withColumn("__in_cur", F.lit(True))
    # full-outer on the natural key: explicit membership markers
    # distinguish current-only (key retired), snapshot-only (new key),
    # and matched rows — markers, not column nullness, so NULLs in the
    # data can't misclassify; eqNullSafe makes the change predicate
    # total.
    joined = cur_cmp.join(snap, natural_key, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & (F.col(c).eqNullSafe(F.col(f"__cur_{c}")))
    in_cur = F.coalesce(F.col("__in_cur"), F.lit(False))
    in_snap = F.coalesce(F.col("__in_snap"), F.lit(False))

    unchanged = (
        joined.filter(in_cur & in_snap & same)
        .select(
            *natural_key,
            *[F.col(f"__cur_{c}").alias(c) for c in compare_cols],
            "VALID_FROM",
        )
        .withColumn("VALID_TO", F.lit(None).cast("date"))
        .withColumn("IS_CURRENT", F.lit(True))
    )
    closed = (
        joined.filter(in_cur & (~in_snap | ~same))
        .select(
            *natural_key,
            *[F.col(f"__cur_{c}").alias(c) for c in compare_cols],
            "VALID_FROM",
        )
        .withColumn("VALID_TO", F.lit(as_of).cast("date"))
        .withColumn("IS_CURRENT", F.lit(False))
    )
    opened = (
        joined.filter(in_snap & (~in_cur | ~same))
        .select(*natural_key, *compare_cols)
        .withColumn("VALID_FROM", F.lit(as_of).cast("date"))
        .withColumn("VALID_TO", F.lit(None).cast("date"))
        .withColumn("IS_CURRENT", F.lit(True))
    )
    cols = [*natural_key, *compare_cols, "VALID_FROM", "VALID_TO", "IS_CURRENT"]
    return (
        history.select(*cols)
        .unionByName(unchanged.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(opened.select(*cols))
    )
