"""As-of join for timeseries: backward / forward / nearest, with
optional tolerance.

For each left row, attach one right row of the same key:

- backward (default): most recent right with right_time <= left_time
  (inclusive — the DuckDB / kdb convention)
- forward: earliest right with right_time >= left_time
- nearest: whichever of the two is closer in time (ties -> backward,
  matching pandas.merge_asof)

tolerance (seconds) drops matches farther than the bound — rows keep
NULL values instead, mirroring pandas.

The classic lake implementation, one direction = one pass: union both
sides tagged, ONE shuffle on the key, one sort per partition, and a
last-non-null carry-forward window — no per-row lookups, no range-join
blowup, scales to any number of rows per key. `nearest` runs both
passes over the same exchange (Catalyst reuses the partitioning; only
the per-partition sort differs) and picks per row.

Equivalent ANSI form for the oracle: DuckDB's native ASOF LEFT JOIN
(backward); windowed min-over-following for forward.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _carry(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
    descending: bool,
) -> DataFrame:
    """Shared carry-forward pass. descending=False gives backward
    as-of; True walks the timeline from the future and gives forward.
    Output: left columns + `__m` struct (matched values + `__mt`
    matched time; NULL when no match on that side)."""
    lcols = left.columns
    # The matched right row travels as ONE struct (non-null whenever a
    # right row exists, even if its members are NULL), so the
    # carry-forward can never tear values from different right rows —
    # per-column last(ignorenulls) would skip a NULL member and splice
    # in an older row's value. __mt rides along for tolerance/nearest.
    t_type = right.schema[right_on].dataType.simpleString()
    null_struct = F.lit(None).cast(
        "struct<"
        + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + f", __mt: {t_type}>"
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
        F.struct(
            *[F.col(c) for c in value_cols], F.col(right_on).alias("__mt")
        ).alias("__v"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Within equal times the right row sorts before the left row
    # (inclusive match in both directions). __v as the final sort key
    # makes the order total when the right side has duplicate
    # timestamps per key: the struct sorted LAST wins deterministically
    # (left rows all carry NULL __v and need no tiebreak). Backward
    # keeps the round-2 "greatest struct wins" pick; forward mirrors it
    # on the reversed timeline.
    order = [
        F.col("__t").desc() if descending else F.col("__t").asc(),
        F.col("__side").asc(),
        F.col("__v").asc_nulls_first(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return unioned.select(
        *lcols,
        "__side",
        F.col(left_on).alias("__lt"),
        F.last("__v", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__side") == 1)


def _delta_seconds(a: Column, b: Column) -> Column:
    """|a - b| in seconds; works for timestamps (cast double = epoch
    seconds) and plain numerics alike."""
    return F.abs(a.cast("double") - b.cast("double"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """left columns + value_cols from the as-of matched right row
    (NULL where no right row qualifies). See module docstring for
    direction/tolerance semantics.

    Both inputs shuffle once on `by`; each direction pass is one window
    whose task streams its keys' merged timeline once. `nearest` adds a
    second sort over the same exchange, not a second shuffle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns

    def finalize(df: DataFrame, m: str) -> DataFrame:
        matched = F.col(m)
        if tolerance is not None:
            within = _delta_seconds(F.col("__lt"), matched["__mt"]) <= F.lit(
                float(tolerance)
            )
            matched = F.when(within, matched)
        return df.select(
            *lcols, *[matched[c].alias(c) for c in value_cols]
        )

    if direction == "backward":
        return finalize(
            _carry(left, right, by, left_on, right_on, value_cols, False), "__m"
        )
    if direction == "forward":
        return finalize(
            _carry(left, right, by, left_on, right_on, value_cols, True), "__m"
        )

    # nearest: run both passes and pick the closer match per row. The
    # backward pass emits each left row exactly once, so the forward
    # pass runs over ITS output (no re-join, no row-identity problem);
    # the backward match rides through as an opaque extra left column
    # (renamed so the second pass's internals can't collide).
    back = _carry(left, right, by, left_on, right_on, value_cols, False)
    bwd = back.select(*lcols, F.col("__m").alias("__prev_match"))
    fwd = _carry(bwd, right, by, left_on, right_on, value_cols, True)
    db = _delta_seconds(F.col("__lt"), F.col("__prev_match")["__mt"])
    df_ = _delta_seconds(F.col("__lt"), F.col("__m")["__mt"])
    # ties -> backward (pandas.merge_asof convention); a missing side
    # never wins against a present one.
    pick_back = F.col("__m").isNull() | (
        F.col("__prev_match").isNotNull() & (db <= df_)
    )
    chosen = fwd.select(
        *lcols,
        "__lt",
        F.when(pick_back, F.col("__prev_match"))
        .otherwise(F.col("__m"))
        .alias("__m"),
    )
    return finalize(chosen, "__m")


def asof_join_directions(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
    prefixes: tuple[str, str, str] = ("", "next_", "nearest_"),
    tolerance: float | None = None,
) -> DataFrame:
    """All three as-of directions in one result: left columns plus
    value_cols matched backward (first prefix), forward (second), and
    nearest (third). Costs the same as direction="nearest" alone — the
    backward and forward carry passes already exist in that path; this
    just keeps both matches instead of discarding the losing side, so
    grading or comparing directions needs one exchange chain, not three
    separate joins.

    Per-direction semantics (inclusive matches, greatest-struct
    duplicate-time pick, ties -> backward, tolerance nulls out-of-bound
    matches) are identical to three asof_join calls — asserted
    column-for-column in tests/test_asof.py.
    """
    lcols = left.columns
    back = _carry(left, right, by, left_on, right_on, value_cols, False)
    bwd = back.select(*lcols, F.col("__m").alias("__prev_match"))
    fwd = _carry(bwd, right, by, left_on, right_on, value_cols, True)
    b, f = F.col("__prev_match"), F.col("__m")
    db = _delta_seconds(F.col("__lt"), b["__mt"])
    df_ = _delta_seconds(F.col("__lt"), f["__mt"])
    pick_back = f.isNull() | (b.isNotNull() & (db <= df_))
    near = F.when(pick_back, b).otherwise(f)

    def bound(matched: Column) -> Column:
        # Post-pick tolerance is equivalent to pre-pick filtering for
        # nearest: if the chosen (closer) side is out of bound, the
        # farther side is too.
        if tolerance is None:
            return matched
        within = _delta_seconds(F.col("__lt"), matched["__mt"]) <= F.lit(
            float(tolerance)
        )
        return F.when(within, matched)

    sel: list[Column] = [F.col(c) for c in lcols]
    for prefix, matched in zip(prefixes, (b, f, near)):
        bounded = bound(matched)
        sel += [bounded[c].alias(f"{prefix}{c}") for c in value_cols]
    return fwd.select(*sel)
