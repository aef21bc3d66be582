"""Table profiling — the ANALYZE / describe-table primitive: one scan,
per-column statistics.

Every warehouse ships this (ANALYZE TABLE ... COMPUTE STATISTICS;
Snowflake's automatic clustering metadata makes it implicit for the
reference). The engine needs it for the same two reasons: operator
sanity ("did the load produce the shape we expect") and
planner-adjacent decisions (broadcast candidates, skew suspects,
clustering keys).

Output: one row per profiled column —
  (column, n_rows, n_nulls, approx_distinct, min_str, max_str)
min/max render as strings so one frame carries every column type; the
approx distinct count is Spark's HLL++ (`approx_count_distinct`, the
production fast path — the engine-portable register HLL in
operators/sketches.py remains the cross-engine-checkable variant).

Scale shape: ONE pass — all statistics for all columns compile into a
single wide aggregate row (2 + 4*n_cols expressions, map-side
combined), then a literal-struct explode reshapes it to rows, the
_unpivot_metrics trick. No per-column jobs, no shuffle beyond the
aggregate's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile"]


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregate pass.
    ``rsd`` is the HLL++ relative standard deviation knob."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            F.approx_count_distinct(c, rsd).alias(f"__ad_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{i}")).cast("long").alias("n_nulls"),
            F.col(f"__ad_{i}").cast("long").alias("approx_distinct"),
            F.col(f"__mn_{i}").alias("min_str"),
            F.col(f"__mx_{i}").alias("max_str"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
