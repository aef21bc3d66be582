"""Key-skew diagnostics — the pre-flight audit before any big join.

`operators.skew.salted_join` is the CURE; this is the DIAGNOSIS: which
keys are heavy, how heavy relative to a fair share, and whether AQE's
skew-join or explicit salting is warranted.  At 100 TB you run this on
a sample or as a side Observation BEFORE burning a cluster-day on a
join that stalls on three hot keys.

One map-side-combinable count aggregate keyed on the join key, then a
bounded top-k (TakeOrderedAndProject — no global sort) plus a one-row
distribution summary.  Deterministic: ties in the top-k break by key
string, so the report is stable run to run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_report", "skew_summary"]


def key_skew_report(
    df: DataFrame, keys: Sequence[str] | str, top_k: int = 20
) -> DataFrame:
    """Top-``top_k`` heaviest key groups: the key columns, ``n_rows``,
    and ``share`` (fraction of all rows), heaviest first (ties by key
    text ascending, so the report is deterministic)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("key_skew_report needs at least one key column")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = df.count()
    tie = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return (
        counts.orderBy(F.col("n_rows").desc(), tie.asc())
        .limit(top_k)
        .withColumn(
            "share",
            F.col("n_rows").cast("double") / F.lit(float(max(total, 1))),
        )
    )


def skew_summary(
    df: DataFrame, keys: Sequence[str] | str
) -> DataFrame:
    """One-row distribution summary over the key-group sizes:
    ``n_groups``, ``max_group``, ``mean_group``, ``p99_group``, and
    ``skew_ratio`` = max / mean — the number a salting decision reads
    (AQE's skew threshold thinks in the same ratio)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("skew_summary needs at least one key column")
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("n").cast("long").alias("max_group"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_group"),
        F.percentile_approx("n", 0.99, 10000).cast("long").alias("p99_group"),
        (
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.count(F.lit(1)))
        ).alias("skew_ratio"),
    )
