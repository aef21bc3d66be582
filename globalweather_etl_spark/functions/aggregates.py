"""Aggregate expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_avg(c: Column) -> Column:
    """Order-independent AVG: exact decimal sum, then double division.

    Float AVG results depend on partial-aggregation order (partitioning,
    AQE coalescing), which makes outputs non-reproducible run to run at
    scale. An exact decimal accumulator removes the order dependence for
    ~1 extra cpu cost; NULL semantics match AVG (sum skips NULLs,
    count(col) counts non-NULLs). Rounded to 6 decimals: decimal->double
    conversion itself can differ by 1 ulp between engines."""
    return F.round(
        F.sum(c.cast("decimal(25,12)")).cast("double") / F.count(c), 6
    )
