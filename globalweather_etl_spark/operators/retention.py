"""Cohort retention analysis — the companion of funnel analysis.

The other canonical event-analytics question: group users by the
period of their FIRST activity (their cohort), then for each later
period measure what fraction of the cohort was active. Output is the
classic retention triangle.

Semantics (pinned for the DuckDB parity test):
- periods are day/week/month truncations of the event timestamp
  (``date_trunc`` — weeks start Monday in both Spark and DuckDB);
- a user's cohort is the truncation of their earliest event (ties
  irrelevant — min over timestamps);
- ``period_offset`` counts whole periods between cohort and activity
  period (days/weeks: difference in days divided by the period
  length — exact because both ends are truncated; months: month
  arithmetic);
- retention = distinct active users / cohort size, as double.

Scale shape: two hash aggregates and a join, all on high-cardinality
keys — (user) for first-seen, distinct (user, period) for activity —
then a (cohort, offset) count. No windows, no self-joins; the
retention triangle itself is tiny (periods² rows) however large the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["retention_cohorts"]

_PERIOD_DAYS = {"day": 1, "week": 7}


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, period_offset, n_active, n_cohort, retention), one row
    per cohort x observed offset (offset 0 always present and fully
    retained by construction)."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    p = F.date_trunc(period, F.col(ts_col))
    activity = events.select(
        F.col(user_col).alias("user"), p.alias("period")
    ).distinct()
    cohorts = activity.groupBy("user").agg(F.min("period").alias("cohort"))
    joined = activity.join(cohorts, "user")
    if period == "month":
        offset = (
            (F.year("period") - F.year("cohort")) * 12
            + (F.month("period") - F.month("cohort"))
        ).cast("int")
    else:
        offset = (
            F.datediff(F.to_date("period"), F.to_date("cohort"))
            / F.lit(_PERIOD_DAYS[period])
        ).cast("int")
    active = (
        joined.select("user", "cohort", offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    return active.join(sizes, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias(
            "retention"
        ),
    )
