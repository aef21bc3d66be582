"""Date-part expressions matching Snowflake semantics used by the reference.

Snowflake functions used: YEAR, MONTH, DAY, DAYOFWEEKISO, WEEKISO
(ETL:27-31, ETL:151-156).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dayofweek_iso(d: Column) -> Column:
    """ISO day-of-week: Mon=1 .. Sun=7 (Snowflake DAYOFWEEKISO, ETL:30).

    Spark's `dayofweek` is Sun=1..Sat=7 (wrong here); `weekday` is
    Mon=0..Sun=6, so +1 gives ISO numbering.
    """
    return (F.weekday(d) + F.lit(1)).cast("int")


def weekiso(d: Column) -> Column:
    """ISO-8601 week of year (Snowflake WEEKISO, ETL:31). Spark's
    `weekofyear` already implements ISO-8601 week numbering."""
    return F.weekofyear(d).cast("int")


def date_parts(d: Column) -> dict[str, Column]:
    """The date-part bundle DIM_DATE projects (ETL:27-31), keyed by the
    reference's output column names. All cast to int for a stable schema
    across engines."""
    return {
        "YEAR": F.year(d).cast("int"),
        "MONTH": F.month(d).cast("int"),
        "DAY": F.dayofmonth(d).cast("int"),
        "DAY_OF_WEEK": dayofweek_iso(d),
        "WEEK_OF_YEAR": weekiso(d),
    }
