"""Weather classification expressions (the reference's only business logic).

These are ordered-first-match CASE expressions; branch order and boundary
values are replicated verbatim, including the documented quirks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def weather_band(avg_temp_f: Column) -> Column:
    """Temperature band CASE — ETL:57-63 (also re-derived in the fact join,
    ETL:121-127).

    Deliberate quirk replicated verbatim: the branches have *gaps* for
    fractional temperatures (50 < t < 51 and 70 < t < 71 match no branch)
    and everything above 85 — all of these fall to ELSE 'Hot'. Source
    temps are FLOAT, so e.g. 50.5 classifies as 'Hot'. Do NOT "fix" the
    boundaries; the oracle encodes the same gap.
    """
    return (
        F.when(avg_temp_f < 32, F.lit("Freezing"))
        .when(avg_temp_f.between(32, 50), F.lit("Cold"))
        .when(avg_temp_f.between(51, 70), F.lit("Mild"))
        .when(avg_temp_f.between(71, 85), F.lit("Warm"))
        .otherwise(F.lit("Hot"))
    )


def precip_type(tot_snowfall_in: Column, tot_precipitation_in: Column) -> Column:
    """Precipitation type CASE — ETL:69-73 (re-derived in the fact join,
    ETL:130-134).

    Branch order matters: snow wins over rain when both are positive.
    NULL inputs make the comparison NULL (not true), so NULL/NULL rows
    fall through to 'None' — exactly SQL CASE semantics.
    """
    return (
        F.when(tot_snowfall_in > 0, F.lit("Snow"))
        .when(tot_precipitation_in > 0, F.lit("Rain"))
        .otherwise(F.lit("None"))
    )
