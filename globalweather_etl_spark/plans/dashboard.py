"""The five dashboard queries (sql/Dashboard.sql, cited as DASH:n).

Each takes the warehouse DataFrames and returns a result DataFrame.
Aggregate columns are aliased exactly as the reference names them so
oracle comparisons line up column-for-column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.aggregates import exact_avg


def q1(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """Average forecast temperature over time (DASH:1-9):
    fact ⋈ DIM_DATE, GROUP BY FULL_DATE, AVG, ORDER BY date."""
    f = fact.alias("fct")
    d = F.broadcast(dim_date).alias("dd")
    return (
        f.join(d, F.col("fct.DATE_KEY") == F.col("dd.DATE_KEY"), "inner")
        .groupBy(F.col("dd.FULL_DATE").alias("FULL_DATE"))
        .agg(exact_avg(F.col("fct.AVG_TEMP_F")).alias("AVG_TEMP_F"))
        .orderBy("FULL_DATE")
    )


def q2(fact: DataFrame, dim_location: DataFrame) -> DataFrame:
    """Top 15 cities by average forecast temperature (DASH:11-20):
    GROUP BY city, ORDER BY avg DESC, LIMIT 15 — Spark plans
    TakeOrderedAndProject (no full global sort)."""
    f = fact.alias("fct")
    loc = F.broadcast(dim_location).alias("dl")
    return (
        f.join(loc, F.col("fct.LOCATION_KEY") == F.col("dl.LOCATION_KEY"), "inner")
        .groupBy(F.col("dl.CITY_NAME").alias("CITY_NAME"))
        .agg(exact_avg(F.col("fct.AVG_TEMP_F")).alias("AVG_TEMP_F"))
        # CITY_NAME tiebreak: the reference (DASH:19-20) orders by the
        # average alone, leaving rank-15 ties engine-chosen; a
        # deterministic tiebreak keeps results reproducible and
        # oracle-comparable without changing any untied result.
        .orderBy(F.desc("AVG_TEMP_F"), F.asc("CITY_NAME"))
        .limit(15)
    )


def q3(fact: DataFrame) -> DataFrame:
    """Average temperature by precipitation type (DASH:22-28)."""
    return (
        fact.groupBy("PRECIPITATION_TYPE")
        .agg(exact_avg(F.col("AVG_TEMP_F")).alias("AVG_TEMP_F"))
        .orderBy(F.desc("AVG_TEMP_F"))
    )


def q4(fact: DataFrame) -> DataFrame:
    """Forecast counts per weather band (DASH:30-36)."""
    return (
        fact.groupBy("WEATHER_BAND")
        .agg(F.count(F.lit(1)).alias("DAYS_COUNT"))
        .orderBy(F.desc("DAYS_COUNT"))
    )


def q5(fact: DataFrame) -> DataFrame:
    """Percent of locations with expected rain per day (DASH:38-45).

    COUNT_IF(PRECIPITATION_IN > 0) * 100.0 / COUNT(*): NULL
    precipitation rows count in the denominator but never the numerator
    — preserved by count_if's NULL-is-false semantics."""
    return (
        fact.groupBy("DATE_KEY")
        .agg(
            (
                F.count_if(F.col("PRECIPITATION_IN") > 0)
                * F.lit(100.0)
                / F.count(F.lit(1))
            ).alias("PCT_LOCATIONS_WITH_RAIN")
        )
        .orderBy("DATE_KEY")
    )
