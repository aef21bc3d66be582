"""Derive a weather-shaped STG_FORECAST_DAY from the driver's `events`
table (/root/testdata/sf*/events.parquet).

Why: the reference pipeline's source is a Snowflake Marketplace weather
table we don't have; the driver's correctness gate runs on its TPC-H-ish
parquet. This module maps `events` into the exact staging schema
(schemas.STG_FORECAST_DAY) with ONLY deterministic scalar expressions
(no float aggregation, no randomness), so an identical ANSI-SQL
derivation in DuckDB produces bit-identical rows and the WHOLE reference
pipeline — dims, 5-way star join, both window metrics, dashboard — is
oracle-checkable end to end.

Design constraints encoded here:
- one row per (POSTAL_CODE, DATE_VALID_STD): picked by min event_id per
  (user_id, day) via a row_number window — keeps LAG/SUM window order
  ties impossible (ETL:100-111 order by DATE_KEY within location).
- CITY_NAME / COUNTRY are functions of POSTAL_CODE, so DIM_LOCATION's
  3-column grain (ETL:46-52) collapses to 1 row per postal code and the
  POSTAL_CODE-only fact join (ETL:116-118) does not fan out. (Fan-out
  semantics are separately covered by the hand-built fixture tests.)
- temperature = value mod 120 - 10 spans every band of the CASE at
  ETL:57-63 including fractional gap values (50<t<51, 70<t<71).
- precipitation exercises positive / zero / NULL (NULL feeds the
  COUNT_IF numerator-vs-denominator divergence, Dashboard.sql:41).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Frozen stand-in for CURRENT_DATE() (ETL:43) — just past the events
# table's last timestamp; parameterizing keeps runs reproducible.
AS_OF_DATE = dt.date(2024, 2, 1)


def _fmod(x, m: float):
    """Positive float modulus via x - floor(x/m)*m — elementary ops only,
    bit-identical between Spark and DuckDB."""
    return x - F.floor(x / F.lit(m)) * F.lit(m)


def weather_staging_from_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) ->
    STG_FORECAST_DAY (see module docstring; mirrored by
    oracles.WEATHER_STAGING_SQL)."""
    first = (
        events.withColumn("__rn", F.row_number().over(
            Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy("event_id")
        ))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    v = F.col("value")
    temp = _fmod(v, 120.0) - F.lit(10.0)
    postal_num = F.col("user_id")
    return first.select(
        F.col("ts").cast("date").alias("DATE_VALID_STD"),
        F.dayofyear(F.col("ts").cast("date")).cast("int").alias("DOY_STD"),
        # lpad TRUNCATES strings longer than the pad width (identically
        # in DuckDB, so it would pass the oracle while colliding
        # distinct users onto one postal code at >=7-digit user_ids);
        # pad short ids, pass long ids through.
        F.concat(
            F.lit("P"),
            F.when(
                F.length(postal_num.cast("string")) < 6,
                F.lpad(postal_num.cast("string"), 6, "0"),
            ).otherwise(postal_num.cast("string")),
        ).alias("POSTAL_CODE"),
        F.concat(F.lit("City_"), (postal_num % 11).cast("string")).alias("CITY_NAME"),
        F.concat(F.lit("C"), (postal_num % 5).cast("string")).alias("COUNTRY"),
        temp.alias("AVG_TEMPERATURE_AIR_2M_F"),
        (temp - F.lit(5.0)).alias("MIN_TEMPERATURE_AIR_2M_F"),
        (temp + F.lit(5.0)).alias("MAX_TEMPERATURE_AIR_2M_F"),
        _fmod(v, 100.0).alias("AVG_HUMIDITY_RELATIVE_2M_PCT"),
        (F.lit(950.0) + v / F.lit(10.0)).alias("AVG_PRESSURE_2M_MB"),
        (v / F.lit(20.0)).alias("AVG_WIND_SPEED_10M_MPH"),
        _fmod(v * F.lit(7.0), 100.0).alias("AVG_CLOUD_COVER_TOT_PCT"),
        F.when(F.col("event_type") == "click", v / F.lit(50.0))
        .when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("TOT_PRECIPITATION_IN"),
        F.when(
            (F.col("event_type") == "signup") & (v > 250.0), v / F.lit(100.0)
        )
        .otherwise(F.lit(0.0))
        .alias("TOT_SNOWFALL_IN"),
        _fmod(v, 101.0).alias("PROBABILITY_OF_PRECIPITATION_PCT"),
        _fmod(v, 53.0).alias("PROBABILITY_OF_SNOW_PCT"),
    )


# ANSI-SQL mirror of weather_staging_from_events for the DuckDB oracle.
# Must stay expression-for-expression in sync with the Spark code above.
WEATHER_STAGING_SQL = """
SELECT
    CAST(ts AS DATE)                                        AS DATE_VALID_STD,
    CAST(dayofyear(CAST(ts AS DATE)) AS INTEGER)            AS DOY_STD,
    'P' || CASE WHEN length(CAST(user_id AS VARCHAR)) < 6
                THEN lpad(CAST(user_id AS VARCHAR), 6, '0')
                ELSE CAST(user_id AS VARCHAR) END           AS POSTAL_CODE,
    'City_' || CAST(user_id % 11 AS VARCHAR)                AS CITY_NAME,
    'C' || CAST(user_id % 5 AS VARCHAR)                     AS COUNTRY,
    (value - floor(value / 120.0) * 120.0) - 10.0           AS AVG_TEMPERATURE_AIR_2M_F,
    ((value - floor(value / 120.0) * 120.0) - 10.0) - 5.0   AS MIN_TEMPERATURE_AIR_2M_F,
    ((value - floor(value / 120.0) * 120.0) - 10.0) + 5.0   AS MAX_TEMPERATURE_AIR_2M_F,
    value - floor(value / 100.0) * 100.0                    AS AVG_HUMIDITY_RELATIVE_2M_PCT,
    950.0 + value / 10.0                                    AS AVG_PRESSURE_2M_MB,
    value / 20.0                                            AS AVG_WIND_SPEED_10M_MPH,
    (value * 7.0) - floor((value * 7.0) / 100.0) * 100.0    AS AVG_CLOUD_COVER_TOT_PCT,
    CASE WHEN event_type = 'click' THEN value / 50.0
         WHEN event_type = 'error' THEN NULL
         ELSE 0.0 END                                       AS TOT_PRECIPITATION_IN,
    CASE WHEN event_type = 'signup' AND value > 250.0 THEN value / 100.0
         ELSE 0.0 END                                       AS TOT_SNOWFALL_IN,
    value - floor(value / 101.0) * 101.0                    AS PROBABILITY_OF_PRECIPITATION_PCT,
    value - floor(value / 53.0) * 53.0                      AS PROBABILITY_OF_SNOW_PCT
FROM (
    SELECT *,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY event_id) AS __rn
    FROM events
) WHERE __rn = 1
"""
