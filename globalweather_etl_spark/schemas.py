"""Declared schemas (the reference declares schema-by-CTAS; we declare
explicit StructTypes so ingest never depends on inference).

Source table shape: STAGING.STG_FORECAST_DAY — one row per
(POSTAL_CODE, DATE_VALID_STD); columns established by the 3NF ERD
(/root/reference/img/Obr 1.png) and column usage in
sql/ETL_GlobalWeather_DB.sql:160-175 (metric list), :25-32 (date cols),
:47-51 (location cols).
"""

from __future__ import annotations

from pyspark.sql import types as T

STG_FORECAST_DAY = T.StructType(
    [
        T.StructField("DATE_VALID_STD", T.DateType(), False),
        T.StructField("DOY_STD", T.IntegerType(), False),
        T.StructField("POSTAL_CODE", T.StringType(), False),
        T.StructField("CITY_NAME", T.StringType(), True),
        T.StructField("COUNTRY", T.StringType(), True),
        T.StructField("AVG_TEMPERATURE_AIR_2M_F", T.DoubleType(), True),
        T.StructField("MIN_TEMPERATURE_AIR_2M_F", T.DoubleType(), True),
        T.StructField("MAX_TEMPERATURE_AIR_2M_F", T.DoubleType(), True),
        T.StructField("AVG_HUMIDITY_RELATIVE_2M_PCT", T.DoubleType(), True),
        T.StructField("AVG_PRESSURE_2M_MB", T.DoubleType(), True),
        T.StructField("AVG_WIND_SPEED_10M_MPH", T.DoubleType(), True),
        T.StructField("AVG_CLOUD_COVER_TOT_PCT", T.DoubleType(), True),
        T.StructField("TOT_PRECIPITATION_IN", T.DoubleType(), True),
        T.StructField("TOT_SNOWFALL_IN", T.DoubleType(), True),
        T.StructField("PROBABILITY_OF_PRECIPITATION_PCT", T.DoubleType(), True),
        T.StructField("PROBABILITY_OF_SNOW_PCT", T.DoubleType(), True),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata. The
# decode step is environment-gated (image/audio libs absent here); the
# Spark-side plumbing (schema, partitioning, Arrow batching) is real.
MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)
