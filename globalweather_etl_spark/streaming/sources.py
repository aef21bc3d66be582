"""Streaming sources.

The landing-zone analogue of the reference's marketplace share (ETL:17-19)
for streams: a directory that parquet files keep arriving in. Spark's
file source tracks processed files in the checkpoint, giving exactly-once
ingestion without a broker; swap in readStream.format("kafka") unchanged
downstream when a broker exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Explicit schema — streaming file sources cannot infer (a stream has no
# "first batch to sample"), and a fixed schema is what we want anyway.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_from_dir(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open the events landing directory as an unbounded stream.

    max_files_per_trigger bounds each micro-batch (backpressure); None
    lets availableNow/once triggers drain everything in one batch.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def jsonl_stream_from_dir(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a JSONL landing directory as an unbounded stream — the
    streaming twin of sources.formats.read_jsonl, for corpora that
    arrive as line-delimited JSON drops. Explicit schema (streams
    cannot infer); file tracking in the checkpoint gives exactly-once
    ingestion; corrupt lines surface as all-NULL rows under PERMISSIVE
    (the streaming reader cannot carry a corrupt-record column across
    micro-batches, so strictness is per-job: count NULL keys
    downstream or run a batch read_jsonl audit over the same dir)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(landing_dir)
