"""Media table schema: opaque payload + typed metadata struct."""

from __future__ import annotations

from pyspark.sql import types as T

MEDIA_METADATA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),        # images/video
        T.StructField("height", T.IntegerType()),       # images/video
        T.StructField("channels", T.IntegerType()),     # images/audio
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("n_frames", T.IntegerType()),     # video/audio
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA),
    ]
)
