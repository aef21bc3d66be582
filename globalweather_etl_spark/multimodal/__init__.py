"""Multimodal columns (north-star extension surface).

Pattern: media payloads are opaque `binary` columns with a typed
metadata struct alongside — the layout a 100 TB training-data lake uses
(payload bytes in parquet, metadata queryable without touching bytes).
Decode / feature-extraction run as Arrow-batched Pandas UDFs over
mapInPandas; the actual image/audio codecs are STUBBED in this
container (no PIL/ffmpeg) behind import-gates, while the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested.
"""

from globalweather_etl_spark.multimodal.features import (
    byte_histogram,
    decode_image,
    payload_digest,
    resize_images,
    sample_frames,
)
from globalweather_etl_spark.multimodal.schema import MEDIA_SCHEMA
from globalweather_etl_spark.multimodal.synthesize import media_from_documents

__all__ = [
    "MEDIA_SCHEMA",
    "byte_histogram",
    "decode_image",
    "media_from_documents",
    "payload_digest",
    "resize_images",
    "sample_frames",
]
