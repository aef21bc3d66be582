"""Feature extraction over binary media columns.

Two tiers:
- Metadata/byte-level expressions (payload_digest) — pure Columns,
  JVM-side, oracle-checkable.
- Batch decode/transform (byte_histogram, sample_frames, decode_image,
  resize_images) — Arrow-batched mapInPandas: each Python worker
  receives pandas DataFrames of a few thousand rows, loops NumPy-side,
  and yields result frames. This is THE pattern for codec work at
  100 TB: partition-parallel, no driver involvement, batch-amortized
  Python overhead. Codecs themselves (PIL/ffmpeg) are absent in this
  container, so decode/resize STUB the codec call behind an import-gate
  (deterministic fake or NotImplementedError) while exercising the real
  plumbing: schemas, batches, metadata flow.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.partitioning import spread_for_compute

try:  # pragma: no cover - PIL is not installed in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def payload_digest(media: DataFrame) -> DataFrame:
    """Byte-level identity features without decoding: md5 + size.
    Pure expressions — runs in the scan stage, oracle-checkable."""
    return media.select(
        "media_id",
        "kind",
        F.md5("payload").alias("digest"),
        F.octet_length("payload").alias("n_bytes"),
    )


def byte_histogram(media: DataFrame, bins: int = 16) -> DataFrame:
    """Per-payload byte-value histogram (bins buckets over 0..255) —
    the canonical 'cheap content feature' for corrupt-file detection
    and near-dup triage of binaries. NumPy bincount per row inside
    Arrow batches."""
    if bins <= 0 or 256 % bins:
        raise ValueError("bins must be a positive divisor of 256")
    shift = (256 // bins).bit_length() - 1

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = [
                np.bincount(
                    np.frombuffer(p, dtype=np.uint8) >> shift, minlength=bins
                ).astype("int64")
                if p is not None and len(p)
                else np.zeros(bins, dtype="int64")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "histogram": [h.tolist() for h in hists]}
            )

    return spread_for_compute(media).mapInPandas(
        _hist, schema="media_id long, histogram array<long>"
    )


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for 'video' payloads: split the payload into
    metadata.n_frames equal byte-slices ('frames') and keep every k-th
    — one output row per kept frame. Deterministic stand-in for a real
    ffmpeg keyframe extractor with identical dataflow shape (explode-like
    fan-out from one binary to many)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                # NULL n_frames arrives as NaN (truthy!) after the
                # Arrow->pandas conversion of a nullable int column.
                if payload is None or pd.isna(n_frames) or not n_frames:
                    continue
                size = max(1, len(payload) // int(n_frames))
                for fi in range(0, int(n_frames), every_k):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(payload[fi * size : (fi + 1) * size]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("metadata.n_frames").alias("n_frames")
    )
    return spread_for_compute(vids).mapInPandas(
        _sample, schema="media_id long, frame_index int, frame binary"
    )


def decode_image(media: DataFrame, fake: bool | None = None) -> DataFrame:
    """Decode image payloads to (height, width, channels, mean_intensity).

    fake=None (the default) picks the real PIL path when the codec is
    importable, else the deterministic fake: dimensions from metadata,
    intensity = byte mean — same schema, same batch shape, same
    partitioning. fake=False with PIL present Image.opens each payload
    inside the Arrow batches (gated test in test_multimodal.py — skipped
    where the container ships no codec); fake=False without PIL raises,
    honestly, instead of decoding garbage."""
    if fake is None:
        fake = not _HAS_PIL
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode needs PIL, which this container does not "
            "ship; use fake=True for the deterministic stand-in"
        )

    if not fake:

        def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            for pdf in batches:
                ids, hs, ws, cs, means = [], [], [], [], []
                for mid, p in zip(pdf["media_id"], pdf["payload"]):
                    if p is None or not len(p):
                        continue
                    arr = np.asarray(Image.open(io.BytesIO(bytes(p))))
                    ids.append(mid)
                    hs.append(int(arr.shape[0]))
                    ws.append(int(arr.shape[1]))
                    cs.append(1 if arr.ndim == 2 else int(arr.shape[2]))
                    means.append(float(arr.astype("float64").mean()))
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "height": pd.array(hs, dtype="int32"),
                        "width": pd.array(ws, dtype="int32"),
                        "channels": pd.array(cs, dtype="int32"),
                        "mean_intensity": means,
                    }
                )

    else:

        def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                mean = [
                    float(np.frombuffer(p, dtype=np.uint8).mean()) if p is not None and len(p) else 0.0
                    for p in pdf["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "height": pdf["height"],
                        "width": pdf["width"],
                        "channels": pdf["channels"],
                        "mean_intensity": mean,
                    }
                )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.col("metadata.height").alias("height"),
        F.col("metadata.width").alias("width"),
        F.col("metadata.channels").alias("channels"),
    )
    return spread_for_compute(imgs).mapInPandas(
        _decode,
        schema="media_id long, height int, width int, channels int, "
        "mean_intensity double",
    )


def resize_images(
    media: DataFrame, width: int, height: int
) -> DataFrame:  # pragma: no cover - stub
    """STUB: real resize requires an image codec (PIL/opencv), absent in
    this container. Kept as an explicit NotImplementedError so the API
    surface and its intended mapInPandas shape are documented."""
    raise NotImplementedError(
        "resize_images needs PIL/opencv; implement as mapInPandas over "
        "MEDIA_SCHEMA exactly like decode_image once a codec is available"
    )
