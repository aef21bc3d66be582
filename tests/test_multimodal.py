"""Multimodal operators: Spark plumbing checked against plain-Python
reference computations on the same payload bytes."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from globalweather_etl_spark.multimodal import (
    MEDIA_SCHEMA,
    byte_histogram,
    decode_image,
    media_from_documents,
    payload_digest,
    resize_images,
    sample_frames,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(load_table(spark, SF_DIR, "documents"))


@pytest.fixture(scope="module")
def docs_by_id(spark):
    rows = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    return {r["doc_id"]: r["text"] for r in rows}


def test_media_schema(media):
    # simpleString ignores nullability flags, which differ between
    # createDataFrame-declared and expression-derived columns.
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()


def test_payload_digest_matches_hashlib(media, docs_by_id):
    got = {r["media_id"]: r for r in payload_digest(media).collect()}
    for doc_id, text in list(docs_by_id.items())[:20]:
        raw = text.encode("utf-8")
        assert got[doc_id]["digest"] == hashlib.md5(raw).hexdigest()
        assert got[doc_id]["n_bytes"] == len(raw)


def test_byte_histogram_matches_numpy(media, docs_by_id):
    got = {r["media_id"]: r["histogram"] for r in byte_histogram(media, 16).collect()}
    assert set(got) == set(docs_by_id)
    for doc_id, text in list(docs_by_id.items())[:20]:
        raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        want = np.bincount(raw >> 4, minlength=16).tolist()
        assert got[doc_id] == want
        assert sum(got[doc_id]) == len(raw)


def test_sample_frames_slices_payload(spark, media, docs_by_id):
    frames = sample_frames(media, every_k=4).collect()
    assert frames, "expected at least one video frame"
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for media_id, rows in list(by_media.items())[:10]:
        raw = docs_by_id[media_id].encode("utf-8")
        n_frames = len(docs_by_id[media_id]) // 16
        size = max(1, len(raw) // n_frames)
        assert [r["frame_index"] for r in sorted(rows, key=lambda r: r["frame_index"])] == list(
            range(0, n_frames, 4)
        )
        for r in rows:
            fi = r["frame_index"]
            assert bytes(r["frame"]) == raw[fi * size : (fi + 1) * size]


def test_decode_image_fake_path(media, docs_by_id):
    out = decode_image(media, fake=True).collect()
    assert out
    for r in out[:10]:
        raw = np.frombuffer(docs_by_id[r["media_id"]].encode("utf-8"), dtype=np.uint8)
        assert r["mean_intensity"] == pytest.approx(float(raw.mean()))
        assert r["media_id"] % 3 == 0  # images are doc_id % 3 == 0
        assert r["width"] == (r["media_id"] % 64 + 16) * 16


def test_real_codec_paths_are_marked_stubs(media):
    from globalweather_etl_spark.multimodal import features

    if features._HAS_PIL:
        pytest.skip("PIL present: real decode is live, stub contract n/a")
    with pytest.raises(NotImplementedError):
        decode_image(media, fake=False)
    with pytest.raises(NotImplementedError):
        resize_images(media, 224, 224)


def test_decode_image_real_path_with_pil(spark):
    """Gate check for the real-codec path: when PIL ships, fake=False must
    decode actual image bytes through the same mapInPandas plumbing with
    no code changes. Skipped where the container has no codec (here);
    passes unchanged in any environment that installs Pillow."""
    from globalweather_etl_spark.multimodal import features

    if not features._HAS_PIL:
        pytest.skip("PIL not installed in this container")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((8, 6, 3), 200, dtype=np.uint8)).save(buf, "PNG")
    row = {
        "media_id": 1,
        "kind": "image",
        "payload": buf.getvalue(),
        "metadata": {
            "mime": "image/png",
            "width": 6,
            "height": 8,
            "channels": 3,
            "sample_rate": None,
            "n_frames": 1,
        },
    }
    df = spark.createDataFrame([row], schema=MEDIA_SCHEMA)
    out = decode_image(df, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"], r["channels"]) == (8, 6, 3)
    assert r["mean_intensity"] == pytest.approx(200.0)
