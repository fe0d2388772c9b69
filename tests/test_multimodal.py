"""Tests for the multimodal binary-column plumbing (decode is stubbed;
the Spark-side schema/batch mechanics are real)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from instructions_mr_spark.operators.multimodal import (
    binary_metadata,
    decode_images,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"jpegdata" * 10),
        (2, b"\x89PNG\r\n" + b"pngdata" * 5),
        (3, b"RIFFxxxxWAVE" + b"audio" * 20),
        (4, b"plain bytes"),
    ]
    return spark.createDataFrame(rows, "media_id int, payload binary")


def test_magic_sniff_and_size(spark, media):
    out = {r.media_id: r.meta for r in binary_metadata(media, "payload").collect()}
    assert out[1].format == "jpeg"
    assert out[2].format == "png"
    assert out[3].format == "riff"
    assert out[4].format == "unknown"
    assert out[4].n_bytes == len(b"plain bytes")
    assert len(out[1].sha1) == 40  # hex digest, no decode needed


def test_decode_requires_fake_flag(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        decode_images(media, "payload", fake=False).collect()


def test_fake_decode_is_deterministic(spark, media):
    a = {r.media_id: (r.width, r.height) for r in decode_images(media, "payload", fake=True).collect()}
    b = {r.media_id: (r.width, r.height) for r in decode_images(media, "payload", fake=True).collect()}
    assert a == b
    assert all(1 <= w <= 1920 and 1 <= h <= 1080 for w, h in a.values())


def test_decode_appends_to_schema(spark, media):
    out = decode_images(media, "payload", fake=True)
    assert out.columns == ["media_id", "payload", "width", "height"]


def test_frame_sampling_explodes_rows(spark, media):
    frames = sample_frames(media, "payload", "media_id", every_n=10, fake=True)
    rows = frames.collect()
    assert len(rows) > len(media.collect())  # one row per sampled frame
    assert frames.columns == ["media_id", "frame_idx", "frame"]
    by_id = [r for r in rows if r.media_id == 3]
    assert [r.frame_idx for r in by_id] == sorted(r.frame_idx for r in by_id)
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in rows)
