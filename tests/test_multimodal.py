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


def test_real_decode_uses_pil_when_importable(monkeypatch):
    """fake=False must route through PIL when it imports (the optional
    real path) — exercised with a stub PIL module since the container
    lacks pillow; the dims must come from Image.open, not the fake."""
    import io
    import sys
    import types

    from instructions_mr_spark.operators.multimodal import _decode_one

    class _FakeImage:
        width, height = 640, 480

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    opened_with: list[bytes] = []

    def _open(buf):
        assert isinstance(buf, io.BytesIO)
        opened_with.append(buf.getvalue())
        return _FakeImage()

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=_open)
    monkeypatch.setitem(sys.modules, "PIL", pil)
    assert _decode_one(b"imagebytes", fake=False) == (640, 480)
    assert opened_with == [b"imagebytes"]
    # and the fake path stays PIL-independent
    assert _decode_one(b"imagebytes", fake=True) != (640, 480)


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
