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


def test_real_frame_sampling_uses_imageio_when_importable(monkeypatch):
    """fake=False video sampling must route through imageio's pyav plugin
    when it imports — exercised with a stub module (the container lacks
    imageio/ffmpeg); frames must come from imiter+imwrite, not the fake."""
    import sys
    import types

    from instructions_mr_spark.operators.multimodal import _sample_frames_one

    calls: dict[str, list] = {"imiter": [], "imwrite": []}

    def _imiter(payload, plugin=None):
        calls["imiter"].append((payload, plugin))
        yield from ["f0", "f1", "f2", "f3", "f4"]

    def _imwrite(uri, frame, extension=None):
        calls["imwrite"].append((uri, frame, extension))
        return b"png:" + frame.encode()

    v3 = types.ModuleType("imageio.v3")
    v3.imiter, v3.imwrite = _imiter, _imwrite
    pkg = types.ModuleType("imageio")
    pkg.v3 = v3
    monkeypatch.setitem(sys.modules, "imageio", pkg)
    monkeypatch.setitem(sys.modules, "imageio.v3", v3)

    out = _sample_frames_one(b"videobytes", every_n=2, fake=False)
    assert out == [(0, b"png:f0"), (2, b"png:f2"), (4, b"png:f4")]
    assert calls["imiter"] == [(b"videobytes", "pyav")]
    assert all(ext == ".png" for _, _, ext in calls["imwrite"])
    # and the fake path stays imageio-independent (different output shape)
    fake = _sample_frames_one(b"videobytes", every_n=2, fake=True)
    assert fake and fake != out


def test_real_frame_sampling_without_lib_raises(monkeypatch):
    """Without imageio importable, fake=False must be a clear
    NotImplementedError — never a silent fallback to the fake."""
    import builtins
    import sys

    from instructions_mr_spark.operators.multimodal import _sample_frames_one

    monkeypatch.delitem(sys.modules, "imageio", raising=False)
    monkeypatch.delitem(sys.modules, "imageio.v3", raising=False)
    orig_import = builtins.__import__

    def no_imageio(name, *a, **kw):
        if name.startswith("imageio"):
            raise ImportError(name)
        return orig_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_imageio)
    with pytest.raises(NotImplementedError, match="imageio"):
        _sample_frames_one(b"videobytes", every_n=2, fake=False)


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
