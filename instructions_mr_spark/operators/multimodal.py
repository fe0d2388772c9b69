"""Multimodal column plumbing (BASELINE mandate): image/audio/video as
opaque ``binary`` columns with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic fake decoder so the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is fully real and tested.  Swapping in PIL/ffmpeg later
only changes the body of ``_decode_one``.

Scale notes: binary payloads ride normal parquet pages; metadata
extraction is a narrow projection (never decodes); decode/resize runs
in ``mapInPandas`` so one Python worker amortizes across an Arrow
batch, and ``spark.sql.files.maxPartitionBytes`` bounds memory per
task.  Frame sampling emits rows (one per frame) — an explode-shaped
operator, so downstream filters prune frames before any heavy model.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
    ]
)


def binary_metadata(df: DataFrame, col: str, out: str = "meta") -> DataFrame:
    """Typed metadata over an opaque binary column WITHOUT decoding:
    size, digest, and a magic-bytes format sniff — all JVM-side."""
    b = F.col(col)
    fmt = (
        F.when(F.hex(F.substring(b, 1, 3)) == "FFD8FF", "jpeg")
        .when(F.hex(F.substring(b, 1, 4)) == "89504E47", "png")
        .when(F.substring(b, 1, 4).cast("string") == "RIFF", "riff")
        .otherwise("unknown")
    )
    meta = F.struct(
        fmt.alias("format"),
        F.lit(None).cast("int").alias("width"),  # filled by decode stage
        F.lit(None).cast("int").alias("height"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha1(b).alias("sha1"),
    )
    return df.withColumn(out, meta)


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int]:
    """Return (width, height).

    ``fake=True``: deterministic function of the payload's md5 digest,
    so tests are stable AND the whole mapInPandas decode path is
    oracle-checkable (DuckDB can compute the identical md5-derived
    dims in SQL — see queries/advanced.py multimodal_decode_fake).

    ``fake=False``: real decode through PIL if importable (optional
    dependency — absent from this container); otherwise a clear
    NotImplementedError, never a silent fake."""
    if fake:
        h = hashlib.md5(payload or b"").digest()
        w, ht = struct.unpack(">HH", h[:4])
        return (w % 1920) + 1, (ht % 1080) + 1
    try:
        from PIL import Image  # optional; import inside the worker
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL (pip install pillow); "
            "pass fake=True for the deterministic stub"
        ) from e
    import io

    with Image.open(io.BytesIO(payload or b"")) as im:
        return int(im.width), int(im.height)


def decode_images(
    df: DataFrame, col: str, fake: bool = False, batch_hint: int | None = None
) -> DataFrame:
    """Decode stage: fills width/height next to the payload.  Arrow
    batches stream through one Python worker per partition."""
    from instructions_mr_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    fields = list(df.schema.fields) + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
    out_schema = T.StructType(fields)
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_one(p, fake) for p in pdf[col]]
            out = pdf[in_cols].copy()
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def _sample_frames_one(payload: bytes, every_n: int, fake: bool) -> list[tuple[int, bytes]]:
    """Return [(frame_idx, frame_bytes), ...] for one video payload.

    ``fake=True``: digest-derived pseudo-frames — deterministic, library
    free, oracle-checkable.

    ``fake=False``: real decode through imageio's ffmpeg/pyav plugin if
    importable (optional dependency — absent from this container, same
    pattern as the PIL branch in :func:`_decode_one`); each sampled frame
    is re-encoded to PNG bytes so downstream stages see self-contained
    binary frames.  Otherwise a clear NotImplementedError, never a
    silent fake."""
    if fake:
        n_frames = (len(payload or b"") % 50) + every_n
        return [
            (i, hashlib.sha1((payload or b"") + bytes([i % 256])).digest())
            for i in range(0, n_frames, every_n)
        ]
    try:
        import imageio.v3 as iio  # optional; import inside the worker
    except ImportError as e:
        raise NotImplementedError(
            "real video decode requires imageio + an ffmpeg/pyav plugin "
            "(pip install imageio av); pass fake=True for the "
            "deterministic stub"
        ) from e
    out: list[tuple[int, bytes]] = []
    for i, frame in enumerate(iio.imiter(payload or b"", plugin="pyav")):
        if i % every_n == 0:
            out.append((i, bytes(iio.imwrite("<bytes>", frame, extension=".png"))))
    return out


def sample_frames(
    df: DataFrame, col: str, id_col: str, every_n: int = 10, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (id, frame_idx, frame_bytes).  The fake emits digest-derived
    pseudo-frames; ``fake=False`` routes through the optional
    imageio/pyav branch of :func:`_sample_frames_one`."""
    from instructions_mr_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[col]):
                for i, fb in _sample_frames_one(payload, every_n, fake):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(fb)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=out_schema)
