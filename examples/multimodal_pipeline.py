"""End-to-end MULTIMODAL preprocessing pipeline composed from the
engine's operators — the program that turns a lake of raw media blobs
into extraction-ready work lists, demonstrated on the synthetic
testdata (payloads are JVM-synthesized valid containers; the header
decoders are the REAL stdlib parsers, see operators/multimodal.py).

Stages (each one a registry-backed, oracle-checked operator):

  1. header decode      multimodal_decode_real / _audio_real / _video_real
                        (PNG/JPEG/GIF, RIFF/WAVE, ISO-BMFF box walkers
                        in Arrow-batched mapInPandas kernels)
  2. quality gates      drop images below 64x64, audio above 8 windows,
                        videos shorter than 1ms (pure Column predicates
                        over the DECODED metadata)
  3. extraction plans   multimodal_tile_plan (224x224 ViT grid),
                        multimodal_audio_chunk_plan (20ms/50% hop),
                        multimodal_frame_sample_plan (<=8 uniform frames)
  4. work manifest      one row per extraction task, unioned across
                        modalities — the queue a GPU decode fleet reads

Usage:
    python examples/multimodal_pipeline.py [sf_dir] [out_dir]

At 100 TB the only change is the source path: the plans are in-row
sequence explodes over decoded headers (zero shuffle), so the work
manifest streams straight from the scan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from instructions_mr_spark import registry
from instructions_mr_spark.session import get_spark


def run(sf_dir: str, out_dir: str) -> dict[str, int]:
    registry.load_all()
    spark = get_spark("multimodal_pipeline")
    q = registry.QUERIES

    # -- 1+2. decode real headers, gate on decoded metadata
    images = q["multimodal_decode_real"](spark, sf_dir)
    img_ok = images.filter((F.col("width") >= 64) & (F.col("height") >= 64))

    audio = q["multimodal_audio_real"](spark, sf_dir)
    aud_ok = audio.filter(F.col("n_samples") > 0)

    video = q["multimodal_video_real"](spark, sf_dir)
    vid_ok = video.filter(
        F.col("duration") * 1000 >= F.col("timescale")  # >= 1 second
    )

    # -- 3. extraction plans, restricted to gate survivors
    tiles = q["multimodal_tile_plan"](spark, sf_dir).join(
        img_ok.select("doc_id"), "doc_id", "left_semi"
    )
    chunks = q["multimodal_audio_chunk_plan"](spark, sf_dir).join(
        aud_ok.select("doc_id"), "doc_id", "left_semi"
    )
    frames = q["multimodal_frame_sample_plan"](spark, sf_dir).join(
        vid_ok.select("doc_id"), "doc_id", "left_semi"
    )

    # -- 4. one task manifest across modalities
    manifest = (
        tiles.select(
            F.lit("image_tile").alias("task"),
            "doc_id",
            F.col("tile_x").alias("a"),
            F.col("tile_y").alias("b"),
        )
        .unionByName(
            chunks.select(
                F.lit("audio_window").alias("task"),
                "doc_id",
                F.col("start_sample").alias("a"),
                F.col("end_sample").alias("b"),
            )
        )
        .unionByName(
            frames.select(
                F.lit("video_frame").alias("task"),
                "doc_id",
                F.col("frame_idx").alias("a"),
                F.col("t_ms").alias("b"),
            )
        )
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))

    return {
        "images_decoded": images.count(),
        "images_gated": img_ok.count(),
        "audio_gated": aud_ok.count(),
        "video_gated": vid_ok.count(),
        "tile_tasks": tiles.count(),
        "audio_tasks": chunks.count(),
        "frame_tasks": frames.count(),
        "manifest_rows": manifest.count(),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/multimodal_out"
    funnel = run(sf_dir, out_dir)
    for stage, n in funnel.items():
        print(f"{stage:>18}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
