"""The examples/curation_pipeline.py composition must run end-to-end
and produce a monotonically shrinking funnel with readable outputs."""

from __future__ import annotations

import os
import sys


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "examples"),
    )
    import curation_pipeline

    out = str(tmp_path / "out")
    funnel = curation_pipeline.run(sf_dir, out)
    assert (
        funnel["total"]
        >= funnel["after_quality_gates"]
        >= funnel["after_exact_dedup"]
        >= funnel["survivors"]
        > 0
    )
    assert funnel["packed_rows"] == funnel["survivors"]
    survivors = spark.read.parquet(os.path.join(out, "survivors"))
    assert survivors.count() == funnel["survivors"]
    assert set(survivors.columns) == {
        "doc_id", "source", "lang", "n_chars", "dsir_logweight"
    }
    packed = spark.read.parquet(os.path.join(out, "packed"))
    assert "bin" in packed.columns or "bin_id" in packed.columns


def test_retrieval_eval_recall_floors(spark, sf_dir):
    """The ANN eval harness must run end-to-end and report sane
    recall: PQ with exact re-rank near-exact, IVF (n_probe=4 of 8
    cells on uniform-random vectors) above the 4/8 mass floor."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples")
    )
    import retrieval_eval

    out = retrieval_eval.run(sf_dir, k=10, n_probes=4)
    assert out["pq"] >= 0.9
    assert out["ivf"] >= 0.4
    assert out["ivf"] <= 1.0 and out["pq"] <= 1.0


def test_web_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "examples"),
    )
    import web_curation_pipeline

    out = str(tmp_path / "web_out")
    funnel = web_curation_pipeline.run(sf_dir, out)
    assert (
        funnel["total"]
        >= funnel["after_robots"]
        >= funnel["after_url_and_domain"]
        >= funnel["after_span_cut"]
        == funnel["survivors"]
        > 0
    )
    # the robots stage must actually block something on this corpus
    assert funnel["after_robots"] < funnel["total"]
    survivors = spark.read.parquet(os.path.join(out, "web_survivors"))
    assert survivors.count() == funnel["survivors"]
    assert {"doc_id", "source", "domain", "n_tokens", "n_kept", "boost"} <= set(
        survivors.columns
    )


def test_recsys_training_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """Composition pins: every positive has a label-1 row, negatives
    never collide with positives, the split is entity-disjoint by
    customer, and the output parquet round-trips."""
    from examples.recsys_training_pipeline import run

    out = str(tmp_path / "recsys")
    stats = run(sf_dir, out)
    assert stats["positives"] > 0
    assert 0 < stats["negatives"] <= 2 * stats["positives"]
    assert stats["rows"] == stats["positives"] + stats["negatives"]
    assert stats["train"] + stats["valid"] == stats["rows"]
    df = spark.read.parquet(f"{out}/recsys_training")
    assert df.count() == stats["rows"]
    # entity-disjoint: no customer appears in both splits
    both = (
        df.select("cust", "split").distinct()
        .groupBy("cust").count().filter("count > 1").count()
    )
    assert both == 0
    # a labeled pair is never both positive and negative
    dup = df.groupBy("cust", "part").count().filter("count > 1")
    assert dup.count() == 0


def test_multimodal_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The multimodal manifest pipeline must decode every synthesized
    payload, gate on DECODED metadata, and emit one task row per
    planned tile/window/frame — with the manifest total equal to the
    sum of its modality parts."""
    from examples.multimodal_pipeline import run

    funnel = run(sf_dir, str(tmp_path / "mm"))
    assert funnel["images_decoded"] > 0
    assert 0 < funnel["images_gated"] <= funnel["images_decoded"]
    assert funnel["manifest_rows"] == (
        funnel["tile_tasks"] + funnel["audio_tasks"] + funnel["frame_tasks"]
    )
    # plans only cover gate survivors
    assert funnel["tile_tasks"] >= funnel["images_gated"]  # >=1 tile each
