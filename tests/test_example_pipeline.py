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
