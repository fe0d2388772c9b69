"""End-to-end training-data curation pipeline composed from the
engine's own operators — the program a user runs nightly over a
document lake, here demonstrated on the synthetic testdata.

Stages (each one a registry-backed, oracle-checked operator):

  1. quality gates      quality_filter_gopher + quality_blocklist_hits
  2. exact dedup        normalized digest keeper (dedup_exact_normalized)
  3. near-dup dedup     MinHash-LSH pairs -> connected components ->
                        keep each cluster's longest member (cluster_rep_best)
  4. domain weighting   DSIR importance weights (dsir_importance_weights)
  5. packing            boundary-splitting sequence packing (pack_quantized)
  6. reporting          per-source funnel + dataset manifest

Usage:
    python examples/curation_pipeline.py [sf_dir] [out_dir]

Every stage is a DataFrame -> DataFrame composition: Catalyst sees the
whole program, so gates push into the scan and only ids/digests move
through the dedup shuffles.  At 100 TB, swap sf_dir for the lake path;
nothing else changes.
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
    spark = get_spark("curation_pipeline")
    q = registry.QUERIES

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_total = docs.count()

    # -- 1. quality gates (pure scan projections; AND of both verdicts)
    gopher = q["quality_filter_gopher"](spark, sf_dir).select("doc_id", "keep")
    blocklist = q["quality_blocklist_hits"](spark, sf_dir).select(
        "doc_id", "flagged"
    )
    gated = (
        gopher.join(blocklist, "doc_id")
        .filter(F.col("keep") & ~F.col("flagged"))
        .select("doc_id")
    )

    # -- 2. exact dedup (normalized digest; keep the group keeper)
    exact_keep = q["dedup_exact_normalized"](spark, sf_dir).select(
        F.col("kept_doc_id").alias("doc_id")
    )

    admitted = gated.join(exact_keep, "doc_id")  # gate AND exact-keeper

    # -- 3. near-dup dedup: drop every clustered doc except its elected
    #       (longest-member) representative.  Representatives are
    #       elected among GATE-SURVIVING members only: electing on the
    #       full corpus would let a cluster whose longest member fails
    #       a gate lose all copies of that content (the rep is gated
    #       out, every other member is a near-dup loser).
    from pyspark.sql import Window as W

    clusters = q["dedup_cluster_cc"](spark, sf_dir)
    member_len = (
        clusters.join(admitted, "doc_id")  # survivors only
        .join(docs.select("doc_id", "n_chars"), "doc_id")
    )
    rn = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        )
    )
    near_drop = (
        member_len.withColumn("rn", rn).filter(F.col("rn") > 1).select("doc_id")
    )

    survivors = admitted.join(near_drop, "doc_id", "left_anti")

    # -- 4. DSIR domain weights for the survivors
    weights = q["dsir_importance_weights"](spark, sf_dir).select(
        "doc_id", "dsir_logweight"
    )
    weighted = survivors.join(weights, "doc_id", "left")

    # -- 5. pack survivors into training sequences (per-source stripes)
    packed = q["pack_quantized"](spark, sf_dir).join(survivors, "doc_id")

    # -- 6. persist + report
    out_docs = (
        docs.join(weighted, "doc_id")
        .select("doc_id", "source", "lang", "n_chars", "dsir_logweight")
    )
    out_docs.write.mode("overwrite").parquet(os.path.join(out_dir, "survivors"))
    packed.write.mode("overwrite").parquet(os.path.join(out_dir, "packed"))

    funnel = {
        "total": n_total,
        "after_quality_gates": gated.count(),
        "after_exact_dedup": gated.join(exact_keep, "doc_id").count(),
        "survivors": survivors.count(),
        "packed_rows": packed.count(),
    }
    return funnel


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_out"
    funnel = run(sf_dir, out_dir)
    for stage, n in funnel.items():
        print(f"{stage:>22}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
