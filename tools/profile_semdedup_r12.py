"""Stage-wise decomposition of semdedup_cells at sf0.1 (round 12,
optimization session 5).

Replicates the query body with a timer around each materialization
boundary so the ~4.8 s closing number can be attributed:
  (1) count()           -- the k dial
  (2) train_ivf_centroids (driver-side Lloyd's at head)
  (3) prescreen-sig checkpoint (the supersede_checkpoint job)
  (4) cell self-join + hamming screen + DISTINCT (noop)
  (5) pairs checkpoint (join-back + cosine filter)
  (6) audit self-join agg
  (7) the full declared query, min of 3 (reference)

Timings print to stdout; run on an otherwise idle box.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from instructions_mr_spark import registry
from instructions_mr_spark.queries._util import (
    free_staged_checkpoints,
    supersede_checkpoint,
    t,
)
from instructions_mr_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("profile-semdedup-r12")
    registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    from instructions_mr_spark.operators.simsearch import (
        assign_topm_cells,
        train_ivf_centroids,
    )
    from instructions_mr_spark.queries.llm_pipeline import (
        _SEM_COS_T,
        _SEM_SCREEN_BITS,
        _SEM_SCREEN_MIN,
        _SEMDEDUP_CELL_TARGET,
        _SEMDEDUP_K,
        _SEMDEDUP_TOPM,
        _audit_mod,
        _cosine_prenorm,
        _norm_col,
        _prescreen_sigs,
    )

    for rep in range(2):
        marks: list[tuple[str, float]] = []

        def mark(label: str, t0: float) -> None:
            marks.append((label, time.time() - t0))

        e = t(spark, sf_dir, "embeddings")

        t0 = time.time()
        n = e.count()
        mark("1 count", t0)

        k_eff = max(_SEMDEDUP_K, n // _SEMDEDUP_CELL_TARGET)

        t0 = time.time()
        cents = train_ivf_centroids(e, k=k_eff, seed=42)
        mark("2 train_ivf_centroids", t0)

        t0 = time.time()
        sigs = supersede_checkpoint("semdedup_screen_sigs", _prescreen_sigs(e))
        mark("3 sig checkpoint", t0)

        cells = (
            assign_topm_cells(e, cents, m=_SEMDEDUP_TOPM)
            .select("cell", "vec_id")
            .join(sigs, "vec_id")
        )
        a, b = cells.alias("a"), cells.alias("b")
        hamming_ok = F.expr(
            f"{_SEM_SCREEN_BITS} - "
            + " - ".join(f"bit_count(a.s{w} ^ b.s{w})" for w in range(4))
            + f" >= {_SEM_SCREEN_MIN}"
        )
        screened = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.vec_id") < F.col("b.vec_id"))
                & hamming_ok,
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .distinct()
        )
        t0 = time.time()
        noop(screened)
        mark("4 screened distinct (noop)", t0)

        ea = e.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("ea"),
            _norm_col(F.col("embedding")).alias("na"),
        )
        eb = e.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("eb"),
            _norm_col(F.col("embedding")).alias("nb"),
        )
        pairs_plan = (
            screened.join(ea, "vec_a")
            .join(eb, "vec_b")
            .select(
                "vec_a",
                "vec_b",
                _cosine_prenorm(
                    F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
                ).alias("cos"),
            )
            .filter(F.col("cos") >= _SEM_COS_T)
        )
        t0 = time.time()
        pairs = supersede_checkpoint("semdedup_pairs", pairs_plan)
        mark("5 pairs checkpoint", t0)

        s = e.filter(F.col("vec_id") % _audit_mod(n) == 0)
        s = s.withColumn("nrm", _norm_col(F.col("embedding")))
        sa, sb = s.alias("sa"), s.alias("sb")
        audit = (
            sa.join(sb, F.col("sa.vec_id") < F.col("sb.vec_id"))
            .select(
                F.col("sa.vec_id").alias("vec_a"),
                F.col("sb.vec_id").alias("vec_b"),
                _cosine_prenorm(
                    F.col("sa.embedding"), F.col("sb.embedding"),
                    F.col("sa.nrm"), F.col("sb.nrm"),
                ).alias("cos"),
            )
            .filter(F.col("cos") >= _SEM_COS_T)
        )
        t0 = time.time()
        audit.agg(F.count("*")).collect()
        mark("6 audit agg (one evaluation)", t0)

        found = audit.join(
            pairs.select("vec_a", "vec_b"), ["vec_a", "vec_b"], "left_semi"
        )
        t0 = time.time()
        found.agg(F.count("*")).collect()
        mark("6b audit semi-join (second evaluation)", t0)

        free_staged_checkpoints()

        print(f"--- rep {rep} ---")
        for label, dt in marks:
            print(f"  {label:44s} {dt:7.3f}s")
        print(f"  {'SUM':44s} {sum(dt for _, dt in marks):7.3f}s")

    # reference: the declared query end-to-end, min of 3
    fn = registry.QUERIES["semdedup_cells"]
    best = []
    for _ in range(3):
        t0 = time.time()
        noop(fn(spark, sf_dir))
        best.append(time.time() - t0)
        free_staged_checkpoints()
    print(f"full declared query: runs={['%.3f' % x for x in best]} "
          f"min={min(best):.3f}s")


if __name__ == "__main__":
    main()
