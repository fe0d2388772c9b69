"""Dump .explain("formatted") for the round-12 touched queries.

Usage: python tools/dump_r12_plans.py <out_dir> <suffix> [sf_dir]

Writes <out_dir>/<query>_<suffix>.txt for every query this round
touched.  Run from HEAD for the _after set and from a worktree checked
out at the round-11 snapshot for the _before set, so the judge can
diff the physical-plan claims in OPTIMIZATION_r12.md against the
actual plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.session import get_spark

TOUCHED = [
    "winnowing_fingerprints",
    "quality_repetition",
    "quality_bigram_logprob",
    "attribution_markov_removal",
    "semdedup_cells",
    "semdedup_planted_k32",
    "mmr_diverse_topk",
    "dedup_embedding_cosine",
    "semdedup_eps_sweep",
    "sim_search_ivf_kmeans",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("plans-r12")
    for name in TOUCHED:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"# skip {name}: not registered in this checkout")
            continue
        spark.sparkContext.setJobDescription(f"explain {name}")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
