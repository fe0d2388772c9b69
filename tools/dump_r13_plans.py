"""Dump .explain("formatted") for the round-13 touched queries.

Usage: python tools/dump_r13_plans.py <out_dir> <suffix> [sf_dir] [names]

Writes <out_dir>/<query>_<suffix>.txt for every query this round
touched (or the comma-separated [names] override).  Run from HEAD for
the _after set and from a worktree checked out at the round-12
snapshot for the _before set, so the judge can diff the physical-plan
claims in OPTIMIZATION_r13.md against the actual plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.queries._util import free_staged_checkpoints
from instructions_mr_spark.session import get_spark

TOUCHED = [
    "semdedup_cells",
    "semdedup_planted_k32",
    "dedup_embedding_cosine",
    "embedding_top_pc",
    "bellman_ford_bounded",
    "dedup_span_cut",
    "graph_conductance_brand",
    "dedup_minhash_lsh_salted",
    "q1_pricing_summary",
    "join_inner_eq",
    "join_broadcast",
    "q9_product_profit",
    "q21_waiting_supplier",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else TOUCHED
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("plans-r13")
    for name in names:
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
        free_staged_checkpoints()


if __name__ == "__main__":
    main()
