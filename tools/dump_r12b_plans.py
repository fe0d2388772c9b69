"""Dump .explain("formatted") for the round-12 session-5 touched
queries (the copurchase basket rewrite, the oriented-checkpoint split,
and the semdedup single-pass audit).

Usage: python tools/dump_r12b_plans.py <out_dir> <suffix> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.queries._util import free_staged_checkpoints
from instructions_mr_spark.session import get_spark

TOUCHED = [
    "copurchase_pairs",
    "copurchase_lift",
    "graph_resource_allocation",
    "graph_conductance_brand",
    "graph_hits_unnormalized",
    "degree_assortativity_terms",
    "graph_link_prediction",
    "bellman_ford_bounded",
    "semdedup_cells",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("plans-r12b")
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
        free_staged_checkpoints()


if __name__ == "__main__":
    main()
