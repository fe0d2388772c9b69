"""Round-12 session A/B helper: time + snapshot exact results for the
queries touched by the unrolled-kernel change.

Usage: python tools/ab_kernels_r12.py <tag>
Writes /tmp/ab_<tag>_results.pkl {name: [row tuples as repr strings]}
and /tmp/ab_<tag>_times.json {name: min-of-3 noop sec}.
Run once on the working tree and once under `git stash` with another
tag, then compare with tools/ab_compare.py semantics (inline below).
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.queries._util import free_staged_checkpoints
from instructions_mr_spark.session import get_spark

NAMES = [
    "sim_search_topk", "sim_search_ivf", "ann_recall_at_k",
    "ann_recall_multiprobe", "embedding_pair_cosine",
    "dedup_embedding_cosine", "sim_search_pq", "semdedup_cells",
    "semdedup_planted_k32", "knn_join_batch", "neardup_threshold_curve",
    "ann_recall_truncated_dims", "knn_label_vote_accuracy",
    "triplet_margin_stats", "mmr_diverse_topk", "hard_negative_topk",
    "semdedup_eps_sweep", "sim_search_ivf_kmeans",
]


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("ab_kernels")
    registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    times: dict[str, float] = {}
    results: dict[str, list[str]] = {}
    for name in NAMES:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            free_staged_checkpoints()
        times[name] = round(min(runs), 3)
        rows = fn(spark, sf_dir).collect()
        free_staged_checkpoints()
        # repr round-trips doubles exactly: bit-level comparison
        results[name] = sorted(repr(tuple(r)) for r in rows)
        print(f"# {name}: {times[name]:.3f}s  ({len(rows)} rows)", file=sys.stderr)
    with open(f"/tmp/ab_{tag}_times.json", "w") as fh:
        json.dump(times, fh, indent=1)
    with open(f"/tmp/ab_{tag}_results.pkl", "wb") as fh:
        pickle.dump(results, fh)


if __name__ == "__main__":
    main()
