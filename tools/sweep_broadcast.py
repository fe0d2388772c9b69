"""Broadcast-threshold sweep: time the join-heavy headline queries
under several ``spark.sql.autoBroadcastJoinThreshold`` settings.

ROUND-9 POLICY INVERSION: sf-scaling dims (supplier/part/customer)
are deliberately hint-FREE (a forced hint is a deterministic OOM once
the dim outgrows memory — tools/broadcast_guard.py bans it), so their
joins now FOLLOW the threshold: at ``-1`` they demote to shuffle
joins (slower here, and exactly what must happen at 100 TB when the
dim is measured big), at the default they broadcast.  Only the
genuinely bounded nation/region hints stay threshold-immune.  A flat
curve is therefore NO LONGER the pass criterion; this sweep now
documents that the engine adapts instead of betting the cluster on a
hint.

Usage: python tools/sweep_broadcast.py [sf_dir]
Prints one JSON line per threshold.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.session import get_spark

QUERIES = ["join_broadcast", "q9_product_profit", "q5_local_supplier", "q21_waiting_supplier"]
THRESHOLDS = ["-1", "1048576", "10485760"]  # off / 1 MB / 10 MB (default)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark("sweep_broadcast")
    registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()  # warmup

    for thr in THRESHOLDS:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", thr)
        timings: dict[str, float] = {}
        for name in QUERIES:
            best = None
            for _ in range(2):
                t0 = time.time()
                registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        print(
            json.dumps(
                {
                    "threshold": thr,
                    "total_sec": round(sum(timings.values()), 3),
                    "queries": timings,
                }
            )
        )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
