"""One-off audit: list every registered query whose compiled plan
contains a partitionless Window node (formatted-explain Arguments with
only [functions], [order] — no partition spec).  Feeds the allowlist in
tests/test_plans.py::test_no_global_window_outside_allowlist."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.session import get_spark


def partitionless_windows(df) -> list[str]:
    import re

    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    hits = []
    for section in formatted.split("\n\n"):
        lines = section.strip().splitlines()
        if not lines or "Window" not in lines[0]:
            continue
        head = lines[0].strip()
        arg = next(
            (ln[len("Arguments: "):] for ln in lines if ln.startswith("Arguments: ")),
            "",
        )
        if "WindowGroupLimit" in head:
            # Arguments: [partitionSpec], [orderSpec], rankFn, k, mode
            if arg.startswith("[], ["):
                hits.append(head)
        else:
            # windowspecdefinition(partCols..., orderCols..., frame):
            # partitionless iff the FIRST argument is already an order
            # entry (has ASC/DESC) or the frame itself
            for m in re.finditer(r"windowspecdefinition\(", arg):
                first = arg[m.end():].split(",", 1)[0]
                if (
                    "specifiedwindowframe" in first
                    or " ASC" in first
                    or " DESC" in first
                ):
                    hits.append(head)
                    break
    return hits


SKIP = {
    "dedup_cluster_cc", "dedup_cluster_cc_star", "sim_search_ivf_kmeans",
    "graph_pagerank",
}


def main() -> None:
    registry.load_all()
    spark = get_spark()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(registry.QUERIES)
    flagged = {}
    for name in names:
        if name in SKIP:
            continue
        try:
            hits = partitionless_windows(registry.QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            continue
        if hits:
            flagged[name] = hits
            print(f"FLAG  {name}: {hits}")
    print(f"\nTOTAL flagged: {len(flagged)}")
    print(sorted(flagged))


if __name__ == "__main__":
    main()
