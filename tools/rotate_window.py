"""Generate the next round's DRIVER_WINDOW + ROTATION_BACKLOG source.

Implements the ROTATION PLAN in registry.py mechanically so the window
composition stays written-down rather than ad hoc (VERDICT r10 item
#6): anchors first, then this round's changed queries, then the next
slice of the never-driver-checked backlog in its recorded age order.

Usage:
    python tools/rotate_window.py [--changed name1,name2,...] \
        [--anchors q1_pricing_summary,scope_project] [--size 50]

Prints (a) sanity counts, (b) a ready-to-paste DRIVER_WINDOW literal,
(c) the shrunken ROTATION_BACKLOG literal.  Paste both into
registry.py, update the plan-table comment, and run
tests/test_rotation_plan.py — its invariants (50 registered names,
disjoint backlog, no orphans, >= 42 first-exposure) are the gate.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_checked() -> set[str]:
    names: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        names |= set(json.load(open(f)))
    return names


def build_window(
    anchors: list[str], changed: list[str], size: int
) -> tuple[list[str], list[str], int]:
    """Return (window, remaining_backlog, n_first_exposure)."""
    from instructions_mr_spark import registry

    registry.load_all()
    checked = driver_checked()
    window: list[str] = []
    for n in anchors + changed:
        if n not in registry.QUERIES:
            raise SystemExit(f"not a registered query: {n}")
        if n not in window:
            window.append(n)
    backlog = [n for n in registry.ROTATION_BACKLOG if n not in checked]
    stale = [n for n in registry.ROTATION_BACKLOG if n in checked]
    # Re-queue orphans: names never checked AND not in the recorded
    # backlog (a prior window whose driver round died without landing
    # a CORRECTNESS file).  They were the oldest debt when windowed,
    # so they go to the FRONT of the take pool.
    orphans = [
        n for n in registry.QUERIES
        if n not in checked
        and n not in set(backlog)
        and n not in set(window)
    ]
    if orphans:
        print(f"# re-queued {len(orphans)} orphaned never-checked names "
              "(a prior window's driver round left no CORRECTNESS file)",
              file=sys.stderr)
        backlog = orphans + backlog
    take = [n for n in backlog if n not in window][: size - len(window)]
    window += take
    remaining = [n for n in backlog if n not in set(window)]
    fresh = [n for n in window if n not in checked]
    if stale:
        print(f"# struck {len(stale)} already-checked names off the backlog",
              file=sys.stderr)
    return window, remaining, len(fresh)


def fmt(name: str, names: list[str]) -> str:
    body = "\n".join(f'    "{n}",' for n in names)
    return f"{name}: list[str] = [\n{body}\n]"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--anchors", default="q1_pricing_summary,scope_project")
    ap.add_argument("--changed", default="")
    ap.add_argument("--size", type=int, default=50)
    args = ap.parse_args()
    anchors = [n for n in args.anchors.split(",") if n]
    changed = [n for n in args.changed.split(",") if n]
    window, remaining, fresh = build_window(anchors, changed, args.size)
    print(f"# window={len(window)} first_exposure={fresh} "
          f"backlog_remaining={len(remaining)}", file=sys.stderr)
    if fresh < 42:
        print("# WARNING: below the 42 first-exposure floor", file=sys.stderr)
    print(fmt("DRIVER_WINDOW", window))
    print()
    print(fmt("ROTATION_BACKLOG", remaining))


if __name__ == "__main__":
    main()
