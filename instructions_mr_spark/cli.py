"""CLI twin of the reference's ``bin/text_mr_pipe.py``: run a
config-driven instruction-MR pipeline over a JSONL file.

Usage:
    python -m instructions_mr_spark.cli <config.json> [--limit N]

Accepts the reference's exact config shape (in_data_path,
out_data_path, llm{...}, pipe[[map...],[reduce...]]) — a reference
user can point this at their existing config unchanged.  Differences
from the reference CLI, by design:

* records process distributed across partitions, not in a sequential
  Python loop (bin/text_mr_pipe.py:51-58);
* the output JSONL carries the input record's columns plus the final
  stage's outputs and the markdown rendering, written by Spark's JSON
  sink (one object per line, non-ASCII preserved);
* ``llm.api_type: "echo"`` runs fully offline and deterministic.
"""

from __future__ import annotations

import argparse
import json
import sys

from instructions_mr_spark.config import PipelineConfig
from instructions_mr_spark.plans import run_pipeline
from instructions_mr_spark.session import get_spark
from instructions_mr_spark.sources.io import jsonl_scan, jsonl_sink


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="pipeline config JSON (reference format)")
    ap.add_argument("--limit", type=int, default=None, help="process only N records")
    ap.add_argument(
        "--reduce-style",
        choices=["serialize", "xmlwrap"],
        default="serialize",
        help="library-v0 serialize (default) or POC xml-wrap reduce",
    )
    ap.add_argument(
        "--pretty",
        action="store_true",
        help="byte-parity indent=2 prompt serialization (slower)",
    )
    ap.add_argument(
        "--schema",
        default=None,
        help="DDL schema for the input JSONL (declared field order; "
        "without it Spark infers and sorts keys alphabetically, which "
        "changes nested serialization order vs the raw file)",
    )
    ap.add_argument(
        "--explain",
        action="store_true",
        help="print the compiled physical plan instead of running "
        "(what will execute: pushdowns, exchanges, Python stages)",
    )
    args = ap.parse_args(argv)

    try:
        with open(args.config, encoding="utf-8") as fh:
            conf_dict = json.load(fh)
    except FileNotFoundError:
        print(f"config not found: {args.config}", file=sys.stderr)
        return 2
    except json.JSONDecodeError as e:
        print(f"config is not valid JSON: {e}", file=sys.stderr)
        return 2
    config = PipelineConfig.from_dict(conf_dict)
    if not config.in_data_path or not config.out_data_path:
        print("config needs in_data_path and out_data_path", file=sys.stderr)
        return 2

    spark = get_spark("imr_pipe")
    df = jsonl_scan(spark, config.in_data_path, schema=args.schema)
    if args.limit:
        df = df.limit(args.limit)

    out = run_pipeline(
        df,
        config,
        keep_cols=None,
        with_md=True,
        reduce_style=args.reduce_style,
        pretty=args.pretty,
    )
    if args.explain:
        out.explain("formatted")
        return 0
    jsonl_sink(out, config.out_data_path)
    print(f"wrote {config.out_data_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
