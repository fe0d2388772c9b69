"""Web-crawl curation pipeline composed from the round-7 web/span/
mixture operators — the pass a crawled corpus runs BEFORE the
content-level pipeline in examples/curation_pipeline.py.

Stages (each registry-backed and oracle-checked on its own):

  0. robots gate         longest-match robots.txt verdicts
                         (robots_verdicts, the per-doc form of
                         robots_txt_gate): disallowed fetches never
                         enter the corpus
  1. URL fetch dedup     canonical-URL digest keeper (url_dedup)
  2. domain blacklist    per-registrable-domain dup accounting
                         (domain_stats); domains where duplicate
                         fetches outnumber unique pages are dropped —
                         the mirror/aggregator signal
  3. boilerplate cut     keep-first repeated-substring cut
                         (dedup_span_cut_keepfirst): per-doc kept
                         token counts; empty-after-cut docs dropped
  4. mixture weighting   temperature-scaled source boosts
                         (mixture_temperature_shares)

Usage:
    python examples/web_curation_pipeline.py [sf_dir] [out_dir]

Composition stays declarative: keepers and blacklists are id/domain
joins, so Catalyst fuses the whole program and only ids, digests, and
domains cross the shuffles.
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
    spark = get_spark("web_curation_pipeline")
    q = registry.QUERIES

    from instructions_mr_spark.operators.urls import registrable_domain
    from instructions_mr_spark.queries.web import _synth_urls

    docs = _synth_urls(spark, sf_dir).select(
        "doc_id", "source", registrable_domain("url").alias("domain")
    )
    n_total = docs.count()

    # -- 0. robots gate: longest-match verdict per doc; disallowed
    # fetches (5th char of the string-pack win = '0') never enter
    from instructions_mr_spark.queries.web import robots_verdicts

    allowed = (
        robots_verdicts(spark, sf_dir)
        .filter(F.col("win").isNull() | (F.substring("win", 5, 1) == "1"))
        .select("doc_id")
    )
    docs = docs.join(allowed, "doc_id", "left_semi")
    n_after_robots = docs.count()

    # -- 1. URL fetch dedup: keep one doc per canonical URL
    url_keep = q["url_dedup"](spark, sf_dir).select(
        F.col("kept_doc_id").alias("doc_id")
    )

    # -- 2. domain blacklist: RELATIVE mirror detection — a domain is
    # dropped when its duplicate-fetch share is more than double the
    # corpus-wide share (an absolute rule like dups > uniques zeroes
    # out on any heavily-replicated corpus; relative survives any
    # global dup level).  Integer cross-multiply, no float thresholds.
    stats = q["domain_stats"](spark, sf_dir)
    corpus = stats.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("n_dup_urls").alias("tot_dups")
    )
    bad_domains = (
        stats.crossJoin(F.broadcast(corpus))
        .filter(
            F.col("n_dup_urls") * F.col("tot_docs")
            > 2 * F.col("tot_dups") * F.col("n_docs")
        )
        .select("domain")
    )

    kept = (
        docs.join(url_keep, "doc_id", "left_semi")
        .join(F.broadcast(bad_domains), "domain", "left_anti")
    )
    n_after_web = kept.count()

    # -- 3. boilerplate cut: keep-first span dedup, drop empty docs
    spans = q["dedup_span_cut_keepfirst"](spark, sf_dir).select(
        "doc_id", "n_tokens", "n_kept"
    )
    cleaned = kept.join(spans, "doc_id").filter(F.col("n_kept") > 0)
    n_after_cut = cleaned.count()

    # -- 4. temperature mixture boosts per source
    boosts = q["mixture_temperature_shares"](spark, sf_dir).select(
        "source", "boost"
    )
    survivors = cleaned.join(F.broadcast(boosts), "source")

    os.makedirs(out_dir, exist_ok=True)
    survivors.write.mode("overwrite").parquet(
        os.path.join(out_dir, "web_survivors")
    )
    return {
        "total": n_total,
        "after_robots": n_after_robots,
        "after_url_and_domain": n_after_web,
        "after_span_cut": n_after_cut,
        "survivors": survivors.count(),
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/web_curation_out"
    print(run(sf, out))
