"""Scale-up generator: build an sfN directory as K key-offset copies of
an existing sf directory (default: sf1 = 10 x sf0.1).

The driver's synthetic generator is not shipped, so larger SFs are
built by replication with consistent key offsets: copy ``i`` shifts
every entity key (custkey, orderkey, partkey, suppkey, doc_id, vec_id,
event_id, user_id) by ``i * stride`` for that entity.  This preserves

* per-copy value distributions exactly (so per-query work scales
  linearly by construction — any super-linear bench delta is the
  ENGINE's, not the data's), and
* every FK relationship (each copy is a self-contained universe; joins
  never cross copies).

``region``/``nation`` are fixed dimensions (25 nations) and are NOT
replicated — exactly like TPC-H at every scale factor.

Usage:
    python tools/gen_sf.py [--src /root/testdata/sf0.1] \
        [--dst /root/repo/.testdata/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from instructions_mr_spark.session import get_spark
from instructions_mr_spark.sources.tables import load_table

# entity -> (table, key columns to shift by that entity's stride)
KEYED = {
    "customer": [("customer", ["c_custkey"]), ("orders", ["o_custkey"])],
    "orders": [("orders", ["o_orderkey"]), ("lineitem", ["l_orderkey"])],
    "part": [("part", ["p_partkey"]), ("lineitem", ["l_partkey"])],
    "supplier": [("supplier", ["s_suppkey"]), ("lineitem", ["l_suppkey"])],
    "event": [("events", ["event_id"])],
    "user": [("events", ["user_id"])],
    "doc": [("documents", ["doc_id"])],
    "vec": [("embeddings", ["vec_id"])],
}
REPLICATED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
FIXED = ["region", "nation"]


def _strides(spark, src: str) -> dict[str, int]:
    """One stride per entity: next power of 10 above the key max, so
    offset keys are disjoint and human-readable."""
    out: dict[str, int] = {}
    for entity, uses in KEYED.items():
        table, cols = uses[0]
        mx = load_table(spark, src, table).agg(F.max(cols[0])).first()[0]
        stride = 10
        while stride <= int(mx):
            stride *= 10
        out[entity] = stride
    return out


def _shifted(df: DataFrame, table: str, copy: int, strides: dict[str, int]) -> DataFrame:
    for entity, uses in KEYED.items():
        for t, cols in uses:
            if t != table:
                continue
            for c in cols:
                dt = dict(df.dtypes)[c]
                df = df.withColumn(c, (F.col(c) + F.lit(copy * strides[entity])).cast(dt))
    if table == "embeddings":
        df = _decorrelate_embeddings(df, copy)
    return df


def _decorrelate_embeddings(df: DataFrame, copy: int) -> DataFrame:
    """Per-copy signed cyclic rotation of the embedding vectors
    (copy 0 stays verbatim).

    Verbatim replication makes every vector an EXACT duplicate of its
    K-1 copy twins, so any near-dup query's output (and cost) grows
    quadratically in copies — the r7 scale curves measured that clique
    artifact, not engine compute (dedup_embedding_cosine sf2/sf1 was
    4.03x for 2x data).  A signed permutation is an orthogonal
    transform: every WITHIN-copy inner product / cosine is preserved
    bit-exactly (rotation + sign flips are exact float ops), so each
    copy's query output is byte-identical to the source universe's,
    while CROSS-copy cosines drop to noise — output now scales
    linearly in copies, and the curve measures compute."""
    if copy == 0:
        return df
    d = df.select(F.size("embedding")).first()[0]
    shift = (copy * 7) % d  # gcd(7, 64) = 1 -> distinct per copy
    rot = F.concat(
        F.slice("embedding", shift + 1, d - shift),
        F.slice("embedding", 1, shift),
    )
    signed = F.transform(
        rot,
        lambda x, j: F.when((j + F.lit(copy)) % 3 == 0, -x).otherwise(x),
    )
    return df.withColumn("embedding", signed.cast("array<float>"))


def generate(src: str, dst: str, copies: int, only: list[str] | None = None) -> None:
    spark = get_spark("gen_sf")
    os.makedirs(dst, exist_ok=True)
    strides = _strides(spark, src)
    for table in FIXED:
        if only and table not in only:
            continue
        load_table(spark, src, table).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dst, table + ".parquet")
        )
        print("fixed", table)
    for table in REPLICATED:
        if only and table not in only:
            continue
        base = load_table(spark, src, table)
        parts = [_shifted(base, table, i, strides) for i in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst, table + ".parquet"))
        print("replicated", table, "x", copies)
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.testdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--tables", default="", help="comma list: regen only these")
    a = ap.parse_args()
    generate(a.src, a.dst, a.copies, [t for t in a.tables.split(",") if t] or None)
