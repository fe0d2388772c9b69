"""Cross-engine parity of the portable digest fragments — the one
primitive every dedup/sampling oracle leans on.  If Spark and DuckDB
ever disagree on a single byte here, half the registry red-rows, so
pin it directly on adversarial strings (not just through query
oracles)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from instructions_mr_spark.queries._util import duck_h60, spark_h60
from instructions_mr_spark.queries.llm_pipeline import _duck_h32, _spark_h32

STRINGS = [
    "", "a", "hello world", "ünïcode-ø", "tab\tnewline\n", "'quote'",
    "a b c d e f g h", "0", "🙂🙃", "x" * 1000,
]


def _pairs(spark, spark_frag, duck_frag, seed):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", F.expr(spark_frag("s", seed)).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in STRINGS])
    duck = {r[0]: r[1] for r in con.sql(
        f"SELECT s, {duck_frag('s', seed)} AS h FROM t").fetchall()}
    return got, duck


def test_h32_parity(spark):
    for seed in (0, 13, 99):
        got, duck = _pairs(spark, _spark_h32, _duck_h32, seed)
        assert got == duck, seed


def test_h60_parity(spark):
    for seed in (17, 29):
        got, duck = _pairs(spark, spark_h60, duck_h60, seed)
        assert got == duck, seed
        # 60-bit digests stay within signed BIGINT with headroom
        assert all(0 <= v < 1 << 60 for v in got.values())
