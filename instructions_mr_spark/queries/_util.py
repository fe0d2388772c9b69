"""Shared helpers for query definitions.

Float-stability convention: double sums go through DECIMAL casts on
BOTH engines (exact arithmetic, identical result bits after the final
cast to DOUBLE), because summing doubles in engine-dependent order
drifts in the low bits and can flip a rounded value at large
magnitudes.  Fragments are shared verbatim between the Spark F.expr
side and the DuckDB oracle string so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from instructions_mr_spark.sources.tables import load_table

# Exact-decimal aggregate fragments (valid in both Spark SQL and DuckDB).
DEC_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DEC_DISC = "CAST(l_discount AS DECIMAL(8,4))"
DEC_TAX = "CAST(l_tax AS DECIMAL(8,4))"
REVENUE = f"{DEC_PRICE} * (1 - {DEC_DISC})"
CHARGE = f"{DEC_PRICE} * (1 - {DEC_DISC}) * (1 + {DEC_TAX})"
DEC_TOTAL = "CAST(o_totalprice AS DECIMAL(12,2))"
DEC_BAL = "CAST(c_acctbal AS DECIMAL(12,2))"
DEC_VALUE = "CAST(value AS DECIMAL(12,2))"


def spark_h60(expr: str, seed: int) -> str:
    """Portable 60-bit digest fragment (Spark SQL side): first 15 hex
    chars of md5 — fits a signed BIGINT with headroom, and byte-
    identical to :func:`duck_h60`, so a digest used as a GROUP BY /
    join key produces the same buckets on both engines (the 32-bit
    twin in queries/llm_pipeline.py birthday-collides past ~100k keys;
    use THIS one for gram/url-cardinality keys)."""
    return (
        f"CAST(CONV(SUBSTRING(MD5(CAST({expr} || '#{seed}' AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
    )


def duck_h60(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`spark_h60` (same bytes, same value)."""
    return f"('0x' || substr(md5({expr} || '#{seed}'), 1, 15))::BIGINT"


def sum_d(fragment: str, alias: str) -> str:
    return f"CAST(SUM({fragment}) AS DOUBLE) AS {alias}"


def avg_d(fragment: str, alias: str) -> str:
    return f"CAST(SUM({fragment}) AS DOUBLE) / COUNT({fragment}) AS {alias}"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def ts_epoch_seconds(col):
    """Event-time column -> epoch seconds, NTZ-safe.

    ``CAST(ts AS BIGINT)`` is rejected for TIMESTAMP_NTZ (the flavor
    tz-less parquet reads as under Spark 4); casting through TIMESTAMP
    first is exact because the session timezone is pinned UTC
    (session.py).  Use this — never a bare ``.cast("long")`` — for any
    ``events.ts`` / ``orders.o_orderdate`` arithmetic; round 3's
    driver failure was exactly that bare cast.
    """
    from pyspark.sql import Column, functions as F

    c = F.col(col) if not isinstance(col, Column) else col
    return c.cast("timestamp").cast("long")


_STAGED_CKPTS: list[DataFrame] = []


def supersede_checkpoint(key: str, df: DataFrame) -> DataFrame:
    """Record a query builder's staged localCheckpoint so a harness
    can release it between iterations.

    Query builders that eagerly localCheckpoint a staged table (PMI /
    bigram pair tables, LSH signature tables) otherwise leak one
    cached RDD per invocation for the life of the session — the exact
    accumulation graph.py's _free_checkpoint fixes for iterative
    loops.  Auto-freeing on rebuild is NOT safe here: two related
    queries (e.g. dedup_minhash_lsh and dedup_cluster_cc) may stage
    the same table while both returned plans are still pending, so
    freeing is explicit — bench.py calls free_staged_checkpoints()
    after each query's timing loop; one-shot drivers leak at most one
    block set per staged table.  ``key`` labels the site for
    debugging only.
    """
    _STAGED_CKPTS.append(df)
    return df


def free_staged_checkpoints() -> int:
    """Release every staged checkpoint recorded since the last call.
    Call ONLY when all previously-built query results are fully
    consumed (their lineage is truncated — recompute is impossible).
    Returns the number of checkpoints freed."""
    from instructions_mr_spark.operators.graph import _free_checkpoint

    n = len(_STAGED_CKPTS)
    for df in _STAGED_CKPTS:
        _free_checkpoint(df)
    _STAGED_CKPTS.clear()
    return n


def ts_epoch_micros(col):
    """Event-time column -> epoch microseconds, NTZ-safe (see
    ts_epoch_seconds)."""
    from pyspark.sql import Column, functions as F

    c = F.col(col) if not isinstance(col, Column) else col
    return F.unix_micros(c.cast("timestamp"))
