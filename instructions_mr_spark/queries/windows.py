"""Window-function surface (SURVEY.md §2.7 window_rank /
window_analytic).  Absent from the reference (§2.6).

Scale note: every window here partitions by a real key (segment,
customer, supplier) — one shuffle on the partition key, then a local
sort per partition.  No global-ORDER-BY windows (those single-thread
at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from instructions_mr_spark.queries._util import t
from instructions_mr_spark.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    wr = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wn = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.rank().over(wr).cast("bigint").alias("rnk"),
        F.dense_rank().over(wr).cast("bigint").alias("drnk"),
        F.row_number().over(wn).cast("bigint").alias("rn"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           DATE_DIFF('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
             AS qty_ma4
    FROM lineitem
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, W.currentRow)
    )
    return t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg(F.col("l_quantity").cast("decimal(12,2)")).over(w), 4)
        .cast("double")
        .alias("qty_ma4"),
    )


@query(
    "window_ntile_cume",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey), 8) AS cume
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-ordered window on a pre-filtered slice (bounded input) —
    the only acceptable shape for an unpartitioned window."""
    w = W.orderBy("c_acctbal", "c_custkey")
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            "c_custkey",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.cume_dist().over(w), 8).alias("cume"),
        )
    )
