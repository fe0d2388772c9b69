"""Coverage extras: GROUPING SETS, vector (embedding) aggregation,
rolling-hash fingerprints, RANGE window frames, from_json struct
extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from instructions_mr_spark.queries._util import DEC_QTY, sum_d, t
from instructions_mr_spark.registry import query


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           {sum_d(DEC_QTY, 'sum_qty')}, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via the SQL API."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               GROUPING__ID AS gid,
               {sum_d(DEC_QTY, 'sum_qty')}, COUNT(*) AS n
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "vector_avg_by_label",
    oracle="""
    SELECT label, pos, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS avg_val, COUNT(*) AS n
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def vector_avg_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid computation (the k-means/IVF building block): explode
    embeddings with position, average per (label, dimension).  One
    shuffle keyed by (label, pos) — dimension-parallel, so a 1000-dim
    embedding over 100 TB spreads across the cluster instead of
    aggregating whole vectors on one key."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).alias("pos"), "v")
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("avg_val"),
            F.count("*").alias("n"),
        )
    )


# Modular power table shared verbatim by both engines (floats would
# lose exactness past 31^11; the table keeps every term < 2^53).
_RH_P = 1_000_000_007
_RH_POWS = [pow(31, i, _RH_P) for i in range(64)]
_RH_POWS_SQL = "[" + ", ".join(str(x) for x in _RH_POWS) + "]"


@query(
    "doc_rolling_hash",
    oracle=f"""
    SELECT doc_id,
           CAST(CAST(list_sum(list_transform(range(1, least(length(text), 64) + 1),
                i -> CAST(ascii(substr(text, i, 1)) AS BIGINT) * ({_RH_POWS_SQL})[i]))
                AS BIGINT) % {_RH_P} AS BIGINT) AS rhash
    FROM documents
    """,
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint of the first 64 chars:
    sum(ascii(c_i) * 31^i mod p) mod p, computed as a pure
    higher-order fold (no UDF) — the streaming-friendly fingerprint
    the md5 digest can't give (prefix-incremental)."""
    pows = F.array(*[F.lit(x) for x in _RH_POWS])
    chars = F.split(F.substring("text", 1, 64), "")
    terms = F.zip_with(chars, pows, lambda c, p: F.ascii(c).cast("long") * p)
    rh = (
        F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + F.coalesce(x, F.lit(0)))
        % _RH_P
    )
    return t(spark, sf_dir, "documents").select("doc_id", rh.alias("rhash"))


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                          RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS orders_90d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: orders in the trailing 90 days per
    customer (value-based frame, not row-based)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 24 * 3600, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.count("*").over(w).alias("orders_90d")
    )


@query(
    "json_from_schema",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k2
    FROM events
    """,
)
def json_from_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with a declared schema (from_json -> struct),
    the production path for the reference's JSON-string columns (vs
    per-path get_json_object)."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        parsed["k"].alias("k"),
        (parsed["k"] * 2).alias("k2"),
    )
