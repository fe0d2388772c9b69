"""SQL-semantics contract operators.

The round-8 fourth batch: the NULL-handling and tie-handling edge
cases every warehouse migration trips over, pinned as first-class
oracled queries so the engine's semantics are CONTRACTS, not
accidents — null-safe join equality, the NOT IN vs NOT EXISTS null
trap, RANK-with-ties top-k, the higher-order array-function surface,
and overlapping-interval merging (gaps-and-islands).

Reference parity note: the reference engine (instructions-mr,
/root/reference — a sequential LLM prompt-pipeline, ~1.1k LoC) has no
relational operators at all; this family is part of the extended SQL
surface (SURVEY.md §2.7) a warehouse user expects.

Scale shapes: every query aggregates or windows on partitioned keys;
the one deliberately scary plan (``not_in_null_semantics``' null-aware
anti join) is the POINT of that audit and is documented in place.
"""

from __future__ import annotations
from instructions_mr_spark.plans.guard import literal_df

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructions_mr_spark.queries._util import t
from instructions_mr_spark.registry import query

# ------------------------------------------------ null-safe join


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nkey,
             COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS nkey,
             COUNT(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT c.nkey, CAST(c.n_cust AS BIGINT) AS n_cust,
           CAST(s.n_supp AS BIGINT) AS n_supp
    FROM c JOIN s ON c.nkey IS NOT DISTINCT FROM s.nkey
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): both
    sides bucket entities by a NULLABLE nation key (negative account
    balance -> key unknown), then join so the NULL buckets MATCH each
    other — the semantics plain ``=`` silently drops and the single
    most common source of row-count surprises when porting warehouse
    SQL.  Emits the per-key pair of bucket sizes, NULL row included.

    Scale shape: both inputs collapse to (key)-cardinality aggregates
    (<= nations + 1 rows) before the join, so the null-safe join —
    which Spark compiles to an equi-join on coalesced key structs, not
    a nested loop — moves almost nothing."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(
            F.when(F.col("c_acctbal") < 0, F.lit(None))
            .otherwise(F.col("c_nationkey"))
            .alias("nkey")
        )
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(
            F.when(F.col("s_acctbal") < 0, F.lit(None))
            .otherwise(F.col("s_nationkey"))
            .alias("nkey")
        )
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c["nkey"].eqNullSafe(s["nkey"])).select(
        c["nkey"].alias("nkey"),
        F.col("n_cust").cast("bigint").alias("n_cust"),
        F.col("n_supp").cast("bigint").alias("n_supp"),
    )


# --------------------------------------- NOT IN vs NOT EXISTS


@query(
    "not_in_null_semantics",
    oracle="""
    WITH sub AS (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL SELECT CAST(NULL AS BIGINT)
    )
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM sub)) AS BIGINT)
        AS n_not_in,
      CAST((SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM sub s
                              WHERE s.k = c.c_custkey)) AS BIGINT)
        AS n_not_exists,
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey IN (SELECT k FROM sub)) AS BIGINT)
        AS n_in
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-valued-logic trap as an executable contract: customers
    ``NOT IN`` a subquery that CONTAINS a NULL is empty by the SQL
    standard (x <> NULL is unknown for every x), while the NOT EXISTS
    rewrite returns the intended anti-set — this query pins the engine
    to the standard on both counts plus the IN control.  The injected
    NULL stands in for the nullable FK every real schema has.

    Scale shape: deliberately instructive — Spark compiles the NOT IN
    branch to a null-aware anti join (broadcast, build side = the
    subquery), which is exactly why production pipelines should write
    NOT EXISTS (a plain shuffled anti join); the docstring IS the
    audit's verdict.  The two correct branches are semi/anti
    equi-joins on c_custkey."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH sub AS (
          SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
          UNION ALL SELECT CAST(NULL AS BIGINT)
        )
        SELECT
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT k FROM sub)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM sub s
                                  WHERE s.k = c.c_custkey)) AS BIGINT)
            AS n_not_exists,
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey IN (SELECT k FROM sub)) AS BIGINT)
            AS n_in
        """
    )


# ------------------------------------------------ top-k with ties


@query(
    "topk_with_ties",
    oracle="""
    WITH ranked AS (
      SELECT p_brand, p_size,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC)
    )
    SELECT p_brand,
           CAST(SUM(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rank_le3,
           CAST(SUM(CASE WHEN drnk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dense_le3,
           CAST(LEAST(3, COUNT(*)) AS BIGINT) AS n_rowno_le3,
           CAST(MAX(p_size) AS BIGINT) AS top_size
    FROM ranked GROUP BY p_brand
    """,
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-per-group under the three tie disciplines at once: RANK
    (WITH TIES — every peer of the 3rd row survives), DENSE_RANK (top
    3 VALUES — all rows at the 3 largest sizes), and the ROW_NUMBER
    cutoff (exactly 3 rows; computed as LEAST(3, n) rather than a
    ROW_NUMBER over unordered peers, which would be nondeterministic).
    Sizes tie heavily by construction, so the three counts genuinely
    diverge — the 'WITH TIES' semantics gap made executable.

    Scale shape: one window partitioned by brand (the natural key),
    then a map-side-combinable rollup on the same key — no global
    sort, no second exchange."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    ranked = t(spark, sf_dir, "part").select(
        "p_brand",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )
    return ranked.groupBy("p_brand").agg(
        F.sum(F.when(F.col("rnk") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rank_le3"),
        F.sum(F.when(F.col("drnk") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dense_le3"),
        F.least(F.lit(3), F.count(F.lit(1))).cast("bigint").alias("n_rowno_le3"),
        F.max("p_size").cast("bigint").alias("top_size"),
    )


# --------------------------------------- higher-order functions


@query(
    "hof_lambda_suite",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
               AS qe,
             len(embedding) AS n_dims,
             len(list_filter(embedding, x -> x > 0)) AS n_pos
      FROM embeddings
    )
    SELECT vec_id,
           CAST(n_dims AS BIGINT) AS n_dims,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT)
             AS sumsq_e6,
           CAST(list_sort(qe)[1] AS BIGINT) AS min_e3,
           CAST(list_sort(qe)[-1] AS BIGINT) AS max_e3
    FROM q
    """,
)
def hof_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function surface in one pass —
    ``transform`` (1e3 fixed-point quantization), ``filter`` (positive
    dimension count), ``aggregate`` (exact integer sum of squares) and
    ``array_sort`` (min/max via the sorted ends) — over the embedding
    column.  These lambdas run INSIDE codegen on the JVM (no Python
    worker), which is the entire argument for expressing per-element
    vector math this way instead of a UDF; quantize-then-square keeps
    both engines bit-identical where a float dot product would drift.

    Scale shape: a pure per-row map over the scan — zero exchanges,
    trivially parallel at any scale."""
    q = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
        ).alias("qe"),
        F.expr("size(embedding)").cast("bigint").alias("n_dims"),
        F.expr("size(filter(embedding, x -> x > 0))")
        .cast("bigint")
        .alias("n_pos"),
    )
    return q.select(
        "vec_id",
        "n_dims",
        "n_pos",
        F.expr(
            "aggregate(qe, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
        ).alias("sumsq_e6"),
        F.expr("element_at(array_sort(qe), 1)").alias("min_e3"),
        F.expr("element_at(array_sort(qe), -1)").alias("max_e3"),
    )


# --------------------------------- interval merge (gaps & islands)

_SHIP_DAY = "unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000000"
_DUCK_SHIP_DAY = "epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000"


@query(
    "interval_merge_overlaps",
    oracle=f"""
    WITH iv AS (
      SELECT l_suppkey,
             {_DUCK_SHIP_DAY} AS d0,
             {_DUCK_SHIP_DAY} + 1
               + CAST(FLOOR(l_quantity) AS BIGINT) % 14 AS d1,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    flagged AS (
      SELECT l_suppkey, d0, d1, l_orderkey, l_linenumber,
             CASE WHEN MAX(d1) OVER w1 IS NULL
                    OR d0 > MAX(d1) OVER w1 THEN 1 ELSE 0 END AS new_isl
      FROM iv
      WINDOW w1 AS (PARTITION BY l_suppkey
                    ORDER BY d0, d1, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    islands AS (
      SELECT l_suppkey, d0, d1,
             SUM(new_isl) OVER w2 AS isl
      FROM flagged
      WINDOW w2 AS (PARTITION BY l_suppkey
                    ORDER BY d0, d1, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    merged AS (
      SELECT l_suppkey, isl,
             MIN(d0) AS s, MAX(d1) AS e
      FROM islands GROUP BY 1, 2
    )
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(e - s + 1) AS BIGINT) AS covered_days,
           CAST(MAX(e - s + 1) AS BIGINT) AS max_span_days
    FROM merged GROUP BY 1
    """,
)
def interval_merge_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping busy intervals per supplier (gaps-and-islands):
    each line item occupies [ship day, ship day + 1 + qty % 14]; an
    interval starts a NEW island iff it begins after the running max
    end of everything before it (ROWS ... 1 PRECEDING), islands are
    numbered by the running sum of those flags, and merged spans roll
    up to count / coverage / max span per supplier — the canonical
    resource-utilization merge that naive self-joins get quadratically
    wrong.  Ordering is total (d0, d1, orderkey, linenumber), so the
    running max is deterministic on both engines.

    Scale shape: both windows and both rollups are PARTITIONED by
    l_suppkey — one exchange on the natural key, islands never cross
    partitions, no global sort anywhere."""
    day = F.expr(_SHIP_DAY)
    iv = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        day.alias("d0"),
        (
            day
            + 1
            + F.expr("CAST(FLOOR(l_quantity) AS BIGINT) % 14")
        ).alias("d1"),
        "l_orderkey",
        "l_linenumber",
    )
    w1 = (
        Window.partitionBy("l_suppkey")
        .orderBy("d0", "d1", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "l_suppkey",
        "d0",
        "d1",
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.max("d1").over(w1).isNull()
            | (F.col("d0") > F.max("d1").over(w1)),
            1,
        )
        .otherwise(0)
        .alias("new_isl"),
    )
    w2 = (
        Window.partitionBy("l_suppkey")
        .orderBy("d0", "d1", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "l_suppkey", "d0", "d1", F.sum("new_isl").over(w2).alias("isl")
    )
    merged = islands.groupBy("l_suppkey", "isl").agg(
        F.min("d0").alias("s"), F.max("d1").alias("e")
    )
    return merged.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("covered_days"),
        F.max(F.col("e") - F.col("s") + 1).cast("bigint").alias("max_span_days"),
    )


# ------------------------------------------- array set relations

_STOPLIST = (
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
)


@query(
    "array_set_relations",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_distinct(list_filter(string_split(text, ' '),
                w -> w <> ''))) AS BIGINT) AS n_distinct,
           CAST(len(list_intersect(
                  list_distinct(list_filter(string_split(text, ' '),
                    w -> w <> '')),
                  {list(_STOPLIST)!r})) AS BIGINT) AS n_stop,
           CAST(len(list_filter(
                  list_distinct(list_filter(string_split(text, ' '),
                    w -> w <> '')),
                  w -> NOT list_contains({list(_STOPLIST)!r}, w)))
                AS BIGINT) AS n_nonstop
    FROM documents
    """,
)
def array_set_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array set-algebra surface as one contract query: per
    document, the distinct-token count, its intersection size with a
    broadcast stopword list (array_intersect) and the complement size
    (array_except) — n_stop + n_nonstop must equal n_distinct, so the
    three operators are checked against EACH OTHER as well as the
    oracle.  Sizes only (element order differs between engines by
    design, cardinalities cannot).

    Scale shape: pure per-row JVM array lambdas on the scan — zero
    exchanges; the stopword list is a literal, not a join."""
    stop = ", ".join(f"'{w}'" for w in _STOPLIST)
    d = t(spark, sf_dir, "documents")
    toks = f"array_distinct(array_remove(split(text, ' '), ''))"
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_distinct"),
        F.expr(
            f"CAST(size(array_intersect({toks}, array({stop})))"
            f" AS BIGINT)"
        ).alias("n_stop"),
        F.expr(
            f"CAST(size(array_except({toks}, array({stop}))) AS BIGINT)"
        ).alias("n_nonstop"),
    )


# ------------------------------------------- bitwise aggregates


@query(
    "agg_bitwise",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(BIT_AND(c_custkey) AS BIGINT) AS band,
           CAST(BIT_OR(c_custkey) AS BIGINT) AS bor,
           CAST(BIT_XOR(c_custkey) AS BIGINT) AS bxor
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitwise aggregate surface (BIT_AND / BIT_OR / BIT_XOR of
    the member keys per nation): BIT_OR is the poor man's membership
    bitmap, BIT_XOR the order-independent set checksum used to
    compare replicas without sorting (two row sets with equal XOR +
    count are almost surely identical), and BIT_AND the common-bit
    screen — the audit pins all three to exact integer semantics on
    both engines.

    Scale shape: one map-side-combinable aggregate keyed on the
    natural dimension key — bitwise aggregates combine
    associatively, so partial aggregation does all the work."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("BIT_AND(c_custkey)").cast("bigint").alias("band"),
            F.expr("BIT_OR(c_custkey)").cast("bigint").alias("bor"),
            F.expr("BIT_XOR(c_custkey)").cast("bigint").alias("bxor"),
        )
    )


# -------------------------------------- explode vs explode_outer


@query(
    "explode_outer_semantics",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> len(w) > 15)
               AS longw
      FROM documents
    ),
    inner_rows AS (
      SELECT doc_id FROM d, UNNEST(longw) AS u(w)
    ),
    outer_rows AS (
      SELECT d.doc_id
      FROM d LEFT JOIN (SELECT doc_id, unnest(longw) AS w FROM d) e
        ON e.doc_id = d.doc_id
    )
    SELECT
      CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_docs,
      CAST((SELECT COUNT(*) FROM d WHERE len(longw) = 0) AS BIGINT)
        AS n_empty_docs,
      CAST((SELECT COUNT(*) FROM inner_rows) AS BIGINT) AS n_explode,
      CAST((SELECT COUNT(*) FROM outer_rows) AS BIGINT) AS n_explode_outer
    """,
)
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode vs explode_outer contract: exploding each document's
    (often EMPTY) list of >15-char words silently DROPS every empty
    document, while explode_outer keeps it as one NULL row —
    n_explode_outer = n_explode + n_empty_docs, pinned as counts so
    the row-loss bug class (joins and rollups that quietly lose
    entities with no child rows) is an executable contract rather
    than reviewer folklore.

    Scale shape: per-row lambda + explode on the scan; the three
    1-row branch aggregates meet in broadcast cross joins (the house
    1-row-aggregate join idiom), so the whole audit is ONE lazy plan
    with no driver-side action."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(text, ' '), w -> length(w) > 15)").alias(
            "longw"
        ),
    )
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.size("longw") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty_docs"),
    )
    inner = d.select(F.explode("longw").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_explode")
    )
    outer = d.select(F.explode_outer("longw").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_explode_outer")
    )
    return base.crossJoin(F.broadcast(inner)).crossJoin(F.broadcast(outer))


# -------------------------------------------- array index contract


@query(
    "array_index_contract",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           CAST(list_position(words, 'the') AS BIGINT) AS pos_the,
           words[-1] AS last_word,
           CAST(len(list_slice(words, 2, 4)) AS BIGINT) AS mid3_len
    FROM w WHERE len(words) >= 4
    """,
)
def array_index_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array indexing conventions pinned across engines: 1-BASED
    array_position (0 = absent, matching DuckDB's list_position NULL
    handled via the absent-0 convention both share), negative
    element_at for tail access, and the slice length mapping —
    Spark's slice(arr, start, LENGTH) vs DuckDB's INCLUSIVE-bounds
    list_slice(arr, start, end), the off-by-one every porting guide
    warns about, encoded here as slice(w,2,3) == list_slice(w,2,4).

    Scale shape: pure per-row JVM expressions on the scan — zero
    exchanges."""
    w = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    ).filter(F.size("words") >= 4)
    return w.select(
        "doc_id",
        F.expr("CAST(array_position(words, 'the') AS BIGINT)").alias(
            "pos_the"
        ),
        F.element_at("words", -1).alias("last_word"),
        F.expr("CAST(size(slice(words, 2, 3)) AS BIGINT)").alias("mid3_len"),
    )


# ------------------------------------------- union by name


@query(
    "union_by_name_contract",
    oracle="""
    WITH a AS (
      SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 0
    ),
    b AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 1
    ),
    u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_nation,
      CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_segment
    FROM u
    """,
)
def union_by_name_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two projections with DIFFERENT column
    sets combined by NAME (missing columns null-filled) — Spark's
    unionByName(allowMissingColumns=True) against DuckDB's UNION ALL
    BY NAME.  Positional UNION would misalign or reject these; the
    by-name contract is what lets a pipeline append last year's
    narrower snapshot to this year's wider one without a manual
    column map.  Null-fill counts pin exactly which side lost what.

    Scale shape: union is a zero-shuffle plan concatenation; the
    audit aggregate is one map-side-combinable reduce."""
    c = t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_nationkey"
    )
    b = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_mktsegment"
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("c_nationkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_nation"),
        F.sum(F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_segment"),
    )


# ------------------------------------------- FILTER clause


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_f,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS rev_f_c,
           CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                  AS BIGINT))
                FILTER (WHERE o_orderstatus = 'X'), 0) AS BIGINT)
             AS rev_x_c
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard-SQL FILTER (WHERE ...) aggregate clause: per
    priority, total count, F-status count and F-status exact-cents
    revenue in ONE pass — the conditional-aggregation surface that
    replaces N self-joins or CASE pyramids, plus the empty-filter
    contract (no 'X' orders exist, so that SUM is NULL by the
    standard; coalesced to 0 on both engines identically).

    Scale shape: one map-side-combinable aggregate on the priority
    key — the filters are per-row predicates inside the combine."""
    cents = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(
                "COUNT(*) FILTER (WHERE o_orderstatus = 'F')"
            )
            .cast("bigint")
            .alias("n_f"),
            F.expr(
                f"SUM({cents}) FILTER (WHERE o_orderstatus = 'F')"
            )
            .cast("bigint")
            .alias("rev_f_c"),
            F.expr(
                f"COALESCE(SUM({cents})"
                f" FILTER (WHERE o_orderstatus = 'X'), 0)"
            )
            .cast("bigint")
            .alias("rev_x_c"),
        )
    )


# ----------------------------------------- add_months clamping


@query(
    "month_add_clamp_contract",
    oracle="""
    WITH d AS (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
                                    INTERVAL 1 DAY))::DATE AS dt
    )
    SELECT CAST(dt - DATE '1970-01-01' AS BIGINT) AS day_idx,
           CAST(last_day(dt + INTERVAL 1 MONTH)
                  = (dt + INTERVAL 1 MONTH)::DATE AS BOOLEAN)
             AS lands_month_end,
           CAST((dt + INTERVAL 1 MONTH)::DATE - DATE '1970-01-01'
                AS BIGINT) AS plus1m_idx,
           CAST((dt + INTERVAL 3 MONTH)::DATE - DATE '1970-01-01'
                AS BIGINT) AS plus3m_idx
    FROM d
    WHERE dt = last_day(dt)
    """,
)
def month_add_clamp_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-arithmetic clamping pinned across engines: every 2024
    month-end shifted by +1 and +3 months, where Jan 31 + 1 month
    MUST clamp to Feb 29 (not overflow into March) — the billing-date
    bug class every subscription system hits once.  Both engines
    clamp (Spark add_months, DuckDB date + INTERVAL), and the
    lands_month_end flag documents exactly which shifted dates stay
    month-ends.

    Scale shape: a 12-row calendar-generated contract — no input
    scan; broadcast-sized by construction."""
    d = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(DATE '2024-01-01', DATE '2024-12-31',"
                " interval 1 day)"
            )
        ).alias("dt")
    ).filter(F.expr("dt = last_day(dt)"))
    return d.select(
        F.datediff("dt", F.lit("1970-01-01")).cast("bigint").alias("day_idx"),
        F.expr("last_day(add_months(dt, 1)) = add_months(dt, 1)").alias(
            "lands_month_end"
        ),
        F.datediff(F.expr("add_months(dt, 1)"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("plus1m_idx"),
        F.datediff(F.expr("add_months(dt, 3)"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("plus3m_idx"),
    )


# --------------------------------------- sorted distinct collect


@query(
    "agg_collect_set_sorted",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))),
                           ',') AS segments,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_custkey <= 300
    GROUP BY c_nationkey
    """,
)
def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic set aggregation: the DISTINCT market segments per
    nation, SORTED then joined — collect_set alone returns elements
    in partition-arrival order (different every run, poison for any
    hash-compared result), so the engine pins the sort as part of the
    operator.  The group-membership summary every dimension audit
    starts from.

    Scale shape: one aggregate on the nation key; set semantics make
    the combine state bounded by segment cardinality, not row
    count."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


# ------------------------------------------- hash functions


@query(
    "hash_functions_contract",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex
    FROM documents WHERE doc_id <= 50
    """,
)
def hash_functions_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest surface pinned byte-for-byte: md5 and
    sha256 hex digests of document text must match across engines —
    the foundation under every digest-keyed shuffle in the repo (the
    h60 convention truncates exactly this md5), content-addressed
    dedup, and cache keys.  A quiet encoding difference (UTF-8 vs
    latin-1, uppercase vs lowercase hex) breaks every one of those;
    this contract catches it at the source.

    Scale shape: pure per-row JVM hashing on the scan (bounded here
    to 50 rows — the contract needs coverage, not volume)."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("md5_hex"),
            F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
        )
    )


# ------------------------------------------- CSV roundtrip


@query(
    "csv_column_roundtrip",
    oracle="""
    SELECT event_id,
           event_id AS parsed_id,
           event_type AS parsed_type,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS parsed_cents
    FROM events WHERE event_id <= 100
    """,
)
def csv_column_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_csv / from_csv embedding roundtrip: each event serialized to
    a one-line CSV string and parsed straight back with a declared
    schema — the oracle states the IDENTITY, which is precisely the
    contract (a quoting, delimiter-escaping or type-coercion bug
    anywhere in the roundtrip surfaces as a field mismatch).  The
    payload carries a string column so delimiter handling is actually
    exercised.

    Scale shape: pure per-row JVM expressions on the scan (bounded to
    100 rows — a contract, not a volume test)."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 100)
        .select(
            "event_id",
            F.expr(
                "to_csv(struct(event_id, event_type,"
                " CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents))"
            ).alias("line"),
        )
    )
    parsed = ev.select(
        "event_id",
        F.from_csv(
            "line", "parsed_id BIGINT, parsed_type STRING, parsed_cents BIGINT"
        ).alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.parsed_id").alias("parsed_id"),
        F.col("p.parsed_type").alias("parsed_type"),
        F.col("p.parsed_cents").alias("parsed_cents"),
    )


# -------------------------------------- nested array flatten


@query(
    "nested_array_flatten",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    c AS (
      SELECT doc_id, words,
             list_transform(generate_series(0, (len(words) - 1) // 3),
               i -> list_slice(words, i * 3 + 1, i * 3 + 3)) AS chunks
      FROM w WHERE len(words) >= 1
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(len(chunks) AS BIGINT) AS n_chunks,
           CAST(flatten(chunks) = words AS BOOLEAN) AS flat_equal
    FROM c
    """,
)
def nested_array_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array surface: words chunked into 3-grams-of-position
    (an array of arrays via a nested slice lambda), then FLATTENED
    and compared element-wise against the original — the
    chunk/flatten identity that pins slice boundary conventions and
    flatten ordering in one boolean per document (always true; a
    false anywhere means an off-by-one in the slice mapping between
    engines).

    Scale shape: pure per-row JVM array lambdas — zero exchanges."""
    w = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("words"),
    ).filter(F.size("words") >= 1)
    c = w.select(
        "doc_id",
        "words",
        F.expr(
            "transform(sequence(0, (size(words) - 1) DIV 3),"
            " i -> slice(words, i * 3 + 1, 3))"
        ).alias("chunks"),
    )
    return c.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.size("chunks").cast("bigint").alias("n_chunks"),
        (F.flatten("chunks") == F.col("words")).alias("flat_equal"),
    )


# ------------------------------------------- LIKE ANY / ALL


@query(
    "like_any_all_contract",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_parts,
      CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                      OR p_type LIKE 'STANDARD%' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_like_any,
      CAST(SUM(CASE WHEN p_type LIKE '%BRUSHED%'
                     AND p_type LIKE '%NICKEL%' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_like_all,
      CAST(SUM(CASE WHEN p_type NOT LIKE 'PROMO%'
                     AND p_type NOT LIKE 'STANDARD%' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_not_like_all
    FROM part
    """,
)
def like_any_all_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIKE ANY / LIKE ALL quantified-pattern surface: parts
    matching ANY of two prefixes, ALL of two substrings, and NONE of
    the prefixes (NOT LIKE ALL), counted in one pass — Spark's
    quantified LIKE syntax against the oracle's expanded OR/AND form,
    pinning that the sugar means exactly the expansion (including on
    the NOT side, where the quantifier flips people's intuition).

    Scale shape: one map-side-combinable conditional aggregate over
    the dimension scan."""
    return t(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.expr(
            "CAST(SUM(CASE WHEN p_type LIKE ANY ('PROMO%', 'STANDARD%')"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_like_any"),
        F.expr(
            "CAST(SUM(CASE WHEN p_type LIKE ALL ('%BRUSHED%', '%NICKEL%')"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_like_all"),
        F.expr(
            "CAST(SUM(CASE WHEN p_type NOT LIKE ALL ('PROMO%', 'STANDARD%')"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_not_like_all"),
    )


# -------------------------------------- binary encodings


@query(
    "binary_encoding_roundtrip",
    oracle="""
    SELECT doc_id,
           base64(ENCODE(left(text, 24))) AS b64,
           CAST(decode(from_base64(base64(ENCODE(left(text, 24)))))
                  = left(text, 24) AS BOOLEAN) AS b64_roundtrip,
           lower(hex(ENCODE(left(text, 8)))) AS hex8,
           CAST(decode(unhex(hex(ENCODE(left(text, 8))))) = left(text, 8)
                AS BOOLEAN) AS hex_roundtrip
    FROM documents WHERE doc_id <= 50
    """,
)
def binary_encoding_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 / hex encoding surface pinned byte-for-byte: the encoded
    strings themselves must match across engines (same alphabet, same
    padding, same hex case after normalization) AND decode back to
    the original bytes — the transport encodings under every binary
    payload column, checkpoint manifest and webhook signature.

    Scale shape: per-row JVM codecs on the scan (bounded to 50 rows —
    a contract, not a volume test)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    return d.select(
        "doc_id",
        F.base64(F.expr("CAST(left(text, 24) AS BINARY)")).alias("b64"),
        F.expr(
            "CAST(unbase64(base64(CAST(left(text, 24) AS BINARY))) AS STRING)"
            " = left(text, 24)"
        ).alias("b64_roundtrip"),
        F.lower(F.hex(F.expr("CAST(left(text, 8) AS BINARY)"))).alias(
            "hex8"
        ),
        F.expr(
            "CAST(unhex(hex(CAST(left(text, 8) AS BINARY))) AS STRING)"
            " = left(text, 8)"
        ).alias("hex_roundtrip"),
    )


# -------------------------------------- empty-input aggregates


@query(
    "empty_agg_contract",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM customer WHERE c_acctbal > 1e12) AS BIGINT)
        AS global_count,
      CAST((SELECT SUM(c_acctbal) FROM customer
            WHERE c_acctbal > 1e12) IS NULL AS BOOLEAN) AS global_sum_null,
      CAST((SELECT COUNT(*) FROM (
              SELECT c_nationkey FROM customer WHERE c_acctbal > 1e12
              GROUP BY c_nationkey)) AS BIGINT) AS n_groups
    """,
)
def empty_agg_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over an EMPTY input pinned: a global (ungrouped)
    aggregate still returns exactly ONE row — COUNT 0, SUM NULL —
    while a GROUP BY over the same empty input returns ZERO rows.
    The asymmetry is standard SQL and the root of the 'my dashboard
    shows null instead of nothing' class of bugs; pinning it keeps
    both engines (and every downstream consumer) honest about which
    shape they get.

    Scale shape: three scalar subqueries over a filter no row passes
    — pushdown makes each a metadata-fast scan."""
    c = t(spark, sf_dir, "customer")
    empty = c.filter(F.col("c_acctbal") > 1e12)
    g = empty.agg(
        F.count(F.lit(1)).cast("bigint").alias("global_count"),
        F.sum("c_acctbal").isNull().alias("global_sum_null"),
    )
    n_groups = (
        empty.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
    )
    return g.crossJoin(F.broadcast(n_groups)).select(
        "global_count", "global_sum_null", "n_groups"
    )


# ------------------------------------------- ISO week edges


@query(
    "iso_week_boundary_contract",
    oracle="""
    WITH d AS (
      SELECT unnest([DATE '2020-12-31', DATE '2021-01-01',
                     DATE '2021-01-04', DATE '2022-01-01',
                     DATE '2024-12-30', DATE '2025-01-01']) AS dt
    )
    SELECT CAST(dt - DATE '1970-01-01' AS BIGINT) AS day_idx,
           CAST(date_part('isoyear', dt) AS BIGINT) AS iso_year,
           CAST(date_part('week', dt) AS BIGINT) AS iso_week
    FROM d
    """,
)
def iso_week_boundary_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week numbering at the year boundaries where it bites:
    2021-01-01 is week 53 OF ISO-YEAR 2020, 2024-12-30 is week 1 of
    2025 — so grouping by (calendar_year, weekofyear) silently merges
    rows from different weeks across every New Year.  The contract
    pins (iso_year, iso_week) pairs on the six canonical trap dates;
    use these two functions together or not at all.

    Scale shape: a six-row literal contract — no input scan."""
    dates = ["2020-12-31", "2021-01-01", "2021-01-04", "2022-01-01",
             "2024-12-30", "2025-01-01"]
    arr = ", ".join(f"DATE '{d}'" for d in dates)
    return spark.range(1).select(
        F.explode(F.expr(f"array({arr})")).alias("dt")
    ).select(
        F.datediff("dt", F.lit("1970-01-01")).cast("bigint").alias("day_idx"),
        F.expr("extract(yearofweek FROM dt)").cast("bigint").alias(
            "iso_year"
        ),
        F.weekofyear("dt").cast("bigint").alias("iso_week"),
    )


# ------------------------------------------- 3-D cube flags


@query(
    "cube3_grouping_flags",
    oracle="""
    SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN NULL
                ELSE l_returnflag END AS l_returnflag,
           CASE WHEN GROUPING(l_linestatus) = 1 THEN NULL
                ELSE l_linestatus END AS l_linestatus,
           CASE WHEN GROUPING(qty_band) = 1 THEN NULL
                ELSE qty_band END AS qty_band,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(GROUPING(qty_band) AS BIGINT) AS g_band,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(FLOOR((l_quantity - 1) / 25) AS BIGINT) AS qty_band
      FROM lineitem
    )
    GROUP BY CUBE (l_returnflag, l_linestatus, qty_band)
    """,
)
def cube3_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-dimensional CUBE with explicit per-dimension GROUPING
    flags: all 2^3 aggregation levels of (flag, status, quantity
    band) in one pass, each row carrying WHICH dimensions are rolled
    up as separate 0/1 columns — per-flag columns instead of a packed
    GROUPING_ID because bit order in grouping_id is an engine
    convention (and has flipped between systems), while GROUPING(col)
    is unambiguous everywhere.  NULL group values are disambiguated
    from genuine NULLs by the same flags.

    Scale shape: Spark expands CUBE into a single shuffle with 8
    grouping sets computed map-side — one exchange for all levels."""
    src = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.expr("CAST(FLOOR((l_quantity - 1) / 25) AS BIGINT)").alias(
            "qty_band"
        ),
    )
    cubed = src.cube("l_returnflag", "l_linestatus", "qty_band").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.grouping("qty_band").cast("bigint").alias("g_band"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return cubed.select(
        F.when(F.col("g_flag") == 1, F.lit(None))
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
        F.when(F.col("g_status") == 1, F.lit(None))
        .otherwise(F.col("l_linestatus"))
        .alias("l_linestatus"),
        F.when(F.col("g_band") == 1, F.lit(None))
        .otherwise(F.col("qty_band"))
        .alias("qty_band"),
        "g_flag",
        "g_status",
        "g_band",
        "n",
    )


# ------------------------------------- multi-column DISTINCT


@query(
    "count_distinct_multi",
    oracle="""
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS d_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS d_user,
           CAST(COUNT(DISTINCT (event_type, user_id)) AS BIGINT) AS d_pair,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    """,
)
def count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-argument COUNT(DISTINCT a, b) alongside the single-column
    distincts and the raw count — the cardinality quartet that decides
    join strategies (d_pair vs d_type*d_user says how correlated the
    columns are) and the surface where engines differ on NULL-pair
    handling (a pair with any NULL is excluded; pinned here by
    value).

    Scale shape: Spark plans multiple distinct aggregates via expand
    — one pass, three distinct streams; all partial-aggregated."""
    return t(spark, sf_dir, "events").agg(
        F.countDistinct("event_type").cast("bigint").alias("d_type"),
        F.countDistinct("user_id").cast("bigint").alias("d_user"),
        F.countDistinct("event_type", "user_id").cast("bigint").alias(
            "d_pair"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


# ------------------------------------------- timezone / DST


@query(
    "tz_conversion_contract",
    oracle="""
    WITH u AS (
      SELECT unnest([TIMESTAMPTZ '2024-03-10 06:30:00+00',
                     TIMESTAMPTZ '2024-03-10 07:30:00+00',
                     TIMESTAMPTZ '2024-11-03 05:30:00+00',
                     TIMESTAMPTZ '2024-11-03 06:30:00+00',
                     TIMESTAMPTZ '2024-06-15 12:00:00+00',
                     TIMESTAMPTZ '2024-01-15 12:00:00+00']) AS ts,
             unnest([1, 2, 3, 4, 5, 6]) AS utc_idx
    )
    SELECT CAST(utc_idx AS BIGINT) AS utc_idx,
           strftime(timezone('America/New_York', ts), '%Y-%m-%d %H:%M')
             AS ny_local,
           strftime(timezone('Asia/Kolkata', ts), '%Y-%m-%d %H:%M')
             AS kolkata_local
    FROM u
    """,
)
def tz_conversion_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA timezone conversion pinned at the DST boundaries: UTC
    instants straddling the US spring-forward (01:30 EST exists,
    02:30 does not — 07:30Z lands on 03:30 EDT) and fall-back (05:30Z
    and 06:30Z BOTH render as 01:30 local — the ambiguous hour), plus
    a half-hour-offset zone (Asia/Kolkata, +05:30) that catches
    engines rounding offsets to whole hours.  Wall-clock strings must
    match byte-for-byte, which pins the tz database semantics, not
    just the arithmetic.

    Scale shape: a six-row literal contract — no input scan."""
    instants = [
        "2024-03-10 06:30:00", "2024-03-10 07:30:00",
        "2024-11-03 05:30:00", "2024-11-03 06:30:00",
        "2024-06-15 12:00:00", "2024-01-15 12:00:00",
    ]
    arr = ", ".join(
        f"named_struct('utc_idx', {i + 1}, 'ts', TIMESTAMP '{s}')"
        for i, s in enumerate(instants)
    )
    u = spark.range(1).select(
        F.explode(F.expr(f"array({arr})")).alias("r")
    ).select(
        F.col("r.utc_idx").cast("bigint").alias("utc_idx"),
        F.col("r.ts").alias("ts"),
    )
    return u.select(
        "utc_idx",
        F.date_format(
            F.from_utc_timestamp("ts", "America/New_York"),
            "yyyy-MM-dd HH:mm",
        ).alias("ny_local"),
        F.date_format(
            F.from_utc_timestamp("ts", "Asia/Kolkata"), "yyyy-MM-dd HH:mm"
        ).alias("kolkata_local"),
    )


# ================================================================ round 9


@query(
    "group_by_all_contract",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY l_returnflag, l_linestatus
    """,
)
def group_by_all_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL contract: both engines must resolve ALL to exactly
    the non-aggregate select expressions (here the two flag columns) —
    the convenience syntax warehouse users reach for first, and a
    silent-wrong-answer hazard if an engine resolves ALL differently
    (the oracle runs GROUP BY ALL on DuckDB too, so the contract is
    checked syntax-to-syntax, not against a hand-expansion).

    Scale shape: one map-side-combinable aggregate on a bounded flag
    pair."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_gball")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM v_li_gball
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "string_split_contract",
    oracle="""
    WITH toks AS (
      SELECT c_custkey,
             string_split(c_name, '0') AS parts
      FROM customer
    )
    SELECT CAST(len(parts) AS BIGINT) AS n_parts,
           CAST(len(list_filter(parts, p -> p = '')) AS BIGINT) AS n_empty,
           CAST(COUNT(*) AS BIGINT) AS n_names,
           CAST(SUM(length(parts[1]) + length(parts[len(parts)])) AS BIGINT)
             AS edge_len_sum
    FROM toks GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def string_split_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split() semantics contract on the nastiest real input —
    customer names are zero-padded ('Customer#000000123'), so
    splitting on '0' produces runs of EMPTY tokens and, for names
    ending in 0, a trailing empty: both engines must keep every empty
    token INCLUDING trailing ones (Java's split(limit=0) would drop
    them — the migration bug this pins), agree on token count, empty
    count, and first/last token lengths.

    Scale shape: in-row split + array arithmetic on the scan; one
    bounded (n_parts, n_empty) rollup."""
    toks = t(spark, sf_dir, "customer").select(
        F.split(F.col("c_name"), "0").alias("parts")
    )
    return (
        toks.selectExpr(
            "CAST(size(parts) AS BIGINT) AS n_parts",
            "CAST(size(filter(parts, p -> p = '')) AS BIGINT) AS n_empty",
            "length(element_at(parts, 1))"
            " + length(element_at(parts, size(parts))) AS edge_len",
        )
        .groupBy("n_parts", "n_empty")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_names"),
            F.sum("edge_len").cast("bigint").alias("edge_len_sum"),
        )
        .orderBy("n_parts", "n_empty")
    )


@query(
    "order_by_all_contract",
    oracle="""
    SELECT p_brand, p_size % 7 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM part GROUP BY 1, 2
    ORDER BY ALL
    LIMIT 50
    """,
)
def order_by_all_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL contract: both engines must order by every select
    column left-to-right (brand, bucket, n) — checked syntax-to-syntax
    like group_by_all_contract, because a different ALL expansion
    reorders the LIMIT cut and silently changes the result set.

    Scale shape: bounded-key aggregate + top-50 of a 175-row table."""
    t(spark, sf_dir, "part").createOrReplaceTempView("v_part_oball")
    return spark.sql(
        """
        SELECT p_brand, p_size % 7 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM v_part_oball GROUP BY 1, 2
        ORDER BY ALL
        LIMIT 50
        """
    )


@query(
    "regexp_extract_all_contract",
    oracle="""
    WITH m AS (
      SELECT p_partkey,
             regexp_extract_all(p_type, '[A-Z]+') AS toks
      FROM part
    )
    SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM m GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def regexp_extract_all_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all parity: both engines must produce the same
    match LIST (count, first, last) for a character-class pattern —
    Spark runs java.util.regex, DuckDB runs RE2, and their semantics
    agree only on the regex subset this engine permits in shared
    fragments (no backrefs, no lookaround); this contract pins that
    overlap on real data so a drift into engine-specific syntax fails
    loudly.

    Scale shape: in-row regex on the scan; bounded rollup."""
    # Spark's regexp_extract_all defaults idx=1 (a capture group);
    # idx=0 = the whole match, which is what DuckDB returns by default
    m = t(spark, sf_dir, "part").select(
        F.expr("regexp_extract_all(p_type, '[A-Z]+', 0)").alias("toks")
    )
    return (
        m.selectExpr(
            "CAST(size(toks) AS BIGINT) AS n_tokens",
            "element_at(toks, 1) AS first_tok",
            "element_at(toks, size(toks)) AS last_tok",
        )
        .groupBy("n_tokens", "first_tok", "last_tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("n_tokens", "first_tok", "last_tok")
    )


# --------------------------------------- DISTINCT ON vs row_number


@query(
    "distinct_on_contract",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           CAST(o_custkey AS BIGINT) AS custkey,
           CAST(o_orderkey AS BIGINT) AS latest_orderkey,
           CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
                AS BIGINT) AS latest_epoch_day,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS latest_cents
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def distinct_on_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-order-per-customer two ways: DuckDB/Postgres
    ``DISTINCT ON (key) ... ORDER BY key, sort DESC`` (the oracle)
    against Spark's canonical ``ROW_NUMBER() = 1`` window pick — the
    single most common idiom gap in warehouse migrations (Spark has
    no DISTINCT ON).  The tiebreak MUST be total (orderdate DESC,
    then orderkey DESC): DISTINCT ON with a partial sort is
    nondeterministic on both engines, which is exactly the trap this
    contract pins.

    Scale shape: one window exchange on o_custkey; Spark 4 compiles
    the rn=1 filter to WindowGroupLimit (top-1 per key runs map-side
    before the shuffle), so the exchange carries one row per customer
    — the DISTINCT ON plan, recovered by the optimizer."""
    from instructions_mr_spark.queries._util import ts_epoch_seconds

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter("rn = 1")
        .select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            F.col("o_orderkey").cast("bigint").alias("latest_orderkey"),
            F.floor(ts_epoch_seconds("o_orderdate") / F.lit(86400))
            .cast("bigint")
            .alias("latest_epoch_day"),
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "latest_cents"
            ),
        )
    )


# --------------------------------------- posexplode ordinality


@query(
    "posexplode_contract",
    oracle="""
    WITH tok AS (
      SELECT CAST(p AS BIGINT) AS pos, words[p + 1] AS w
      FROM (SELECT string_split(text, ' ') AS words FROM documents),
           (SELECT UNNEST(range(0, 5)) AS p)
      WHERE p < len(words)
    )
    SELECT pos, w, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok GROUP BY pos, w
    ORDER BY pos, w
    """,
)
def posexplode_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-position contract: Spark ``posexplode`` emits 0-BASED
    positions while SQL array subscripts (DuckDB/Postgres, and
    ``UNNEST WITH ORDINALITY`` where available) are 1-BASED — the
    off-by-one every UDTF port hits, pinned by normalizing the oracle
    to words[pos + 1] and counting (position, token) pairs over each
    document's first five tokens.

    Scale shape: explode is pipelined (no shuffle); the only exchange
    is the (pos, w) count — 5 x vocabulary rows, map-side
    combinable."""
    return (
        t(spark, sf_dir, "documents")
        .select(F.posexplode(F.split("text", " ")).alias("pos", "w"))
        .filter(F.col("pos") < 5)
        .groupBy(F.col("pos").cast("bigint").alias("pos"), "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("pos", "w")
    )


# --------------------------------------- regexp backreferences


@query(
    "regexp_replace_backrefs_contract",
    oracle=r"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           regexp_replace(array_to_string(string_split(text, ' ')[1:4], ' '),
                          '([a-z0-9]+) ([a-z0-9]+)', '\2 \1', 'g')
             AS swapped
    FROM documents
    ORDER BY doc_id
    """,
)
def regexp_replace_backrefs_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backreference syntax contract: Spark's ``regexp_replace``
    takes Java-style ``$1`` backrefs and replaces ALL matches by
    default; DuckDB takes RE2-style ``\\1`` and replaces only the
    FIRST match unless the ``'g'`` flag is passed.  Both engines scan
    left-to-right with non-overlapping matches, so swapping adjacent
    word pairs over each document's first four tokens gives
    byte-identical output once each engine's dialect is spoken — the
    two gaps (backref sigil, global-by-default) are the contract.

    Scale shape: pure in-row string algebra on the scan — no shuffle
    at all (the ORDER BY is presentation-only)."""
    first4 = F.array_join(F.slice(F.split("text", " "), 1, 4), " ")
    return (
        t(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.regexp_replace(
                first4, r"([a-z0-9]+) ([a-z0-9]+)", r"$2 $1"
            ).alias("swapped"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------- pivot with two aggregates

_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


@query(
    "pivot_two_aggs_contract",
    oracle="""
    SELECT source,
    """
    + ",\n    ".join(
        f"CAST(COALESCE(SUM(CASE WHEN lang = '{lg}' THEN n_chars END), 0)"
        f" AS BIGINT) AS {lg}_chars,\n    "
        f"CAST(COALESCE(SUM(CASE WHEN lang = '{lg}' THEN 1 END), 0)"
        f" AS BIGINT) AS {lg}_docs"
        for lg in _PIVOT_LANGS
    )
    + """
    FROM documents GROUP BY source ORDER BY source
    """,
)
def pivot_two_aggs_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate pivot naming contract: Spark's
    ``.pivot(col, values).agg(a.alias('x'), b.alias('y'))`` flattens
    to ``{value}_{alias}`` columns — pinned against the explicit
    CASE-WHEN spelling so a dbt/warehouse port knows exactly which
    column is which.  Pivot VALUES are passed explicitly (the
    five-language contract set): omitting them makes Spark run a
    distinct-scan job at PLAN TIME to discover them — a hidden
    pre-query no 100 TB pipeline wants — and makes the output schema
    data-dependent, which breaks downstream DDL.  Missing cells
    COALESCE to 0 on both engines.

    Scale shape: one source-keyed exchange, map-side combinable; the
    pivot is a fixed 10-column projection, not a shuffle."""
    return (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .pivot("lang", _PIVOT_LANGS)
        .agg(
            F.sum("n_chars").alias("chars"),
            F.count(F.lit(1)).alias("docs"),
        )
        .select(
            "source",
            *[
                F.coalesce(F.col(f"{lg}_{m}"), F.lit(0))
                .cast("bigint")
                .alias(f"{lg}_{m}")
                for lg in _PIVOT_LANGS
                for m in ("chars", "docs")
            ],
        )
        .orderBy("source")
    )


# --------------------------------------- GROUPS frame emulation


@query(
    "groups_frame_emulation",
    oracle="""
    WITH g AS (
      SELECT p_brand, p_size,
             SUM(CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)) AS cents_g
      FROM part GROUP BY 1, 2
    )
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(SUM(cents_g) OVER (PARTITION BY p_brand ORDER BY p_size
                                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                AS BIGINT) AS frame_cents
    FROM g
    ORDER BY p_brand, p_size
    """,
)
def groups_frame_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS window frames without GROUPS support: Spark has ROWS
    and RANGE but not the SQL:2011 GROUPS frame (sum over the current
    PEER GROUP and one group either side) — and neither does the
    DuckDB in this container.  The portable equivalence pinned here:
    collapse to one row per (partition, order value) first, after
    which a +-1 frame over the collapsed table IS the GROUPS frame.
    The two engines spell the frame differently on purpose — DuckDB
    ROWS +-1 on the collapsed CTE, Spark RANGE +-1 over a dense
    row_number index — two independent emulations that must match to
    the cent.

    Scale shape: the collapse is a (brand, size) map-side-combinable
    aggregate; the window runs over the collapsed (domain-sized)
    table partitioned by brand — the emulation is CHEAPER than a raw
    GROUPS frame at scale, which is the migration guidance."""
    g = (
        t(spark, sf_dir, "part")
        .groupBy("p_brand", "p_size")
        .agg(
            F.expr("SUM(CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT))").alias(
                "cents_g"
            )
        )
    )
    idx = Window.partitionBy("p_brand").orderBy("p_size")
    frame = (
        Window.partitionBy("p_brand")
        .orderBy("gidx")
        .rangeBetween(-1, 1)
    )
    return (
        g.withColumn("gidx", F.row_number().over(idx))
        .select(
            "p_brand",
            F.col("p_size").cast("bigint").alias("p_size"),
            F.sum("cents_g").over(frame).cast("bigint").alias("frame_cents"),
        )
        .orderBy("p_brand", "p_size")
    )


# --------------------------------------- QUALIFY emulation


@query(
    "qualify_emulation_contract",
    oracle="""
    SELECT c_nationkey AS nationkey, c_custkey AS custkey,
           CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) <= 2
    ORDER BY nationkey, acctbal_cents DESC, custkey
    """,
)
def qualify_emulation_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-clause emulation: DuckDB/Snowflake/BigQuery filter on a
    window function directly with QUALIFY (the oracle); Spark has no
    QUALIFY, and the pinned equivalence is the subquery spelling —
    compute the window column, then filter it.  Subtlety worth the
    contract: QUALIFY evaluates AFTER window functions but BEFORE the
    outer ORDER BY/projection, which is exactly what the
    select-then-filter emulation reproduces; filtering in the SAME
    select that defines the window (a WHERE) is illegal on both.

    Scale shape: one nation-keyed window; Spark compiles the rn<=2
    filter to WindowGroupLimit, so the exchange carries two rows per
    nation — QUALIFY costs nothing extra in the emulation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").alias(
                "acctbal_cents"
            ),
            F.row_number().over(w).alias("rn"),
        )
        .filter("rn <= 2")
        .drop("rn")
        .orderBy("nationkey", F.col("acctbal_cents").desc(), "custkey")
    )


# --------------------------------------- XML build/parse roundtrip


@query(
    "xml_roundtrip_contract",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
           '<order><key>' || o_orderkey || '</key><status>'
             || o_orderstatus || '</status><cents>'
             || CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             || '</cents></order>' AS xml,
           CAST(o_orderkey AS BIGINT) AS parsed_key,
           o_orderstatus AS parsed_status,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS parsed_cents
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY orderkey
    """,
)
def xml_roundtrip_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML build/parse roundtrip on the Spark 4 native XML surface:
    serialize order fields into an XML fragment with plain string
    algebra, parse it back with ``from_xml`` under an explicit
    schema, and emit both the fragment and the parsed fields — the
    oracle rebuilds the same fragment and supplies the fields
    directly, so any from_xml coercion quirk (whitespace trim,
    numeric cast, tag-order sensitivity) surfaces as a value diff.
    The feed-ingestion contract for the XML half of the world the
    JSON ops don't cover.

    Scale shape: pure in-row build + parse on the scan, sliced to a
    bounded key range (contract demo, not a corpus op); no shuffle
    beyond the presentation sort."""
    xml = (
        "'<order><key>' || o_orderkey || '</key><status>' || o_orderstatus"
        " || '</status><cents>' || CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
        " || '</cents></order>'"
    )
    return (
        t(spark, sf_dir, "orders")
        .filter("o_orderkey < 100")
        .selectExpr("CAST(o_orderkey AS BIGINT) AS orderkey", f"{xml} AS xml")
        .select(
            "orderkey",
            "xml",
            F.from_xml(
                "xml", "key BIGINT, status STRING, cents BIGINT"
            ).alias("p"),
        )
        .select(
            "orderkey",
            "xml",
            F.col("p.key").alias("parsed_key"),
            F.col("p.status").alias("parsed_status"),
            F.col("p.cents").alias("parsed_cents"),
        )
        .orderBy("orderkey")
    )


# --------------------------------------- lateral column aliases


@query(
    "lateral_alias_contract",
    oracle="""
    SELECT source,
           CAST(SUM(y) AS BIGINT) AS sum_chained,
           CAST(SUM(p) AS BIGINT) AS sum_shadowed
    FROM (
      SELECT source,
             n_chars + 1 AS x, x * 2 AS y,          -- alias chain
             n_chars * 2 AS n_chars2, n_chars + 1 AS p
      FROM documents
    )
    GROUP BY source ORDER BY source
    """,
)
def lateral_alias_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column-alias resolution contract (Spark 3.4+ feature,
    shared by DuckDB): an alias defined earlier in the SAME select is
    referenceable (x -> y = (n_chars+1)*2), BUT a reference that
    matches a REAL underlying column resolves to the column, not a
    sibling alias — both engines prefer the relation's column, so
    shadowing an input name with an alias and then referencing it is
    a silent trap this contract keeps pinned (probed: both return
    the underlying-column reading).

    Scale shape: in-row arithmetic plus one source-keyed
    map-side-combinable rollup."""
    return (
        t(spark, sf_dir, "documents")
        .selectExpr(
            "source",
            "n_chars + 1 AS x",
            "x * 2 AS y",
            "n_chars * 2 AS n_chars2",
            "n_chars + 1 AS p",
        )
        .groupBy("source")
        .agg(
            F.sum("y").cast("bigint").alias("sum_chained"),
            F.sum("p").cast("bigint").alias("sum_shadowed"),
        )
        .orderBy("source")
    )


# --------------------------------------- IGNORE NULLS emulation


@query(
    "ignore_nulls_contract",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS pc
      FROM events
    ),
    grp AS (
      SELECT user_id, event_id, us, pc,
             COUNT(pc) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS g
      FROM e
    ),
    locf AS (
      SELECT user_id, event_id, us, pc,
             MAX(pc) OVER (PARTITION BY user_id, g) AS last_purchase_cents
      FROM grp
    )
    SELECT user_id, event_id, last_purchase_cents,
           CASE WHEN pc IS NOT NULL
                THEN LAG(last_purchase_cents)
                       OVER (PARTITION BY user_id ORDER BY us, event_id)
                ELSE last_purchase_cents END AS prev_purchase_cents
    FROM locf
    ORDER BY user_id, event_id
    """,
)
def ignore_nulls_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window contract: at every event, the user's
    last-purchase value (LOCF) and last-purchase-STRICTLY-BEFORE
    value — Spark spells both natively (``last_value ... IGNORE
    NULLS``, ``lag ... IGNORE NULLS``); engines without the syntax
    (this DuckDB) use the count-group emulation the oracle encodes:
    g = running COUNT(x) steps on each non-null, MAX(x) within
    (key, g) is the LOCF, and lag-ignore-nulls is lag(locf) on
    non-null rows / locf itself on null rows.  The two spellings must
    agree row-for-row — the portability recipe, executable.

    Scale shape: user-keyed windows end to end (thousands of
    partitions); no join, no global sort."""
    from instructions_mr_spark.queries._util import ts_epoch_micros

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        ts_epoch_micros("ts").alias("us"),
        F.expr(
            "CASE WHEN event_type = 'purchase'"
            " THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END"
        ).alias("pc"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "pc",
            F.last("pc", ignorenulls=True)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("last_purchase_cents"),
            F.expr("lag(pc) IGNORE NULLS").over(w).alias("lag_ign"),
        )
        .select(
            "user_id",
            "event_id",
            "last_purchase_cents",
            F.col("lag_ign").alias("prev_purchase_cents"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------- MapType semantics


@query(
    "map_semantics_contract",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
           o_orderstatus AS status_val,
           CAST(NULL AS BIGINT) AS missing_val,
           CAST(2 AS INT) AS n_keys,
           'cents,status' AS keys_sorted,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 2
             AS cents_doubled,
           CAST(CASE WHEN FLOOR(o_totalprice * 100 + 0.5) > 10000
                     THEN 1 ELSE 0 END AS INT) AS big_filter_kept
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY orderkey
    """,
)
def map_semantics_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType operational semantics, pinned against direct column
    computation: ``element_at`` on a present key, ``try_element_at``
    on a missing key is NULL (plain element_at THROWS under ANSI —
    the migration trap), ``map_keys`` has NO order guarantee (always
    array_sort before comparing), ``transform_values`` rewrites
    values lambda-side, and ``map_filter`` keeps matching entries.
    Every map is built, transformed and read back in-row; the oracle
    computes the same answers straight from the columns, so any map
    semantic drift diffs.

    Scale shape: in-row map algebra on a bounded key slice (contract
    demo); no shuffle beyond the presentation sort."""
    return (
        t(spark, sf_dir, "orders")
        .filter("o_orderkey < 100")
        .selectExpr(
            "CAST(o_orderkey AS BIGINT) AS orderkey",
            "map('status', CAST(o_orderstatus AS STRING),"
            " 'cents', CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            " AS STRING)) AS m",
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .selectExpr(
            "orderkey",
            "element_at(m, 'status') AS status_val",
            "CAST(try_element_at(m, 'nope') AS BIGINT) AS missing_val",
            "size(m) AS n_keys",
            "array_join(array_sort(map_keys(m)), ',') AS keys_sorted",
            "CAST(element_at(transform_values("
            "  map('cents', cents), (k, v) -> v * 2), 'cents') AS BIGINT)"
            " AS cents_doubled",
            "CAST(size(map_filter(map('cents', cents),"
            " (k, v) -> v > 10000)) AS INT) AS big_filter_kept",
        )
        .orderBy("orderkey")
    )


# --------------------------------------- SQL pipe syntax


@query(
    "sql_pipe_syntax_contract",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity < 30
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`FROM t |> WHERE ... |> AGGREGATE ...
    GROUP BY ...`): the linear query dialect, pinned against the
    standard spelling the oracle runs — stage order in pipe syntax is
    EXECUTION order (filter before aggregate, no clause reordering to
    reason about), and the AGGREGATE stage's GROUP BY columns come
    back first in the output schema.  Same plan, different grammar —
    Catalyst compiles both to the identical aggregate.

    Scale shape: identical to q1 — one map-side-combinable aggregate
    over the filtered scan."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_quantity < 30
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                     CAST(COUNT(*) AS BIGINT) AS n
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, n
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


# --------------------------------------- DataFrame.transpose


@query(
    "transpose_contract",
    oracle="""
    WITH g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang
    )
    SELECT 'n_docs' AS key,
           (SELECT n_docs FROM g WHERE lang = 'de') AS de,
           (SELECT n_docs FROM g WHERE lang = 'en') AS en,
           (SELECT n_docs FROM g WHERE lang = 'es') AS es,
           (SELECT n_docs FROM g WHERE lang = 'fr') AS fr,
           (SELECT n_docs FROM g WHERE lang = 'zh') AS zh
    UNION ALL
    SELECT 'sum_chars',
           (SELECT sum_chars FROM g WHERE lang = 'de'),
           (SELECT sum_chars FROM g WHERE lang = 'en'),
           (SELECT sum_chars FROM g WHERE lang = 'es'),
           (SELECT sum_chars FROM g WHERE lang = 'fr'),
           (SELECT sum_chars FROM g WHERE lang = 'zh')
    ORDER BY key
    """,
)
def transpose_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose()`` (Spark 4): metric rows become
    columns keyed by the first column's VALUES — pinned against the
    hand-built scalar-subquery transpose.  The contract points: the
    index column is named ``key``, new columns take the index
    column's values in first-column order (the five-language set —
    data-dependent schemas are why transpose belongs on SMALL
    aggregate outputs only, never a corpus table), and uniform input
    types survive (all-BIGINT metrics stay BIGINT, no silent
    stringify).

    Scale shape: transpose collects the (tiny) aggregate to pivot its
    schema — correct ONLY after a bounded roll-up, which is exactly
    how this query uses it (5 langs x 2 metrics)."""
    g = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )
    return g.transpose().orderBy("key")


# --------------------------------------- zip_with length padding


@query(
    "zip_longest_contract",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(5 AS BIGINT) AS zipped_len,
           CAST(150
                + CASE WHEN len(ws) >= 1 THEN LENGTH(ws[1]) ELSE 0 END
                + CASE WHEN len(ws) >= 2 THEN LENGTH(ws[2]) ELSE 0 END
                + CASE WHEN len(ws) >= 3 THEN LENGTH(ws[3]) ELSE 0 END
                AS BIGINT) AS padded_sum
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def zip_longest_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``zip_with`` LENGTH semantics: Spark zips to the LONGEST input
    and fills the short side with NULL (SQL-standard engines
    with list_zip often truncate to the shortest — the silent
    data-loss direction).  Pinned by zipping each document's first-3
    tokens against the fixed weight list [10,20,30,40,50]: the result
    length must be 5 (the longer side, for docs with <= 5 tokens
    capped at 3 vs 5), and the padded sum treats NULL tokens as
    length 0 via COALESCE — the defensive spelling a port needs
    either way.

    Scale shape: in-row array algebra on a bounded slice; no
    shuffle."""
    ws3 = F.slice(F.split("text", " "), 1, 3)
    weights = F.array(*[F.lit(x) for x in (10, 20, 30, 40, 50)])
    zipped = F.zip_with(
        ws3, weights, lambda w, x: F.coalesce(F.length(w), F.lit(0)) + x
    )
    return (
        t(spark, sf_dir, "documents")
        .filter("doc_id < 50")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.size(zipped).cast("bigint").alias("zipped_len"),
            F.aggregate(zipped, F.lit(0).cast("bigint"), lambda a, x: a + x)
            .cast("bigint")
            .alias("padded_sum"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------- array edit + string index


@query(
    "array_edit_contract",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           array_to_string(list_concat(list_concat([ws[1]], ['INS']),
                                       ws[2:3]), ',') AS inserted_at_2,
           array_to_string(list_concat(ws[1:3], ['TAIL']), ',')
             AS appended_neg1,
           array_to_string(list_filter([ws[1], NULL, ws[2], NULL],
                                       x -> x IS NOT NULL), ',')
             AS compacted,
           array_to_string(['x', 'x', 'x'], ',') AS repeated,
           substr(text, -8) AS last8,
           lpad(ws[1], 10, '.') AS padded
    FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
          FROM documents)
    WHERE doc_id < 40 AND len(ws) >= 3
    ORDER BY doc_id
    """,
)
def array_edit_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-editing and negative-index string surface (Spark 3.4+
    additions), pinned against DuckDB list spellings: ``array_insert``
    at a POSITIVE index shifts right (1-based; insert at 2 lands
    between the first and second element), at -1 it APPENDS (the
    probe result this contract freezes — several engines instead
    insert before the last element), ``array_compact`` strips NULLs
    (list_filter twin), ``array_repeat`` builds constant arrays, and
    ``substr(s, -8)`` counts from the end identically on both
    engines; multichar ``lpad`` fills left-to-right.

    Scale shape: in-row array algebra on a bounded slice; no
    shuffle."""
    ws = F.split("text", " ")
    return (
        t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 40) & (F.size(F.split("text", " ")) >= 3))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.array_join(
                F.array_insert(F.slice(ws, 1, 3), 2, F.lit("INS")), ","
            ).alias("inserted_at_2"),
            F.array_join(
                F.array_insert(F.slice(ws, 1, 3), -1, F.lit("TAIL")), ","
            ).alias("appended_neg1"),
            F.array_join(
                F.array_compact(
                    F.array(
                        F.element_at(ws, 1),
                        F.lit(None).cast("string"),
                        F.element_at(ws, 2),
                        F.lit(None).cast("string"),
                    )
                ),
                ",",
            ).alias("compacted"),
            F.array_join(F.array_repeat(F.lit("x"), 3), ",").alias("repeated"),
            F.expr("substr(text, -8)").alias("last8"),
            F.lpad(F.element_at(ws, 1), 10, ".").alias("padded"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------- SQL-defined functions


@query(
    "sql_udf_contract",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
           CAST(l_linenumber AS BIGINT) AS linenumber,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(FLOOR((CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))
                      / 100) AS BIGINT) AS discounted_cents
    FROM lineitem
    WHERE l_orderkey < 50
    ORDER BY orderkey, linenumber
    """,
)
def sql_udf_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 3.5 ``CREATE TEMPORARY
    FUNCTION ... RETURN expr`` — DuckDB's twin is ``CREATE MACRO``):
    a cents converter and a discount function that CALLS the first
    (nested SQL-UDF invocation), applied over a lineitem slice and
    pinned against the fully-inlined oracle expression — so the
    contract covers definition, nested resolution, and the promise
    that a SQL UDF is pure inlining (Catalyst substitutes the body;
    same plan, no black box, predicate pushdown unbroken).

    Scale shape: in-row arithmetic on a bounded slice; functions are
    session-scoped temporaries (re-created idempotently)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION imr_to_cents(x DOUBLE)"
        " RETURNS BIGINT RETURN CAST(FLOOR(x * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION imr_discounted(p DOUBLE, d DOUBLE)"
        " RETURNS BIGINT RETURN"
        " CAST(FLOOR((imr_to_cents(p) * (100 - imr_to_cents(d))) / 100) AS BIGINT)"
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    return spark.sql(
        """
        SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
               CAST(l_linenumber AS BIGINT) AS linenumber,
               imr_to_cents(l_extendedprice) AS cents,
               imr_discounted(l_extendedprice, l_discount) AS discounted_cents
        FROM sqludf_lineitem
        WHERE l_orderkey < 50
        ORDER BY orderkey, linenumber
        """
    )


# ----------------------------- substring_index semantics contract


@query(
    "substring_index_contract",
    oracle="""
    WITH cases(cid, s, n) AS (
      VALUES (1, 'a/b/c/d', 2), (2, 'a/b/c/d', -2), (3, 'a/b/c/d', 0),
             (4, 'a/b/c/d', 9), (5, 'a/b/c/d', -9), (6, 'no_delim', 2),
             (7, '', 1), (8, '/lead/trail/', 2), (9, '/lead/trail/', -2),
             (10, 'a//b', 2)
    ),
    split AS (SELECT cid, s, n, string_split(s, '/') AS parts FROM cases)
    SELECT cid, s, CAST(n AS BIGINT) AS n,
           CASE
             WHEN n = 0 THEN ''
             WHEN n > 0 AND n >= len(parts) THEN s
             WHEN n < 0 AND -n >= len(parts) THEN s
             WHEN n > 0 THEN array_to_string(parts[1:n], '/')
             ELSE array_to_string(parts[len(parts) + n + 1:len(parts)], '/')
           END AS head_or_tail
    FROM split ORDER BY cid
    """,
)
def substring_index_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``substring_index`` semantics pin — the function every URL /
    path / domain extraction in the repo leans on, with the edge
    cases that differ silently across engines: n = 0 (empty string,
    NOT NULL), |n| >= the number of parts (the WHOLE input comes
    back, delimiters included), negative n (count from the right),
    empty input, leading/trailing delimiters (empty fields count as
    parts), and doubled delimiters.  DuckDB has no substring_index,
    so the oracle is the split/slice/join EMULATION — the contract
    pins that the emulation and the builtin agree on every branch,
    which is exactly what a migration in either direction needs.

    Scale shape: 10 literal rows; in-row string functions only."""
    cases = literal_df(spark,
        [
            (1, "a/b/c/d", 2), (2, "a/b/c/d", -2), (3, "a/b/c/d", 0),
            (4, "a/b/c/d", 9), (5, "a/b/c/d", -9), (6, "no_delim", 2),
            (7, "", 1), (8, "/lead/trail/", 2), (9, "/lead/trail/", -2),
            (10, "a//b", 2),
        ],
        "cid int, s string, n int",
    )
    return cases.selectExpr(
        "cid",
        "s",
        "CAST(n AS BIGINT) AS n",
        "substring_index(s, '/', n) AS head_or_tail",
    ).orderBy("cid")


# --------------------------------- VARIANT (Spark 4) shredding


@query(
    "variant_shred_contract",
    oracle="""
    WITH built AS (
      SELECT event_type,
             json_object(
               'id', event_id,
               'u', json_object('uid', user_id,
                                'vals', json_array(value, value * 2)),
               'ty', event_type
             ) AS js
      FROM events
    ),
    shredded AS (
      SELECT event_type,
             CAST(js ->> '$.u.uid' AS BIGINT) AS uid,
             CAST(js ->> '$.u.vals[1]' AS DOUBLE) AS v2,
             js ->> '$.missing' AS absent
      FROM built
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(uid) AS BIGINT) AS uid_sum,
           CAST(SUM(CAST(FLOOR(v2 * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS v2_cents_sum,
           CAST(SUM(CASE WHEN absent IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_null
    FROM shredded GROUP BY event_type ORDER BY event_type
    """,
)
def variant_shred_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type contract — the open-schema semi-structured
    path (parse_json -> VARIANT -> variant_get typed extraction) that
    replaces string get_json_object at scale: each event is rebuilt
    as a nested JSON document (object-in-object plus an array),
    parsed to VARIANT once, and shredded with typed paths — a nested
    field as BIGINT, an array element by index as DOUBLE, and a
    missing path (must be NULL, not an error).  DuckDB has no
    VARIANT; the oracle is its JSON-arrow extraction over the same
    constructed document, so the contract pins that VARIANT
    extraction and classic JSON pathing agree on values, array
    indexing (variant_get is 0-based via [1] meaning second element
    in BOTH dialects here), and missing-path semantics.

    Scale shape: document build + parse + shred are all in-row; one
    bounded group-by on event_type.  VARIANT's binary encoding is
    the part that matters at 100 TB — parse once, extract many, no
    re-tokenizing per path (measured motivation for SPARK-45891)."""
    e = t(spark, sf_dir, "events")
    built = e.select(
        "event_type",
        F.expr(
            "parse_json(to_json(named_struct("
            "'id', event_id,"
            "'u', named_struct('uid', user_id, 'vals', array(value, value * 2)),"
            "'ty', event_type)))"
        ).alias("v"),
    )
    shredded = built.select(
        "event_type",
        F.expr("variant_get(v, '$.u.uid', 'bigint')").alias("uid"),
        F.expr("variant_get(v, '$.u.vals[1]', 'double')").alias("v2"),
        F.expr("variant_get(v, '$.missing', 'string')").alias("absent"),
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("uid").cast("bigint").alias("uid_sum"),
            F.expr(
                "CAST(SUM(CAST(FLOOR(v2 * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            ).alias("v2_cents_sum"),
            F.expr(
                "CAST(SUM(CASE WHEN absent IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_missing_null"),
        )
        .orderBy("event_type")
    )


# ------------------------- window frame EXCLUDE CURRENT ROW


@query(
    "window_exclude_emulation",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(CAST(FLOOR(value * 100) AS BIGINT) AS BIGINT) AS cents,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                  EXCLUDE CURRENT ROW) AS BIGINT) AS peer_cents,
           CAST(COUNT(*) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                  EXCLUDE CURRENT ROW) AS BIGINT) AS n_peers
    FROM events
    WHERE user_id < 40
    ORDER BY user_id, event_id
    """,
)
def window_exclude_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXCLUDE CURRENT ROW`` window-frame emulation — the
    leave-one-out neighborhood statistic (peer average, self-excluded
    anomaly baselines) that DuckDB/Postgres express with the SQL:2011
    frame-exclusion clause Spark doesn't implement: the emulation is
    frame_agg - current_row (for SUM) and frame_count - 1 (for
    COUNT), exact because cents are integers.  The oracle runs the
    REAL EXCLUDE clause, so the contract certifies the emulation
    against the native semantics, including both partition edges
    (frames truncate identically on both sides).

    Scale shape: one user-keyed window pass over a pruned scan; the
    exclusion is plain column arithmetic on top."""
    from pyspark.sql import Window

    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .selectExpr(
            "CAST(user_id AS BIGINT) AS user_id",
            "CAST(event_id AS BIGINT) AS event_id",
            "ts",
            "CAST(FLOOR(value * 100) AS BIGINT) AS cents",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "cents",
            (F.sum("cents").over(w) - F.col("cents")).alias("peer_cents"),
            (F.count(F.lit(1)).over(w) - F.lit(1)).cast("bigint").alias("n_peers"),
        )
        .orderBy("user_id", "event_id")
    )


# ----------------------------- Observation (observe) metrics


@query(
    "observation_metrics_contract",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_open
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def observation_metrics_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe`` contract — Spark's zero-extra-pass
    pipeline observability: named aggregate metrics attach to a plan
    node and are collected as a SIDE EFFECT of whatever action the
    query already runs, which is how a production pipeline audits
    row counts / value totals without a second scan.  The query
    materializes the observed stream once (noop-equivalent count),
    reads the metrics off the Observation handle, and returns them as
    a 1-row DataFrame the oracle recomputes as plain aggregates — so
    the contract pins that observed metrics equal the ground truth,
    exactly, on a pruned filtered scan.

    Scale shape: metrics ride the existing single pass (accumulator
    semantics); the returned table is one literal row."""
    from pyspark.sql import Observation

    obs = Observation("orders_audit")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.expr(
                    "CAST(FLOOR(CAST(o_totalprice AS DECIMAL(12,2)) * 100)"
                    " AS BIGINT)"
                )
            ).alias("total_cents"),
            F.sum((F.col("o_orderstatus") == "O").cast("int")).alias("n_open"),
        )
    )
    o.write.format("noop").mode("overwrite").save()  # the one pass
    m = obs.get
    return literal_df(spark,
        [(int(m["n_rows"]), int(m["total_cents"]), int(m["n_open"]))],
        "n_rows bigint, total_cents bigint, n_open bigint",
    )


# ------------------------------ stat.crosstab contingency table


_CT_SOURCES = [f"src{i}" for i in range(20)]


@query(
    "stat_crosstab_contract",
    oracle="""
    SELECT lang AS lang_source,
           """
    + ",\n           ".join(
        f"CAST(SUM(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {s}"
        for s in _CT_SOURCES
    )
    + """
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def stat_crosstab_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` contract — the DataFrameStatFunctions
    contingency-table API (pairwise frequency of two categorical
    columns, zero-filled), pinned against explicit conditional
    aggregation: one row per language, one BIGINT column per source.
    The API is sugar over a (lang, source) count + pivot; the
    contract certifies the zero-fill and the column-per-value
    encoding agree with the hand-rolled form (the fixture generates
    exactly the 20 sources the oracle enumerates).

    Scale shape: ONE map-side-combinable (lang, source) count; the
    pivot runs on |langs| x |sources| bounded cells."""
    ct = (
        t(spark, sf_dir, "documents")
        .stat.crosstab("lang", "source")
    )
    return ct.select(
        "lang_source", *[F.col(s).cast("bigint").alias(s) for s in _CT_SOURCES]
    ).orderBy("lang_source")


# --------------------------- file provenance + generated ids


@query(
    "file_provenance_contract",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,
           TRUE AS row_index_contiguous_per_file,
           TRUE AS monotonic_ids_unique
    FROM lineitem
    """,
)
def file_provenance_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-provenance contract — the lineage surface a 100 TB
    curation pipeline leans on for 'which file did this training row
    come from': the hidden ``_metadata`` struct (file_name,
    row_index) and ``monotonically_increasing_id()``.  The pinned
    semantics: row_index is a contiguous 0-based counter WITHIN each
    file (so file_name + row_index is a durable row address across
    re-reads, which a generated id is NOT), and generated ids are
    globally unique in one job.  Booleans are computed layout-
    independently (single-file and directory parquet both pass);
    DuckDB recomputes rows_total and asserts the TRUE contract.

    Scale shape: one scan; per-file bounds are a file-count-sized
    aggregate; the uniqueness check is one distinct count over ids
    (corpus-keyed — the one honest exchange here)."""
    m = t(spark, sf_dir, "lineitem").select(
        F.col("_metadata.file_name").alias("fn"),
        F.col("_metadata.row_index").alias("ri"),
        F.monotonically_increasing_id().alias("mid"),
    )
    per_file = m.groupBy("fn").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("ri").alias("mn"),
        F.max("ri").alias("mx"),
    )
    contig = per_file.agg(
        F.expr("BOOL_AND(mn = 0 AND mx = cnt - 1)").alias("ok")
    )
    uniq = m.agg(
        (F.countDistinct("mid") == F.count(F.lit(1))).alias("ok"),
        F.count(F.lit(1)).cast("bigint").alias("rows_total"),
    )
    return uniq.crossJoin(F.broadcast(contig.select(F.col("ok").alias("c_ok")))).select(
        "rows_total",
        F.col("c_ok").alias("row_index_contiguous_per_file"),
        F.col("ok").alias("monotonic_ids_unique"),
    )
