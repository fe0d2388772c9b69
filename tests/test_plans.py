"""Plan-shape assertions (SURVEY.md §4): the engine must emit plans
where Catalyst's pushdown/broadcast actually fire — correctness of the
*physical* strategy, not just the results."""

from __future__ import annotations

from instructions_mr_spark import registry

registry.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = registry.QUERIES["filter_pred"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not an empty list
    assert "PushedFilters: []" not in plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    """scope_project must scan only scoped columns (the reference's
    hand-rolled scope optimization, done by Catalyst for us)."""
    df = registry.QUERIES["scope_project"](spark, sf_dir)
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema and "props" not in read_schema


def test_broadcast_join_fires(spark, sf_dir):
    df = registry.QUERIES["join_broadcast"](spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)


def test_q1_wholestage_codegen(spark, sf_dir):
    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE finalizes the plan (and codegen spans) on execution
    plan = _plan(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string;
    # also require a partial (map-side) aggregate before the exchange.
    assert "*(1)" in plan
    assert "partial_sum" in plan


def test_topk_global_uses_take_ordered(spark, sf_dir):
    df = registry.QUERIES["topk_global"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)


def test_semi_anti_join_operators(spark, sf_dir):
    semi = _plan(registry.QUERIES["join_semi"](spark, sf_dir))
    anti = _plan(registry.QUERIES["join_anti"](spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_asof_join_has_no_python_stage(spark, sf_dir):
    """The as-of join must stay JVM-side (no mapInPandas/ArrowEval in
    the plan)."""
    df = registry.QUERIES["join_asof"](spark, sf_dir)
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" not in plan


def test_salted_join_exchanges_on_key_and_salt(spark, sf_dir):
    """The skew-salted join must hash-exchange on (key, salt), not
    broadcast (which would make the salt moot)."""
    df = registry.QUERIES["join_salted_skew"](spark, sf_dir)
    plan = _plan(df)
    assert "ShuffledHashJoin [l_orderkey" in plan and "salt" in plan


def test_embedding_dedup_joins_on_band_bucket(spark, sf_dir):
    """LSH candidate generation must key the self-join exchange on the
    (band, bucket) pair — that's the sub-quadratic blocking."""
    df = registry.QUERIES["dedup_embedding_cosine"](spark, sf_dir)
    plan = _plan(df)
    assert "band" in plan and "bucket" in plan


def test_no_python_stage_outside_allowlist(spark, sf_dir):
    """Mechanical 'UDFs are the slow path' guarantee: every registered
    query must compile to a pure-JVM plan unless it is one of the
    operators that are Python BY DESIGN (the LLM executor, the
    multimodal decode plumbing, the UDF-surface-parity queries).  A
    regression that sneaks a Python eval into a relational query fails
    here, not in a 100 TB run."""
    PYTHON_BY_DESIGN = {
        "llm_echo_map", "llm_echo_map_arrow", "llm_echo_mapreduce",
        "llm_echo_mapreduce_fused", "sv_pipeline_echo",
        "multimodal_decode_fake", "multimodal_frame_sample",
        "udf_pandas_scalar", "udaf_grouped_pandas", "udaf_grouped_arrow",
        "udtf_tokenize", "udtf_dynamic_topn", "udf_arrow_scalar",
        # next-fit packing is a sequential capped-reset fold — not
        # expressible in window algebra, Python by design (packing.py)
        "pack_greedy", "pack_greedy_sharded",
        # real header decode runs stdlib struct parsing in the
        # mapInPandas kernel — Python by design (multimodal.py)
        "multimodal_decode_real",
        "multimodal_audio_real",
        "multimodal_video_real",
        # the preprocessing plans compose those same stdlib decode
        # kernels before their in-row schedule algebra (round 10)
        "multimodal_frame_sample_plan",
        "multimodal_tile_plan",
        "multimodal_audio_chunk_plan",
        # UDF-surface-parity contracts: the pandas grouped-agg, pandas
        # window, and cogrouped applyInPandas surfaces — Python IS the
        # operator under test (VERDICT r10 "What's wrong" #1: these
        # passed the sweep only because ArrowAggregatePython /
        # ArrowWindowPython / FlatMapCoGroupsInPandas were missing
        # from MARKERS; now they match and are allowlisted by design)
        "pandas_grouped_agg_udf",
        "pandas_udf_over_window",
        "cogrouped_pandas_event_order_merge",
        # the winnowing kernel moved to an Arrow-batched mapInPandas
        # (round 12 session 5, guide §4.2): ~965k interpreted md5+CONV
        # HOF elements dominated the JVM chain (73 us/element,
        # transform() is CodegenFallback); the Arrow kernel measured
        # 3.23-3.30 -> 1.26-1.46 s at sf0.1 with row-identical output
        # (queries/text.py::_winnow_batches has the exactness
        # argument; the DuckDB oracle revalidates every value)
        "winnowing_fingerprints",
    }
    # iterative/ML queries execute work at plan-build time — checked
    # by their own tests, skipped here to keep the sweep fast
    SKIP = {
        "dedup_cluster_cc", "dedup_cluster_cc_star", "sim_search_ivf_kmeans",
        "graph_pagerank",
    }
    # Full Python-exec physical-node inventory for the pinned Spark
    # (4.1.2), read from spark-sql_2.13-4.1.2.jar's
    # org/apache/spark/sql/execution/python/*Exec.class
    # (test_markers_inventory_matches_installed_spark fails on any
    # version bump until this inventory is re-read from the new jar):
    #   BatchEvalPython, ArrowEvalPython         (row / Arrow scalar UDF)
    #   BatchEvalPythonUDTF, ArrowEvalPythonUDTF (UDTF — substring
    #                                             "PythonUDTF" covers both)
    #   MapInPandas, MapInArrow                  (mapInPandas/mapInArrow)
    #   FlatMapGroupsInPandas, FlatMapGroupsInArrow   (applyInPandas/Arrow;
    #       substring also covers FlatMapGroupsInPandasWithStateExec)
    #   FlatMapCoGroupsInPandas, FlatMapCoGroupsInArrow (cogroup.applyIn*)
    #   ArrowAggregatePython                     (grouped-agg pandas UDF)
    #   ArrowWindowPython                        (pandas UDF over a window)
    #   AttachDistributedSequence                (pandas-on-Spark default
    #       index — JVM-side sequence attach, not a Python worker; omitted)
    #   EvalPython / MapInBatch / FlatMap*InBatch (abstract bases — never
    #       rendered in explain output; their concrete names are above)
    # Streaming-only (registry queries are batch; listed for completeness):
    #   FlatMapGroupsInPandasWithState, TransformWithStateInPySpark.
    MARKERS = (
        "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
        "FlatMapGroupsInPandas", "FlatMapGroupsInArrow", "MapInArrow",
        "PythonUDTF", "FlatMapCoGroupsInPandas", "FlatMapCoGroupsInArrow",
        "ArrowAggregatePython", "ArrowWindowPython",
    )
    offenders = []
    for name, fn in sorted(registry.QUERIES.items()):
        if name in SKIP or name in PYTHON_BY_DESIGN:
            continue
        plan = _plan(fn(spark, sf_dir))
        hit = [m for m in MARKERS if m in plan]
        if hit:
            offenders.append((name, hit))
    assert not offenders, f"Python stages in JVM-only queries: {offenders}"


def test_markers_inventory_matches_installed_spark():
    """The MARKERS tuple above is a hand-read inventory of the Python
    exec nodes in spark-sql_2.13-4.1.2.jar; a marker name missing from
    it makes the allowlist sweep silently blind to that node kind
    (VERDICT r10 "What's wrong" #1 was exactly this).  The inventory
    is only valid for the version it was read from — fail on any bump
    until someone re-reads org/apache/spark/sql/execution/python/
    *Exec.class in the new jar and re-dates this pin (VERDICT r11
    item #6).  Re-inventoried: round 11 (4.1.2)."""
    import pyspark

    assert pyspark.__version__ == "4.1.2", (
        f"Spark is {pyspark.__version__}, but the Python-stage MARKERS "
        "inventory in test_no_python_stage_outside_allowlist was read "
        "from the 4.1.2 jar — re-read the python exec node list and "
        "update both the inventory comment and this pin"
    )


def test_every_registered_query_has_an_oracle():
    """Zero rows-only entries: every queries() key must have an
    oracle_sql() twin — a future rows-only addition must be a
    conscious decision, not a drift."""
    assert set(registry.QUERIES) == set(registry.ORACLES)
    assert len(registry.QUERIES) >= 160


def test_readme_query_count_matches_registry():
    """README's 'N of N' correctness claim must equal the registry
    size — it went stale once (VERDICT r4 'What's wrong' #3)."""
    import os
    import re

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"(\d+) of (\d+), zero rows-only", readme)
    assert m, "README correctness claim sentence not found"
    n = len(registry.QUERIES)
    assert (int(m.group(1)), int(m.group(2))) == (n, n)


def test_survey_query_count_matches_registry():
    """SURVEY.md's 'N of N registered queries' status sentence must
    equal the registry size — it drifted once (VERDICT r7 'What's
    wrong' #2: said 296 while the registry was 365)."""
    import os
    import re

    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    m = re.search(r"(\d+) of (\d+) registered\s+queries, zero rows-only", survey)
    assert m, "SURVEY status count sentence not found"
    n = len(registry.QUERIES)
    assert (int(m.group(1)), int(m.group(2))) == (n, n)


def test_driver_window_ordering():
    """The correctness driver samples the FIRST ~50 queries() entries,
    so the registry must put DRIVER_WINDOW (the never-driver-checked
    LLM-pipeline inventory) at the front, in the declared order, with
    no typo'd / stale names in the list."""
    names = list(registry.QUERIES)
    window = registry.DRIVER_WINDOW
    missing = [n for n in window if n not in registry.QUERIES]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    # the driver checks exactly the first 50 entries (r5 evidence: all
    # 50 window names landed in CORRECTNESS_r05.json) — a shorter list
    # wastes checked slots, a longer one silently truncates
    assert len(window) == 50, len(window)
    assert names[: len(window)] == window
    # oracle dict must be reordered in lockstep (driver zips them)
    assert list(registry.ORACLES)[: len(window)] == [
        n for n in window if n in registry.ORACLES
    ]


def test_pack_quantized_single_exchange(spark, sf_dir):
    """Boundary-splitting packing must stay one window pass: exactly
    one hash exchange (on source), no Python stage."""
    plan = _plan(registry.QUERIES["pack_quantized"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "Pandas" not in plan


def test_pack_greedy_sharded_fans_out(spark, sf_dir):
    """The sharded packer must exchange on (source, shard) — K tasks
    per source instead of one — and actually produce K shards per
    source on data (the straggler fix for a single giant source)."""
    from instructions_mr_spark.queries.packing import PACK_SHARDS

    df = registry.QUERIES["pack_greedy_sharded"](spark, sf_dir)
    plan = _plan(df)
    assert "hashpartitioning(source" in plan and "shard" in plan
    groups = df.select("source", "shard").distinct().groupBy("source").count()
    counts = {r["source"]: r["count"] for r in groups.collect()}
    # every source must fan out to multiple shards (a sparse source may
    # miss a shard at tiny SF, hence >= rather than ==)
    assert counts and all(2 <= c <= PACK_SHARDS for c in counts.values()), counts


def test_outlier_iqr_broadcasts_quantiles(spark, sf_dir):
    """The per-group quantile table must come back as a broadcast —
    the fact scan never shuffles for the fence check."""
    plan = _plan(registry.QUERIES["outlier_iqr"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_zscore_single_exchange_two_windows(spark, sf_dir):
    """avg and stddev must share the one group-key exchange."""
    plan = _plan(registry.QUERIES["zscore_by_group"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_split_leakage_band_exchange_is_narrow(spark, sf_dir):
    """The leakage audit's band-keyed candidate exchanges must carry
    NO array columns (r6 verdict: shingle arrays riding a band
    exchange multiply per matching band — the SemDeDup 4.2× shuffle
    shape).  Formatted explain lists each Exchange's Input columns;
    every exchange keyed on the band key must be array-free."""
    df = registry.QUERIES["split_leakage_audit"](spark, sf_dir)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # split into per-node sections; Exchange sections carrying the
    # band/key pair must not list shingles among their inputs
    sections = formatted.split("\n\n")
    band_exchanges = [
        s for s in sections
        if s.lstrip().startswith("(") and "Exchange" in s.splitlines()[0]
        and "band" in s and "key" in s
    ]
    assert band_exchanges, "expected at least one band-keyed exchange"
    for s in band_exchanges:
        assert "shingles" not in s, s


def test_lsh_band_exchange_is_narrow(spark, sf_dir):
    """Same narrow-exchange guarantee for the LSH family proper: the
    band-keyed candidate exchanges of dedup_minhash_lsh and its salted
    twin must carry no shingle arrays (r7 restructure — shingles join
    back by doc id in the verify)."""
    for name in ("dedup_minhash_lsh", "dedup_minhash_lsh_salted"):
        df = registry.QUERIES[name](spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        sections = formatted.split("\n\n")
        band_exchanges = [
            s for s in sections
            if s.lstrip().startswith("(") and "Exchange" in s.splitlines()[0]
            and "band" in s and "key" in s
        ]
        assert band_exchanges, f"{name}: expected a band-keyed exchange"
        for s in band_exchanges:
            assert "shingles" not in s, (name, s)


def _partitionless_window_nodes(df) -> list[str]:
    """Node headers of partitionless Window / WindowGroupLimit nodes in
    the formatted plan.  WindowGroupLimit prints
    ``Arguments: [partitionSpec], [orderSpec], fn, k, mode`` (empty
    partition spec -> leading ``[], [``); Window prints
    ``windowspecdefinition(partCols..., orderCols..., frame)`` whose
    FIRST argument is an order entry (``ASC``/``DESC``) or the frame
    itself iff there is no partition spec."""
    import re

    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    hits = []
    for section in formatted.split("\n\n"):
        lines = section.strip().splitlines()
        if not lines or "Window" not in lines[0]:
            continue
        head = lines[0].strip()
        arg = next(
            (ln[len("Arguments: "):] for ln in lines if ln.startswith("Arguments: ")),
            "",
        )
        if "WindowGroupLimit" in head:
            if arg.startswith("[], ["):
                hits.append(head)
        else:
            for m in re.finditer(r"windowspecdefinition\(", arg):
                first = arg[m.end():].split(",", 1)[0]
                if (
                    "specifiedwindowframe" in first
                    or " ASC" in first
                    or " DESC" in first
                ):
                    hits.append(head)
                    break
    return hits


def test_no_global_window_outside_allowlist(spark, sf_dir):
    """Mechanical 'no single-partition sort at 100 TB' guarantee
    (VERDICT r7 'What's wrong' #1): a partitionless Window collapses
    its whole input to ONE task, so every registered query must
    compile without one UNLESS the window provably runs over a
    BOUNDED table — bounded by a value domain, a calendar, a decile /
    bucket count, or an operator contract — never by data
    cardinality.  The r7 offenders (customer_rfm_segments,
    pareto_revenue_share, decile_lift_table, segment_migration_matrix,
    quality_bucket_shares, plus abc_classification) now run the
    two_phase_rank / two_phase_cumsum bucketed prefix-sum swap
    (queries/_util.py) and must stay out of this list."""
    BOUNDED_WINDOW_OK = {
        # decile / class roll-ups: <= k rows by construction
        "pareto_revenue_share",      # 10-row decile cum share
        "decile_lift_table",         # 10-row decile cum lift
        # bucket-offset roll-ups: bucket-domain-sized (64 / few hundred)
        "pack_concat_chunks",        # 64-row order-hash bucket offsets
        # value-domain histograms (distinct VALUES, not entities)
        "percentile_exact_twophase", # distinct cents values
        "auc_mann_whitney",          # distinct score values
        "sketch_quantile_merge",     # bounded histogram bins
        "join_key_skew_profile",     # key-COUNT histogram (Zipf-bounded)
        "shuffle_skew_forecast",     # fixed 200-row partition table
        "session_duration_profile",  # distinct duration values
        "t_closeness_audit",         # global bucket distribution (m rows)
        "zone_map_skip_audit",       # one row per parquet row-group/file
        # calendar-bounded grids
        "rolling_corr_terms",        # hour grid of a fixed date range
        "best_split_sse_terms",      # day grid of a fixed date range
        "stl_residual_daily",        # day grid of a fixed date range
        "rsi_cutler_daily",          # day grid of a fixed date range
        "bollinger_breach_daily",    # day grid of a fixed date range
        "drawdown_daily",            # day grid of a fixed date range
        "updown_streaks",            # day grid of a fixed date range
        "trend_accel_7v28",          # day grid of a fixed date range
        "theil_sen_slope",           # day-pair-bounded slope histogram
        "user_acquisition_curve",    # one row per calendar day
        # language-/vocabulary-sized tables (Zipf: vocab << corpus)
        "zipf_vocab_fit",            # frequency histogram
        "vocab_coverage",            # vocab running sum (documented swap)
        "benjamini_hochberg_fdr",    # BH rank over tested vocab terms
        # small-domain dimension tables
        "metric_change_contribution",  # one row per segment
        "budget_apportion_hamilton",   # one row per source
        "skyline_price_size",          # dim-table skyline (documented swap)
        # bounded candidate sets / contract-bounded inputs
        "rank_fusion_borda",         # term-pruned candidate set
        "rank_fusion_rrf",           # term-pruned candidate set
        "window_ntile_cume",         # operator demo on a bounded slice
        # the global sort IS the semantics
        "range_partition_bounds",
    }
    SKIP = {
        "dedup_cluster_cc", "dedup_cluster_cc_star", "sim_search_ivf_kmeans",
        "graph_pagerank",
    }
    offenders = []
    for name, fn in sorted(registry.QUERIES.items()):
        if name in SKIP or name in BOUNDED_WINDOW_OK:
            continue
        hits = _partitionless_window_nodes(fn(spark, sf_dir))
        if hits:
            offenders.append((name, hits))
    assert not offenders, f"partitionless Window in: {offenders}"


def test_two_phase_rank_queries_bucket_keyed(spark, sf_dir):
    """The rewritten global-NTILE family must exchange its doc/entity
    window on the two-phase bucket column (K-way parallel), proving
    the swap actually compiled in (not just the absence of the global
    window)."""
    for name, bucket_col in [
        ("customer_rfm_segments", "__rrn_b"),
        ("pareto_revenue_share", "__rn_b"),
        ("decile_lift_table", "__rn_b"),
        ("segment_migration_matrix", "__ern_b"),
        ("quality_bucket_shares", "__rn_b"),
        ("abc_classification", "_cum_cents_b"),
    ]:
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        assert f"hashpartitioning({bucket_col}" in plan, (name, bucket_col)


def test_pack_concat_chunks_bucketed_prefix_sum(spark, sf_dir):
    """The global prefix sum must run as the two-phase scan: the
    doc-level running-sum window exchanges on the order-range bucket
    (64-way parallel), never a single global-order window over the
    full table (the tiny 64-row offset roll-up is the only
    unpartitioned window allowed)."""
    df = registry.QUERIES["pack_concat_chunks"](spark, sf_dir)
    plan = _plan(df)
    assert "hashpartitioning(bucket" in plan


def test_no_unbounded_broadcast_hints(spark, sf_dir):
    """Mechanical 'no forced broadcast of a corpus-scaling table'
    guarantee (VERDICT r8 'What's wrong' #1): a ``F.broadcast()`` hint
    — unlike an AQE/estimate-chosen broadcast, which backs off when
    the measured size is large — is a deterministic executor OOM once
    the hinted side outgrows memory.  Every registered query must
    compile with broadcast HINTS only on provably bounded subtrees:
    nation/region, literal tables, LIMITs, value-domain/calendar/
    bucket-keyed aggregates, or an entity-id pinned to a literal (a
    1-row query vector, a <=K probe set).  The r8 offenders (four
    per-user/customer hints) plus the part/supplier/customer TPC-H
    dim hints and the uncapped probe/bench sets were all removed or
    capped this round; a returning hint fails here, not in a 100 TB
    run.  Certification logic lives in tools/broadcast_guard.py
    (parses the optimized logical plan, where EliminateResolvedHint
    has attached each user hint to its join)."""
    import tools.broadcast_guard as bg

    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    offenders = []
    # fail-closed LogicalRDD default (ADVICE r10): every package
    # checkpoint registers its boundedness through the
    # certified_local_checkpoint seam (grep-guard-enforced below), so
    # in this registry-wide sweep an UNREGISTERED LogicalRDD behind a
    # hint is classified unbounded unless its column-name set matches
    # a seam-registered bounded checkpoint (self-join re-id fallback).
    with bg.strict_logical_rdd():
        for name, fn in sorted(registry.QUERIES.items()):
            if name in bg.SKIP:
                continue
            hits = bg.hinted_offenders(bg.optimized_plan(fn(spark, sf_dir)))
            if hits:
                offenders.append((name, hits))
    assert not offenders, f"unbounded broadcast hints in: {offenders}"


def test_band_self_joins_extract_equi_keys(spark, sf_dir):
    """The round-8 banded/inequality self-joins must compile to
    EQUI-joins on their natural keys (user_id / vec_id) with the band
    or i<=j predicate as a residual condition — a planner regression
    to BroadcastNestedLoopJoin/CartesianProduct here is the
    difference between co-located wedges and an O(n^2) shuffle at
    100 TB."""
    for name in ("event_cooccurrence_60s", "embedding_covariance_terms"):
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan, name


def _package_lines_containing(needle: str) -> list[str]:
    """``rel:lineno`` for every package line containing ``needle``,
    excluding plans/guard.py — the one file that hosts the sanctioned
    seams (certified_local_checkpoint, literal_df)."""
    import glob
    import os

    pkg = os.path.join(
        os.path.dirname(__file__), "..", "instructions_mr_spark"
    )
    offenders = []
    for path in sorted(glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True)):
        rel = os.path.relpath(path, pkg)
        if rel == os.path.join("plans", "guard.py"):
            continue  # the seam itself
        for i, line in enumerate(open(path), 1):
            if needle in line:
                offenders.append(f"{rel}:{i}")
    return offenders


def test_no_bare_localcheckpoint_in_package():
    """Every checkpoint in the PACKAGE must flow through
    plans.guard.certified_local_checkpoint, which certifies the
    PRE-checkpoint optimized plan for unbounded broadcast hints and
    registers the truncated plan's boundedness — an eager
    localCheckpoint truncates lineage to a LogicalRDD, so a hint
    executed at checkpoint time is invisible to the final-plan sweep
    above (r9 verdict: brand_share_shift's F.broadcast(part) hid
    exactly this way; r10 verdict item #3: operators/graph.py's
    iterative-loop checkpoints had the same blind spot outside
    queries/)."""
    offenders = _package_lines_containing(".localCheckpoint(")
    assert not offenders, f"bare localCheckpoint outside the seam: {offenders}"


def test_no_bare_createdataframe_in_package():
    """Every driver-side literal table must flow through
    plans.guard.literal_df, which registers the literal's output
    attrs as bounded — PySpark's createDataFrame compiles to the same
    LogicalRDD leaf a checkpoint truncates to, and the fail-closed
    sweep above (strict_logical_rdd) classifies UNREGISTERED
    LogicalRDDs as corpus-scale.  A bare createDataFrame in the
    package would make its literal flag as an unbounded broadcast (a
    false positive that would tempt someone to weaken the strict
    default)."""
    offenders = _package_lines_containing("createDataFrame(")
    assert not offenders, f"bare createDataFrame outside literal_df: {offenders}"


def test_checkpoint_guard_catches_hidden_hint(spark, sf_dir):
    """The supersede_checkpoint certification must fire on a hinted
    unbounded subtree that would afterwards hide behind the
    checkpoint's LogicalRDD — the exact r9 blind-spot reproduction
    (brand_share_shift's part broadcast), kept as a regression
    harness now that the query itself is hint-free."""
    import pytest
    from pyspark.sql import functions as F

    from instructions_mr_spark.queries._util import supersede_checkpoint, t

    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = t(spark, sf_dir, "part").select("p_partkey")
    hinted = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    with pytest.raises(AssertionError, match="unbounded broadcast hint"):
        supersede_checkpoint("test_hidden_hint", hinted)


def test_checkpoint_guard_sees_downstream_broadcast(spark, sf_dir):
    """Round-10 hardening: broadcasting a corpus-scale table that was
    CHECKPOINTED earlier must still be flagged — the checkpoint's
    LogicalRDD leaf is classified via the attr-id registry recorded
    at certification time, not assumed to be a literal.  The bounded
    counterpart (a value-domain aggregate checkpoint) must stay
    broadcastable."""
    from pyspark.sql import functions as F

    import tools.broadcast_guard as bg
    from instructions_mr_spark.queries._util import supersede_checkpoint, t

    li = t(spark, sf_dir, "lineitem")
    # unbounded: per-orderkey distinct grows with the corpus
    big = supersede_checkpoint(
        "test_big_ckpt", li.select("l_orderkey", "l_partkey").distinct()
    )
    hinted = li.join(
        F.broadcast(big.select(F.col("l_orderkey").alias("k"))),
        F.col("l_orderkey") == F.col("k"),
    )
    hits = bg.hinted_offenders(bg.optimized_plan(hinted))
    assert hits and "LogicalRDD(checkpoint of an unbounded plan)" in hits[0]
    # bounded: returnflag-keyed aggregate (value domain)
    small = supersede_checkpoint(
        "test_small_ckpt",
        li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")),
    )
    ok = li.join(F.broadcast(small), "l_returnflag")
    assert bg.hinted_offenders(bg.optimized_plan(ok)) == []


def test_strict_mode_fails_closed_on_unregistered_logicalrdd(spark):
    """ADVICE r10: _logical_rdd_bounded failed OPEN — any LogicalRDD
    with unregistered attrs was classified bounded, so a checkpoint
    made outside the certified seam was waved through a downstream
    broadcast hint.  Under strict_logical_rdd() (the registry-wide
    sweep's mode) the default flips: an unregistered LogicalRDD under
    a hint is an offender; registering it (literal_df / the seam)
    clears it."""
    from pyspark.sql import functions as F

    import tools.broadcast_guard as bg
    from instructions_mr_spark.plans.guard import (
        register_checkpoint_bounds,
        strict_logical_rdd,
    )

    # a bare checkpoint the certification seam never saw
    rogue = (
        spark.range(3).selectExpr("id AS rogue_k").localCheckpoint()
    )
    hinted = spark.range(10).join(
        F.broadcast(rogue), F.col("id") == F.col("rogue_k")
    )
    plan = bg.optimized_plan(hinted)
    assert bg.hinted_offenders(plan) == []            # fail-open default
    with strict_logical_rdd():
        assert bg.hinted_offenders(plan)              # fail-closed sweep
        register_checkpoint_bounds(rogue, True)       # seam registration
        assert bg.hinted_offenders(plan) == []        # ...clears it


def test_strict_mode_nameset_fallback_covers_reid(spark):
    """DeduplicateRelations re-ids one side of a self-join, so a
    certified checkpoint can appear under attr ids the registry never
    saw.  The column-NAME-set fallback must classify the re-id'd side
    by the checkpoint's recorded boundedness: bounded name-sets pass,
    and a name-set recorded UNBOUNDED stays flagged."""
    from pyspark.sql import functions as F

    import tools.broadcast_guard as bg
    from instructions_mr_spark.plans.guard import (
        CHECKPOINT_NAMES_BOUNDED,
        strict_logical_rdd,
    )
    from instructions_mr_spark.queries._util import supersede_checkpoint

    from instructions_mr_spark.queries._util import free_staged_checkpoints

    small = supersede_checkpoint(
        "test_nameset_small",
        spark.range(4).selectExpr("id AS ns_key", "id * 2 AS ns_val"),
    )
    try:
        assert CHECKPOINT_NAMES_BOUNDED[frozenset({"ns_key", "ns_val"})] is True
        # self-join: the broadcast side's attrs get re-id'd by
        # DeduplicateRelations -> id lookup misses -> name-set fallback
        j = small.alias("a").join(
            F.broadcast(small.alias("b")),
            F.col("a.ns_key") == F.col("b.ns_val"),
        )
        with strict_logical_rdd():
            assert bg.hinted_offenders(bg.optimized_plan(j)) == []
            # flip the recorded boundedness: the same plan must now flag
            CHECKPOINT_NAMES_BOUNDED[frozenset({"ns_key", "ns_val"})] = False
            try:
                assert bg.hinted_offenders(bg.optimized_plan(j))
            finally:
                CHECKPOINT_NAMES_BOUNDED[frozenset({"ns_key", "ns_val"})] = True
    finally:
        # don't leak the staged checkpoint's blocks or its {ns_key,
        # ns_val} registrations into the rest of the shared session
        free_staged_checkpoints()


def test_guard_registry_does_not_grow_across_loop_frees(spark):
    """Long-lived-driver lifecycle (round-11 review): an iterative
    operator registers each round's checkpoint attrs; _free_checkpoint
    must prune the freed plan's ids so the guard registry stays
    bounded by LIVE checkpoints, and connected components over a bare
    edge table must still be correct after many register/free
    cycles."""
    from instructions_mr_spark.operators.graph import connected_components
    from instructions_mr_spark.plans.guard import CHECKPOINT_COLS_BOUNDED

    edges = spark.range(10).selectExpr("id AS src", "id + 1 AS dst")
    before = len(CHECKPOINT_COLS_BOUNDED)
    comp = connected_components(edges).collect()
    assert {(r.node, r.component) for r in comp} == {
        (i, 0) for i in range(11)
    }
    after = len(CHECKPOINT_COLS_BOUNDED)
    # the loop ran >= 10 rounds (chain diameter) x 2 attrs per round;
    # only the FINAL labels checkpoint (+ its re-id'd twin at most)
    # may remain registered after the per-round frees
    assert after - before <= 4, (before, after)


def test_certify_once_caches_per_label(spark, monkeypatch):
    """certify_once=True must run the Catalyst certification exactly
    once per (app, label): the loop body is fixed code, so a hint
    introduced by a code change is present in round 1 and re-proving
    the same shape every round is pure driver cost."""
    import instructions_mr_spark.plans.guard as g

    calls = []
    real = g.certify_no_unbounded_hints
    monkeypatch.setattr(
        g, "certify_no_unbounded_hints",
        lambda df, label: calls.append(label) or real(df, label),
    )
    df = spark.range(5).selectExpr("id AS co_key")
    for _ in range(3):
        ck = g.certified_local_checkpoint(
            df, "test_certify_once", certify_once=True
        )
        g.unregister_checkpoint_bounds(ck)
    assert calls == ["test_certify_once"]
    for k in [k for k in g._CERT_ONCE if k[1] == "test_certify_once"]:
        del g._CERT_ONCE[k]


def test_certify_once_recomputes_for_different_inputs(spark, monkeypatch):
    """The certify_once cache key must be input-sensitive (ADVICE
    r11): with an (app, label)-only key, a first call over a BOUNDED
    plan cached True and a later call over a corpus-scale plan under
    the same label registered its checkpoint as bounded — so a
    downstream F.broadcast() of that checkpoint passed the strict
    sweep (false negative in the guard itself)."""
    import instructions_mr_spark.plans.guard as g
    from instructions_mr_spark.sources.tables import load_table

    calls = []
    real = g.certify_no_unbounded_hints
    monkeypatch.setattr(
        g, "certify_no_unbounded_hints",
        lambda df, label: calls.append(label) or real(df, label),
    )
    label = "test_certify_once_inputs"
    try:
        bounded_df = spark.range(7).selectExpr("id AS co_key")
        ck1 = g.certified_local_checkpoint(bounded_df, label, certify_once=True)
        key1 = next(iter(
            f"{a.name()}#{a.exprId().id()}"
            for a in _out_attrs(ck1)
        ))
        assert g.CHECKPOINT_COLS_BOUNDED[key1] is True

        # same label, corpus-scale input: the documents scan is
        # unbounded by the classifier's relation markers
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        unbounded_df = docs.selectExpr("doc_id AS co_key")
        ck2 = g.certified_local_checkpoint(
            unbounded_df, label, certify_once=True
        )
        key2 = next(iter(
            f"{a.name()}#{a.exprId().id()}"
            for a in _out_attrs(ck2)
        ))
        assert g.CHECKPOINT_COLS_BOUNDED[key2] is False, (
            "corpus-scale checkpoint inherited the bounded test-graph "
            "verdict through the certify_once cache"
        )
        # both certifications actually ran (no stale reuse) ...
        assert calls == [label, label]
        # ... and the SAME input still hits the cache (the saving the
        # cache exists for)
        g.certified_local_checkpoint(
            docs.selectExpr("doc_id AS co_key"), label, certify_once=True
        )
        assert calls == [label, label]
        g.unregister_checkpoint_bounds(ck1)
        g.unregister_checkpoint_bounds(ck2)
    finally:
        for k in [k for k in g._CERT_ONCE if k[1] == label]:
            del g._CERT_ONCE[k]


def _out_attrs(df):
    out = df._jdf.queryExecution().analyzed().output()
    return [out.apply(i) for i in range(out.size())]


def test_certify_once_still_amortizes_across_loop_rounds(spark, monkeypatch):
    """The input-sensitive cache key (shape hash + leaf boundedness
    profile) must still HIT across the rounds of one iterative-operator
    call — that per-round Catalyst-pass saving is the reason
    certify_once exists.  A profile that accidentally varies per round
    (e.g. leaking attr ids into the shape hash) would silently turn
    every round into a full certification; pin the call count."""
    import instructions_mr_spark.plans.guard as g
    from instructions_mr_spark.operators.graph import connected_components
    from instructions_mr_spark.plans.guard import literal_df

    calls = []
    real = g.certify_no_unbounded_hints
    monkeypatch.setattr(
        g, "certify_no_unbounded_hints",
        lambda df, label: calls.append(label) or real(df, label),
    )
    # start from a clean cache: earlier suite tests (test_graph.py) run
    # connected_components over same-SHAPED bounded literal edge tables,
    # and an equal profile legitimately hits (equal shape + equal leaf
    # verdicts => equal full-plan verdict), which would record 0 calls
    # here and fail the lower bound for test-ordering reasons only
    for k in [k for k in g._CERT_ONCE if k[1] == "cc_labels"]:
        del g._CERT_ONCE[k]
    # a 12-node chain: diameter forces >= 11 label-propagation rounds
    edges = literal_df(
        spark, [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    comp = connected_components(edges).collect()
    assert {(r.node, r.component) for r in comp} == {(i, 0) for i in range(12)}
    once = [c for c in calls if c == "cc_labels"]
    # round 1 certifies; rounds 2+ must reuse (the round-1 plan reads
    # the labels0 leaf, round 2+ read a loop checkpoint leaf — one
    # extra miss for that shape transition is acceptable, more means
    # the key is unstable per round)
    assert 1 <= len(once) <= 2, (
        f"certify ran {len(once)}x for cc_labels across >=11 rounds — "
        "the certify_once key is varying per round"
    )
    for k in [k for k in g._CERT_ONCE if k[1] == "cc_labels"]:
        del g._CERT_ONCE[k]


def test_literal_df_is_single_slice(spark):
    """literal_df must build ONE Python-RDD slice (round 12): with the
    default createDataFrame path a literal carries defaultParallelism
    mostly-empty slices, and any downstream coalesce(1) — the standard
    checkpoint shape for tiny staged tables — evaluates them
    SEQUENTIALLY in one task at a Python-worker round-trip each
    (~4.8 s per checkpoint seam measured at 32 cores).  A literal is
    driver-local and tiny by definition; one slice is always right."""
    from instructions_mr_spark.plans.guard import literal_df

    lit = literal_df(spark, [(1, "a"), (2, "b")], "id long, s string")
    assert lit.rdd.getNumPartitions() == 1
    assert [(r.id, r.s) for r in lit.orderBy("id").collect()] == [
        (1, "a"), (2, "b"),
    ]
