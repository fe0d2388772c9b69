"""Plan-shape assertions for the lake-ops queries: partition pruning
must reach the scan, the gap-fill grid must broadcast."""

from __future__ import annotations

from instructions_mr_spark import registry

registry.load_all()


def test_partition_pruned_scan_prunes(spark, sf_dir):
    df = registry.QUERIES["partition_pruned_scan"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the event_type filter must be a partition filter on the scan,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "click" in plan


def test_ts_gap_fill_broadcasts_grid(spark, sf_dir):
    df = registry.QUERIES["ts_gap_fill"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # grid x types are broadcast; the events fact table shuffles only
    # for its own aggregate, never for the grid join
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") >= 2


def test_scd2_history_one_open_row_per_key(spark, sf_dir):
    from pyspark.sql import functions as F

    out = registry.QUERIES["scd2_history"](spark, sf_dir)
    open_rows = out.filter(F.col("valid_to").isNull()).groupBy("id").count()
    assert open_rows.filter(F.col("count") != 1).count() == 0
