"""Tests for MERGE/SCD2 emulation (operators/merge.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from instructions_mr_spark.operators.merge import latest_version, merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, name string, v int"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], "id int, name string, v int"
    )
    out = {r.id: (r.name, r.v) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30), 4: ("d", 40)}


def test_scd2_apply(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [
            (1, "addr_a_old", t0, t1),   # already-closed historical row
            (1, "addr_a", t1, None),     # open
            (2, "addr_b", t0, None),     # open, will change
            (3, "addr_c", t0, None),     # open, untouched
        ],
        "id int, addr string, valid_from timestamp, valid_to timestamp",
    )
    t2 = dt.datetime(2024, 9, 1)
    changes = spark.createDataFrame(
        [(2, "addr_b_new", t2)], "id int, addr string, change_ts timestamp"
    )
    out = scd2_apply(current, changes, ["id"], "change_ts")
    rows = sorted(
        ((r.id, r.addr, r.valid_from, r.valid_to) for r in out.collect())
    )
    assert rows == sorted(
        [
            (1, "addr_a_old", t0, t1),
            (1, "addr_a", t1, None),
            (2, "addr_b", t0, t2),       # closed at change time
            (2, "addr_b_new", t2, None),  # new open version
            (3, "addr_c", t0, None),
        ]
    )
    # exactly one open row per live key
    open_counts = (
        out.filter(F.col("valid_to").isNull()).groupBy("id").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_apply_multiple_changes_one_batch(spark):
    """Several changes for one key in a single batch must chain:
    each version's valid_to = next change's valid_from, exactly one
    row left open (the SCD2 invariant)."""
    t0 = dt.datetime(2024, 1, 1)
    current = spark.createDataFrame(
        [(2, "addr_b", t0, None)],
        "id int, addr string, valid_from timestamp, valid_to timestamp",
    )
    t2 = dt.datetime(2024, 9, 1)
    t3 = dt.datetime(2024, 10, 1)
    t4 = dt.datetime(2024, 11, 1)
    changes = spark.createDataFrame(
        [(2, "addr_b2", t2), (2, "addr_b3", t3), (2, "addr_b4", t4)],
        "id int, addr string, change_ts timestamp",
    )
    out = scd2_apply(current, changes, ["id"], "change_ts")
    rows = sorted((r.addr, r.valid_from, r.valid_to) for r in out.collect())
    assert rows == sorted(
        [
            ("addr_b", t0, t2),
            ("addr_b2", t2, t3),   # chained inside the batch
            ("addr_b3", t3, t4),
            ("addr_b4", t4, None),  # only the last change stays open
        ]
    )
    assert out.filter(F.col("valid_to").isNull()).count() == 1


def test_latest_version(spark):
    cdc = spark.createDataFrame(
        [(1, 1, "v1"), (1, 3, "v3"), (1, 2, "v2"), (2, 1, "w1")],
        "id int, seq int, payload string",
    )
    out = {r.id: r.payload for r in latest_version(cdc, ["id"], "seq").collect()}
    assert out == {1: "v3", 2: "w1"}
