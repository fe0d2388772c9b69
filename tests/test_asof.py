"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from instructions_mr_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 00:00:00"), "e1"),
            (1, _ts("2024-01-20 00:00:00"), "e2"),
            (2, _ts("2024-01-05 00:00:00"), "e3"),  # before any right row
            (3, _ts("2024-01-05 00:00:00"), "e4"),  # key absent on right
        ],
        "uid int, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "o1"),
            (1, _ts("2024-01-10 00:00:00"), "o2"),  # exact match for e1
            (1, _ts("2024-01-15 00:00:00"), "o3"),
            (2, _ts("2024-01-07 00:00:00"), "o4"),
        ],
        "cid int, rts timestamp, ord string",
    )
    return left, right


def test_asof_left_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "ts", "rts", ["uid"], ["cid"], how="left")
    got = {r.ev: r.ord for r in out.collect()}
    assert got == {"e1": "o2", "e2": "o3", "e3": None, "e4": None}
    assert out.count() == 4


def test_asof_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "ts", "rts", ["uid"], ["cid"], how="inner")
    assert {r.ev for r in out.collect()} == {"e1", "e2"}


def test_asof_null_payload_not_backfilled(spark):
    """A matched right row with a NULL payload column must yield NULL —
    not a value backfilled from an OLDER right row (DuckDB ASOF JOIN
    semantics: all output columns come from the single matched row)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-20 00:00:00"), "e1")], "uid int, ts timestamp, ev string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "old_val", 10),
            (1, _ts("2024-01-15 00:00:00"), None, 20),  # the match; payload NULL
        ],
        "cid int, rts timestamp, payload string, amt int",
    )
    out = asof_join(left, right, "ts", "rts", ["uid"], ["cid"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.amt == 20 and r.rts == _ts("2024-01-15 00:00:00")
    assert r.payload is None  # NOT "old_val"


def test_asof_schema_is_left_plus_right(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "ts", "rts", ["uid"], ["cid"])
    assert out.columns == ["uid", "ts", "ev", "cid", "rts", "ord"]


def test_asof_matches_pandas_merge_asof_on_random_data(spark):
    """Independent-oracle property check: backward and forward
    asof_join must equal pandas merge_asof (direction backward/
    forward, allow_exact_matches=True) on random keyed time series."""
    import random

    import pandas as pd

    rng = random.Random(99)
    for trial in range(3):
        left_rows = [
            (rng.randint(0, 4), rng.randint(0, 1000), i)
            for i in range(rng.randint(5, 40))
        ]
        right_rows_raw = {
            (rng.randint(0, 4), rng.randint(0, 1000)): i
            for i in range(rng.randint(3, 30))
        }
        right_rows = [(k, ts, v) for (k, ts), v in right_rows_raw.items()]

        lpdf = pd.DataFrame(left_rows, columns=["k", "t", "lid"])
        rpdf = pd.DataFrame(right_rows, columns=["rk", "rt", "rid"])
        left = spark.createDataFrame(lpdf).select(
            "k", F.to_timestamp(F.from_unixtime("t")).alias("t"), "lid"
        )
        right = spark.createDataFrame(rpdf).select(
            "rk", F.to_timestamp(F.from_unixtime("rt")).alias("rt"), "rid"
        )

        for direction in ("backward", "forward"):
            got = {
                r.lid: r.rid
                for r in asof_join(
                    left, right, "t", "rt", ["k"], ["rk"], direction=direction
                ).collect()
            }
            lp = lpdf.sort_values("t", kind="mergesort")
            rp = rpdf.sort_values("rt", kind="mergesort")
            want_df = pd.merge_asof(
                lp, rp, left_on="t", right_on="rt",
                left_by="k", right_by="rk", direction=direction,
                allow_exact_matches=True,
            )
            want = {
                int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                for r in want_df.itertuples()
            }
            assert got == want, f"trial {trial} {direction}: {got} != {want}"
