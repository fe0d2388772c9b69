"""Semantic pins for the round-8 sixteenth batch: two-level shares,
dwell time, weekly ARPU, daily value ribbon and kNN label voting."""

from __future__ import annotations

from datetime import datetime, timedelta

from instructions_mr_spark import registry

registry.load_all()

_D0 = datetime(2024, 1, 1)


def test_share_of_parent_two_level_hand(spark, tmp_path):
    # category STANDARD: brand A 3.00, brand B 1.00; category PROMO: C 4.00
    spark.createDataFrame(
        [(1, "p", "A", "STANDARD X", 1, 1.0),
         (2, "p", "B", "STANDARD Y", 1, 1.0),
         (3, "p", "C", "PROMO Z", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 3.0, 0.0, 0.0, "N", "O", _D0),
         (2, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _D0),
         (3, 3, 1, 1, 1.0, 4.0, 0.0, 0.0, "N", "O", _D0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    rows = {
        (r["category"], r["p_brand"]): (r["share_of_cat_e6"], r["cat_share_e6"])
        for r in registry.QUERIES["share_of_parent_two_level"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[("STANDARD", "A")] == (750000, 500000)
    assert rows[("STANDARD", "B")] == (250000, 500000)
    assert rows[("PROMO", "C")] == (1000000, 500000)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, _D0 + timedelta(seconds=s), u, e, v, "{}") for i, s, u, e, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_dwell_time_hand(spark, tmp_path):
    # user 1: click@0 -> view@30 -> purchase@30 (instant) -> (end)
    _write_events(
        spark, tmp_path,
        [(1, 0, 1, "click", 1.0), (2, 30, 1, "view", 1.0),
         (3, 30, 1, "purchase", 1.0)],
    )
    rows = {
        r["event_type"]: (r["n_dwells"], r["total_dwell_s"], r["n_instant"])
        for r in registry.QUERIES["dwell_time_by_type"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["click"] == (1, 30, 0)
    assert rows["view"] == (1, 0, 1)       # same-second transition
    assert rows["purchase"] == (0, None, 0)  # last event, no successor


def test_arpu_weekly_hand(spark, tmp_path):
    # week 0: users 1 (purchase 5.00) and 2 (click only) -> ARPU 2.50
    _write_events(
        spark, tmp_path,
        [(1, 0, 1, "purchase", 5.0), (2, 60, 2, "click", 9.0)],
    )
    [r] = registry.QUERIES["arpu_weekly"](spark, str(tmp_path)).collect()
    assert (r["active_users"], r["revenue_c"]) == (2, 500)
    assert r["arpu_e4"] == 500 * 10000 // 2


def test_daily_ribbon_hand(spark, tmp_path):
    spark.createDataFrame(
        [(k, 1, "O", float(v), _D0, "1-URGENT")
         for k, v in enumerate([1.0, 2.0, 3.0, 4.0], start=1)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    [r] = registry.QUERIES["daily_value_ribbon"](spark, str(tmp_path)).collect()
    # DISC quartiles of {1,2,3,4}: p25=1, p50=2, p75=3
    assert (r["n"], r["p25_c"], r["p50_c"], r["p75_c"]) == (4, 100, 200, 300)


def test_knn_vote_planted_clusters(spark, tmp_path):
    # probe vec_id 0 (label 0) sits among label-0 neighbors; vec 50
    # (label 1) among label-1 neighbors -> both classes 100% accurate
    rows = []
    for i in range(8):
        rows.append((i * 2, [1.0 + i * 0.001, 0.0], 0))       # cluster A
        rows.append((i * 2 + 1, [0.0, 1.0 + i * 0.001], 1))   # cluster B
    rows.append((0 + 50, [0.0, 1.5], 1))  # vec 50: probe in cluster B
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["probe_label"]: (r["n_probes"], r["n_correct"], r["acc_e6"])
        for r in registry.QUERIES["knn_label_vote_accuracy"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {0: (1, 1, 1000000), 1: (1, 1, 1000000)}
