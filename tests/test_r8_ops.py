"""Semantic pins for the round-8 additions: Spearman rank correlation,
Theil index terms, Mann-Kendall trend, count-min sketch audit, and the
feature-hashing collision audit — each on a handcrafted input with a
hand-computed answer."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

from instructions_mr_spark import registry

registry.load_all()


def _write_orders(spark, tmp_path, rows):
    """rows: (orderkey, custkey, totalprice, date)"""
    full = [(ok, ck, "O", tp, d, "1-URGENT") for ok, ck, tp, d in rows]
    df = spark.createDataFrame(
        full,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _write_lineitem(spark, tmp_path, rows):
    """rows: (orderkey, partkey)"""
    full = [
        (ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 1))
        for ok, pk in rows
    ]
    df = spark.createDataFrame(
        full,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text)"""
    full = [(did, txt, "en", "s", len(txt)) for did, txt in rows]
    df = spark.createDataFrame(
        full, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_spearman_perfect_anticorrelation(spark, tmp_path):
    """freq ranks 1/2/3 vs cents ranks 3/2/1: sum d^2 = 8, rho =
    1 - 6*8/(27-3) = -1 exactly."""
    d = datetime(2024, 1, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, 30.0, d),                     # c1: 1 order, 3000c
            (2, 2, 10.0, d), (3, 2, 10.0, d),    # c2: 2 orders, 2000c
            (4, 3, 2.0, d), (5, 3, 3.0, d), (6, 3, 5.0, d),  # c3: 3, 1000c
        ],
    )
    r = registry.QUERIES["spearman_rho_terms"](spark, str(tmp_path)).collect()[0]
    assert r.n == 3 and r.sum_d2 == 8
    assert r.rho_e6 == -1000000


def test_theil_equal_revenues_zero(spark, tmp_path):
    """Two customers at 100 cents each: T = S/total - (ln total - ln n)
    = ln(100) - ln(100) = 0; the emitted terms are the exact pieces."""
    d = datetime(2024, 1, 1)
    _write_orders(spark, tmp_path, [(1, 1, 1.0, d), (2, 2, 1.0, d)])
    r = registry.QUERIES["theil_index_terms"](spark, str(tmp_path)).collect()[0]
    assert r.n == 2 and r.total_cents == 200
    assert r.sum_xlnx == Decimal("921.0340372000")  # 200 * round(ln 100, 10)
    assert r.ln_total_r10 == Decimal("5.2983173665")
    assert r.ln_n_r10 == Decimal("0.6931471806")
    t = float(r.sum_xlnx) / r.total_cents - (
        float(r.ln_total_r10) - float(r.ln_n_r10)
    )
    assert abs(t) < 1e-9


def test_mann_kendall_strictly_rising(spark, tmp_path):
    """Daily revenue 100/200/300 cents: all 3 pairs concordant,
    S = +3."""
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, 1.0, datetime(2024, 1, 1)),
            (2, 1, 2.0, datetime(2024, 1, 2)),
            (3, 1, 3.0, datetime(2024, 1, 3)),
        ],
    )
    r = registry.QUERIES["mann_kendall_trend"](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 3 and r.s_stat == 3
    assert r.n_concordant == 3 and r.n_discordant == 0 and r.n_ties == 0


def test_countmin_never_undercounts(spark, tmp_path):
    """Parts with counts 5/3/1: every CM estimate >= the exact count
    (the sketch's one-sided guarantee), exact counts land verbatim."""
    _write_lineitem(
        spark,
        tmp_path,
        [(i, 101) for i in range(5)]
        + [(i, 202) for i in range(5, 8)]
        + [(8, 303)],
    )
    rows = registry.QUERIES["sketch_countmin_heavy"](
        spark, str(tmp_path)
    ).collect()
    got = {r.l_partkey: r for r in rows}
    assert set(got) == {101, 202, 303}
    assert got[101].exact_cnt == 5 and got[202].exact_cnt == 3
    assert got[303].exact_cnt == 1
    for r in rows:
        assert r.overestimate >= 0
        assert r.cm_estimate == r.exact_cnt + r.overestimate


def test_feature_hash_bucket_identity(spark, tmp_path):
    """Vocab {a,b,c}: 3 features; singleton buckets hold exactly one
    feature, so features - collided_features == buckets - collided
    buckets regardless of where the hashes land."""
    _write_docs(spark, tmp_path, [(1, "a b"), (2, "b c")])
    r = registry.QUERIES["feature_hash_collision_audit"](
        spark, str(tmp_path)
    ).collect()[0]
    assert r.n_features == 3
    assert 1 <= r.n_buckets_used <= 3
    assert (
        r.n_features - r.n_features_collided
        == r.n_buckets_used - r.n_collided_buckets
    )
    assert r.max_bucket_load >= 1
    assert r.collision_rate_e6 == r.n_features_collided * 1000000 // r.n_features
