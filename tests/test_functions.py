"""Tests for the Column function library (functions/__init__.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from instructions_mr_spark.functions import (
    cosine_sim,
    hamming64,
    jaccard,
    rolling_hash,
    word_shingles,
)


def test_cosine_sim_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    got = [r.c for r in df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == 1.0
    assert got[1] == 0.0
    assert abs(got[2] - 0.707107) < 1e-6


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0011), (5, 5)], "a long, b long")
    got = [r.h for r in df.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()]
    assert got == [1, 0]


def test_rolling_hash_deterministic_and_prefix_sensitive(spark):
    df = spark.createDataFrame([("abc",), ("abd",), ("abc",)], "s string")
    got = [r.h for r in df.select(rolling_hash(F.col("s")).alias("h")).collect()]
    assert got[0] == got[2]
    assert got[0] != got[1]
    # matches the closed form: a + b*31 + c*31^2 (mod p)
    expected = ord("a") + ord("b") * 31 + ord("c") * 31**2
    assert got[0] == expected


def test_jaccard_and_shingles(spark):
    df = spark.createDataFrame([("a b c d", "b c d e")], "x string, y string")
    out = df.select(
        jaccard(F.split("x", " "), F.split("y", " ")).alias("j"),
        word_shingles(F.col("x"), 3).alias("sh"),
    ).collect()[0]
    assert abs(out.j - 3 / 5) < 1e-9
    assert out.sh == ["a b c", "b c d"]


def test_zorder_column_matches_sql_fragment_and_bijective(spark):
    """zorder_key (Column ops) must equal zorder_key_sql (shared SQL
    fragment) on random coordinates, and the 10-bit curve must be
    bijective over its domain sample."""
    import random

    from pyspark.sql import functions as F

    from instructions_mr_spark.functions import zorder_key, zorder_key_sql

    rng = random.Random(5)
    pts = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = df.select(
        "x", "y",
        zorder_key(F.col("x"), F.col("y")).alias("zc"),
        F.expr(zorder_key_sql("x", "y")).alias("zs"),
    ).collect()
    keys = set()
    for r in out:
        assert r.zc == r.zs, (r.x, r.y)
        keys.add((r.x, r.y, r.zc))
    # distinct points -> distinct keys (bijective on the 10-bit grid)
    assert len({(x, y) for x, y, _ in keys}) == len({z for _, _, z in keys})
