"""As-of join (SURVEY.md §2.7 ``join_asof``) — Spark lacks a native
one; DuckDB's ASOF JOIN is the oracle.

Semantics: for each left row, attach the single right row with the
largest right-time <= left-time among rows sharing the equi-key
(backward as-of, inclusive) — or nulls if none (left variant).

Implementation (scale-first, pure JVM): tag and union both sides,
then one window pass per key ordered by (time, tag) carrying the
latest right payload forward — as a SINGLE struct column — with
``last(struct(...), ignorenulls=True)``, so all right columns come
from the same matched row even when that row has NULL payloads:

    right rows sort before left rows at equal times (inclusive match),
    each left row reads the most recent right payload in its frame.

Cost: one shuffle on the key + one per-partition sort — the same
lower bound as a sort-merge join, with no row explosion (contrast
join-then-rank, which multiplies each left row by all earlier right
rows) and no Python boundary (an earlier ``applyInPandas`` +
``merge_asof`` version spent ~90ms of pandas overhead per key group).
Skewed keys degrade to a big per-key sort; pre-split hot keys by
coarse time bucket if needed.

Right-side rows with keys absent from the left are semi-join-pruned
before the shuffle — at 100 TB that's shuffling matching keys only,
not the whole right table.

Ambiguity: if several right rows share (key, time), 'the' match is
underdetermined; pre-reduce the right side to one row per (key, time)
for deterministic output (the callers do).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_time_left: str,
    on_time_right: str,
    by_left: Sequence[str],
    by_right: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join; right columns appended to left.

    ``direction="backward"`` (default) matches the latest right row
    with time <= left time; ``"forward"`` matches the earliest right
    row with time >= left time (same machinery, reversed sort — at
    equal times the right row still wins, keeping both directions
    inclusive).

    ``by_*`` equi-keys must be comparable types; left/right column
    names must not collide (rename before joining).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_left = list(by_left)
    by_right = list(by_right)
    left_fields = list(left.schema.fields)
    right_fields = list(right.schema.fields)
    left_cols = [f.name for f in left_fields]
    right_cols = [f.name for f in right_fields]

    # Prune right to keys present on the left before any shuffle.
    left_keys = left.select(*by_left).distinct()
    semi_cond = None
    for bl, br in zip(by_left, by_right):
        c = right[br] == left_keys[bl]
        semi_cond = c if semi_cond is None else (semi_cond & c)
    right = right.join(left_keys, semi_cond, "left_semi")

    keys = [f"__k{i}" for i in range(len(by_left))]

    tagged_left = left.select(
        *[F.col(bl).alias(k) for k, bl in zip(keys, by_left)],
        F.col(on_time_left).cast("timestamp").alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in right_fields],
    )
    tagged_right = right.select(
        *[F.col(br).alias(k) for k, br in zip(keys, by_right)],
        F.col(on_time_right).cast("timestamp").alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left_fields],
        *[F.col(c) for c in right_cols],
    )

    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        W.partitionBy(*keys)
        .orderBy(t_order, F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Carry the right payload as ONE struct so every output column
    # comes from the same matched right row — filling each column
    # independently would backfill a NULL payload column from an older
    # right row, diverging from DuckDB ASOF JOIN semantics.
    filled = unioned.select(
        "__tag",
        *left_cols,
        F.last(
            F.when(F.col("__tag") == 0, F.struct(*right_cols)), ignorenulls=True
        )
        .over(w)
        .alias("__r"),
    )
    out = filled.filter(F.col("__tag") == 1)
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *left_cols, *[F.col("__r")[c].alias(c) for c in right_cols]
    )
