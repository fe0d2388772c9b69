"""MERGE / SCD2 emulation without a table format (SURVEY.md guide's
CDC pattern: "MERGE INTO needs Delta; emulate with anti-join + union
+ window").

At 100 TB with Delta/Iceberg on the classpath these become real MERGE
INTO statements; the logical content — upsert = updates ∪ (target ∖
updates), SCD2 = close-out + append with validity windows — is
identical, and these run anywhere plain parquet runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Upsert: rows from ``updates`` win; target rows without a match
    survive.  Schemas must align (unionByName).  One shuffle per side
    on the key (the anti join), same as MERGE's inner plan."""
    keys = list(keys)
    surviving = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return surviving.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    change_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close open rows that received
    a change (valid_to = change time) and append the new versions
    (valid_from = change time, valid_to = null).

    ``current`` must carry ``valid_from``/``valid_to`` (null = open);
    ``changes`` carries the key, attributes, and ``change_ts``.

    Multiple changes for one key in a single batch are chained: each
    version's ``valid_to`` is the NEXT change's ``valid_from`` (a
    ``lead`` window over the batch), so exactly one row per key stays
    open — the SCD2 invariant — instead of several concurrent opens.
    """
    keys = list(keys)
    w_chain = W.partitionBy(*keys).orderBy(change_ts)
    ch = changes.withColumn(valid_from, F.col(change_ts)).withColumn(
        valid_to,
        F.lead(change_ts).over(w_chain).cast(current.schema[valid_to].dataType),
    )
    first_change = ch.groupBy(*keys).agg(F.min(change_ts).alias("__first_change"))

    open_rows = current.filter(F.col(valid_to).isNull())
    closed_rows = current.filter(F.col(valid_to).isNotNull())

    # close open rows for changed keys at their first change time
    closed_now = (
        open_rows.join(first_change, keys, "inner")
        .withColumn(valid_to, F.col("__first_change"))
        .drop("__first_change")
    )
    untouched_open = open_rows.join(first_change.select(*keys), keys, "left_anti")

    new_versions = ch.drop(change_ts) if change_ts not in (valid_from, valid_to) else ch
    return (
        closed_rows.unionByName(closed_now)
        .unionByName(untouched_open)
        .unionByName(new_versions.select(*[f.name for f in current.schema.fields]))
    )


def latest_version(df: DataFrame, keys: Sequence[str], order_col: str | Column) -> DataFrame:
    """Deduplicate a CDC stream to the latest version per key (the
    compaction step before serving)."""
    order = order_col if isinstance(order_col, Column) else F.col(order_col)
    w = W.partitionBy(*keys).orderBy(order.desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
