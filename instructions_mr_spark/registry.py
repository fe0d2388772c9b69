"""Query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here:

* a Spark callable ``(spark, sf_dir) -> DataFrame``
* optionally the equivalent ANSI SQL for the DuckDB oracle (omitted
  only for genuinely non-SQL-expressible ops -> driver runs the weaker
  rows-only check).

Column names must match between the two sides — the driver sorts
columns by name before hashing values.  Float aggregates are rounded
identically on both sides to keep the value hash stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    import instructions_mr_spark.queries.reference_core  # noqa: F401
    import instructions_mr_spark.queries.relational  # noqa: F401
    import instructions_mr_spark.queries.joins  # noqa: F401
    import instructions_mr_spark.queries.windows  # noqa: F401
    import instructions_mr_spark.queries.scalars  # noqa: F401
    import instructions_mr_spark.queries.llm_pipeline  # noqa: F401
    import instructions_mr_spark.queries.text  # noqa: F401
    import instructions_mr_spark.queries.streaming_batch  # noqa: F401
    import instructions_mr_spark.queries.advanced  # noqa: F401
    import instructions_mr_spark.queries.extras  # noqa: F401
    import instructions_mr_spark.queries.tpch_rest  # noqa: F401
    import instructions_mr_spark.queries.graph  # noqa: F401
    import instructions_mr_spark.queries.sampling  # noqa: F401
    import instructions_mr_spark.queries.analytics  # noqa: F401
    import instructions_mr_spark.queries.stats  # noqa: F401
    import instructions_mr_spark.queries.packing  # noqa: F401
    import instructions_mr_spark.queries.io_roundtrip  # noqa: F401
    import instructions_mr_spark.queries.lake_ops  # noqa: F401
