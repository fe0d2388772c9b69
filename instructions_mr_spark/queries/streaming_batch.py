"""Event-time windowing over the events table, batch mode
(SURVEY.md §2.7 stream_tumble / stream_session; the reference's README
lists "Can Not Streaming E2E" as a drawback — this engine lifts it).

These queries use the SAME window functions Structured Streaming
executes incrementally (F.window / F.session_window); the streaming
runtime itself (readStream, watermarks, state) is exercised in
tests/test_streaming.py where a query can be driven to completion.
Batch mode makes the semantics DuckDB-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructions_mr_spark.queries._util import DEC_VALUE, sum_d, t
from instructions_mr_spark.registry import query


@query(
    "stream_tumble",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           {sum_d(DEC_VALUE, 'total_value')}
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate — identical logical plan under
    readStream + watermark."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.expr(sum_d(DEC_VALUE, "total_value")))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT window_start, COUNT(*) AS n
    FROM (
      SELECT CAST(time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start FROM events
      UNION ALL
      SELECT CAST(time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE AS TIMESTAMP) FROM events
    ) x
    GROUP BY window_start
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes: each event lands in two
    windows; the oracle materializes the same assignment explicitly."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via F.session_window —
    Spark defines session end as last-event + gap; the oracle builds
    the same islands with lag + running sum."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_dedup_keys",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event
    FROM events GROUP BY user_id, event_type
    """,
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup (keep-first) — the batch twin of streaming
    dropDuplicates-with-watermark (state = one row per key)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(F.min("event_id").alias("first_event"))
