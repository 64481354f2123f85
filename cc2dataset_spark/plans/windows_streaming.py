"""Batch-checkable window queries (SURVEY.md §2.10 / Stage 4): the
same operators the streaming module runs incrementally, executed as
batch plans so DuckDB can verify the window semantics exactly.

Alignment note: Spark tumbling windows align to the epoch; DuckDB
``time_bucket`` origins also sit on minute boundaries, so 10/5-minute
buckets coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table
from cc2dataset_spark.streaming.joins import followup_events
from cc2dataset_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
)


@query(
    "events_tumbling_10m",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
             AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def events_tumbling_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@query(
    "events_sliding_10m_5m",
    oracle="""
    WITH starts AS (
      SELECT e.*, UNNEST([
               time_bucket(INTERVAL '5 minutes', ts),
               time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
             ]) AS window_start
      FROM events e
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM starts
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes (each event in 2)."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


@query(
    "events_session_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30-minute gap (gaps-and-islands twin
    in the oracle)."""
    return session_stats(load_table(spark, sf_dir, "events"))


@query(
    "events_followup_pairs_10m",
    oracle="""
    SELECT a.user_id,
           a.event_id AS first_id,
           a.ts AS first_ts,
           b.event_id AS next_id,
           b.event_type AS next_type,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_micros
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '10 minutes'
    """,
    tags=("streaming", "join", "interval"),
)
def events_followup_pairs_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-checked: follow-up events by
    the same user within 10 minutes (streaming/joins.followup_events —
    watermarked on both sides when run on streams, so join state is
    bounded; micro-batch == batch equivalence in
    tests/test_streaming.py)."""
    e = load_table(spark, sf_dir, "events")
    return followup_events(e, e)
