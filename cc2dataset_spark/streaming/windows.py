"""Streaming surface (SURVEY.md §2.10 — absent from the reference,
built batch-first so the DuckDB oracle can check the semantics, then
reused verbatim on streams: each operator here takes a DataFrame that
may be batch or streaming; Structured Streaming runs the identical
plan incrementally).

Late data: pair any streaming use with ``with_watermark`` so state
stores are bounded — at 100 TB/day of events, unbounded window state
is the first thing that kills a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (micro-batch twin of
    sources.tables.load_table('events'), including the ns->us
    conversion).

    ``withWatermark`` requires a TIMESTAMP (with-local-tz) event-time
    column, while the fixture stores tz-less timestamps that batch
    reads keep as TIMESTAMP_NTZ. The stream side therefore casts ts to
    TIMESTAMP under a UTC-pinned session timezone; the windowing
    operators below cast window bounds back to TIMESTAMP_NTZ, so the
    streaming output stays value-identical to the batch twin.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-source streams take a directory; scope it to the events
    # files with a glob filter
    raw = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # NTZ wall time -> LTZ instant via the UTC session tz: the same
        # instant batch comparisons see, and watermark-compatible.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def with_watermark(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Event-time watermark (no-op on batch frames)."""
    return df.withWatermark("ts", delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling window per event_type: count + exact decimal sum."""
    w = F.window("ts", width)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding window counts (each event lands in width/slide windows).

    n_users is an EXACT distinct on batch frames; on streaming frames
    it switches to approx_count_distinct (HLL) because Structured
    Streaming rejects distinct aggregations in streaming groupBys —
    the batch twin stays oracle-exact while the stream stays runnable,
    and the approximation is confined to the path that cannot be
    exact at all."""
    w = F.window("ts", width, slide)
    n_users = (
        F.approx_count_distinct("user_id")
        if events.isStreaming
        else F.countDistinct("user_id")
    )
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            n_users.alias("n_users"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-merged; session end = last event
    + gap, Spark's session_window contract)."""
    w = F.session_window("ts", gap)
    return (
        events.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
