"""Stream-stream interval join (SURVEY.md §2.10 extension — absent
from the reference, standard Structured Streaming capability).

Batch-first like the rest of the streaming surface: the same function
runs on batch frames (DuckDB-checkable semantics) and on two streams,
where Spark requires exactly what this plan provides — watermarks on
both sides plus a time-range join condition — to bound the join state
store. Without the interval bound, stream-stream join state grows with
stream length; with it, each side's buffer evicts past
watermark + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def followup_events(
    first: DataFrame,
    nxt: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Pairs (first event, follow-up event by the same user within
    ``gap``): user_id, first_id, first_ts, next_id, next_type,
    gap_micros. Strict ordering (next_ts > first_ts) keeps the pair
    set asymmetric and self-pairs out.

    On streams, both sides are watermarked and the interval condition
    makes the join state bounded (the canonical Structured Streaming
    stream-stream join shape); on batch the identical plan is a range
    join the oracle can verify.
    """
    l = first.select(
        F.col("user_id"),
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("first_ts"),
    )
    r = nxt.select(
        F.col("user_id").alias("next_user_id"),
        F.col("event_id").alias("next_id"),
        F.col("event_type").alias("next_type"),
        F.col("ts").alias("next_ts"),
    )
    if l.isStreaming:
        l = l.withWatermark("first_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("next_ts", watermark)
    cond = (
        (l.user_id == r.next_user_id)
        & (r.next_ts > l.first_ts)
        & (r.next_ts <= l.first_ts + F.expr(f"INTERVAL {gap}"))
    )
    return (
        l.join(r, cond)
        .select(
            "user_id",
            "first_id",
            # streaming side carries LTZ ts (watermark requirement);
            # normalize to NTZ so output matches the batch twin
            F.col("first_ts").cast("timestamp_ntz").alias("first_ts"),
            "next_id",
            "next_type",
            (
                F.unix_micros(F.col("next_ts").cast("timestamp"))
                - F.unix_micros(F.col("first_ts").cast("timestamp"))
            ).alias("gap_micros"),
        )
    )
