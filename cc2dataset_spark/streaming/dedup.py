"""Streaming deduplication — the streaming twin of the reference's
batch uid-dedup (SURVEY.md §2.10: "streaming dedup (dropDuplicates +
watermark — the streaming twin of A1)").

``dropDuplicatesWithinWatermark`` bounds the dedup state store by event
time: duplicates arriving within the watermark horizon are dropped,
state older than the horizon is evicted — the only dedup shape that
survives an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon. On a batch
    frame this degrades to plain dropDuplicates (same semantics when
    all data is 'on time')."""
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
