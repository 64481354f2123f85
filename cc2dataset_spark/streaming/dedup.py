"""Streaming deduplication — the streaming twin of the reference's
batch uid-dedup (SURVEY.md §2.10: "streaming dedup (dropDuplicates +
watermark — the streaming twin of A1)").

``dropDuplicatesWithinWatermark`` bounds the dedup state store by event
time: duplicates arriving within the watermark horizon are dropped,
state older than the horizon is evicted — the only dedup shape that
survives an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_dedup_against_index(
    stream: DataFrame,
    index_fingerprints: DataFrame,
    fingerprint: Column,
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Streaming twin of operators/dedup.dedup_incremental: continuous
    ingestion deduped against the historical fingerprint store. The
    static index joins stream-side as a broadcast LEFT ANTI (each
    micro-batch probes the index without shuffling it), then
    dropDuplicates on the fingerprint removes within-stream repeats
    (first-seen survivor — streams have no global min-id).

    State: the anti-join is stateless; the dropDuplicates state grows
    with distinct NEW fingerprints. Production bounds it by either
    periodically folding accepted fingerprints back into the static
    index and restarting, or using dropDuplicatesWithinWatermark when
    rows carry event time (streaming_dedup below).
    """
    fresh = stream.withColumn(fp_col, fingerprint).join(
        F.broadcast(index_fingerprints.select(fp_col)), fp_col, "left_anti"
    )
    return fresh.dropDuplicates([fp_col])


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon. On a batch
    frame this degrades to a DETERMINISTIC first-by-timestamp dedup
    (min over (ts, remaining columns) per key) — plain dropDuplicates
    would keep a partitioning-dependent arbitrary survivor, so the
    batch twin's non-key columns could differ run-to-run while the
    stream keeps the first-arriving row. The stream side is Spark's
    dropDuplicatesWithinWatermark (first-seen survivor, state bounded
    by the horizon); the batch side's min-ts row is that semantics'
    replayable analogue."""
    if not events.isStreaming:
        others = [ts_col] + [
            c for c in events.columns if c not in (*keys, ts_col)
        ]
        picked = events.groupBy(*keys).agg(
            F.min(F.struct(*[F.col(c) for c in others])).alias("_r")
        )
        return picked.select(
            *[
                F.col(c) if c in keys else F.col(f"_r.{c}").alias(c)
                for c in events.columns
            ]
        )
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
