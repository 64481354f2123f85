from cc2dataset_spark.streaming.windows import (
    read_events_stream,
    session_stats,
    sliding_counts,
    tumbling_counts,
)
from cc2dataset_spark.streaming.dedup import streaming_dedup
from cc2dataset_spark.streaming.joins import followup_events

__all__ = [
    "read_events_stream",
    "session_stats",
    "sliding_counts",
    "tumbling_counts",
    "streaming_dedup",
    "followup_events",
]
