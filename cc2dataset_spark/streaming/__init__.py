from cc2dataset_spark.streaming.windows import (
    read_events_stream,
    session_stats,
    sliding_counts,
    tumbling_counts,
)
from cc2dataset_spark.streaming.dedup import (
    streaming_dedup,
    streaming_dedup_against_index,
)
from cc2dataset_spark.streaming.joins import followup_events

__all__ = [
    "read_events_stream",
    "session_stats",
    "sliding_counts",
    "tumbling_counts",
    "streaming_dedup",
    "streaming_dedup_against_index",
    "followup_events",
]
