"""Custom stateful streaming operators (SURVEY.md §2.10:
applyInPandasWithState) — per-key state the built-in window aggs can't
express.

``running_user_totals`` maintains (count, sum) per user across
micro-batches and emits the updated totals each batch — the canonical
"incremental per-entity aggregate" shape. State is a tiny fixed-size
tuple per key, so the state store stays bounded by key cardinality,
not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running (count, sum(value)) over a stream.

    Emits one row per user per micro-batch in which the user appears,
    carrying the lifetime totals so far. The update fn is a
    self-contained closure (no package imports on workers).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_writer(path: str, fmt: str = "parquet"):
    """foreachBatch sink: write each micro-batch to {path}/batch_id=N —
    the escape hatch for sinks Structured Streaming lacks natively."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").format(fmt).save(
            f"{path}/batch_id={batch_id}"
        )

    return write


FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_view", TimestampType()),
        StructField("t_click", TimestampType()),
        StructField("t_purchase", TimestampType()),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t_view", TimestampType()),
        StructField("t_click", TimestampType()),
        StructField("t_purchase", TimestampType()),
    ]
)


def funnel_user_stages(events: DataFrame) -> DataFrame:
    """Stateful streaming funnel: per user, the timestamps of the first
    view, the first click AFTER that view, and the first purchase AFTER
    that click — the streaming twin of the batch
    ``events_funnel_conversion`` stage logic, maintained incrementally
    in a 3-timestamp state tuple per user (bounded by user cardinality).

    The greedy state machine is exact when events arrive in event-time
    order across micro-batches (within a batch they are sorted here);
    for out-of-order sources put a watermarked sort in front, as with
    any order-sensitive stateful operator. State persists in the
    checkpoint, so a restarted query continues the funnel where it
    stopped (tested across two runs in
    tests/test_stateful_streaming.py).
    """

    def update(key, pdfs, state):
        import pandas as pd  # self-contained closure

        tv, tc, tp = state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            if etype == "view" and tv is None:
                tv = ts
            elif etype == "click" and tv is not None and tc is None and ts > tv:
                tc = ts
            elif (
                etype == "purchase"
                and tc is not None
                and tp is None
                and ts > tc
            ):
                tp = ts
        state.update((tv, tc, tp))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "t_view": [tv],
                "t_click": [tc],
                "t_purchase": [tp],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
