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
