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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


SESSIONIZE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("t_start", TimestampType()),
        StructField("t_end", TimestampType()),
    ]
)

_SESSIONIZE_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", TimestampType()),
        StructField("seq", LongType()),
        StructField("t_start", TimestampType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful streaming sessionizer — the per-event streaming twin of
    the batch ``events_sessionize`` query (plans/events_analytics.py):
    assigns each user's events to 30-minute-gap sessions with STABLE
    per-user ordinals (session_seq 1, 2, ...), which the built-in
    ``session_window`` aggregate cannot produce (it yields window
    bounds, not ordinals). State per user is a fixed 4-tuple (last ts,
    current seq, session start, event count) — bounded by user
    cardinality, not stream length; a session spanning a micro-batch
    boundary continues from state rather than restarting (asserted
    across a 2-file feed in tests/test_stateful_streaming.py).

    Update-mode semantics: each batch emits the rows of every session
    it touched (closed sessions are final; the open session's row grows
    until its gap closes it), so the LAST emission per
    (user_id, session_seq) equals the batch result. Events must arrive
    in event-time order ACROSS batches (within a batch they are sorted
    here) — same ordering contract as funnel_user_stages.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # self-contained closure

        gap = pd.Timedelta(minutes=gap_minutes)
        last_ts, seq, t_start, n = (
            state.get if state.exists else (None, 0, None, 0)
        )
        out: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for ts in rows["ts"]:
            if last_ts is None or ts > last_ts + gap:
                if last_ts is not None:
                    # previous session is now closed — final emission
                    out.append((key[0], seq, n, t_start, last_ts))
                seq += 1
                t_start = ts
                n = 1
            else:
                n += 1
            last_ts = ts
        state.update((last_ts, seq, t_start, n))
        # snapshot of the still-open session (overwritten by a later
        # batch if it grows or closes)
        out.append((key[0], seq, n, t_start, last_ts))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_seq", "n_events", "t_start", "t_end"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSIONIZE_SCHEMA,
        stateStructType=_SESSIONIZE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`running_user_totals`
    — the Spark 4 arbitrary-stateful API (typed value/list/map state,
    timers, TTL) that supersedes applyInPandasWithState. Same
    semantics: lifetime (count, sum(value)) per user, one row per
    user per micro-batch, state bounded by key cardinality.

    Requires the RocksDB state store provider (set
    spark.sql.streaming.stateStore.providerClass to
    ...state.RocksDBStateStoreProvider on the session) and the
    ``protobuf`` Python package — transformWithState's Python workers
    speak a protobuf state-server protocol
    (pyspark/sql/streaming/proto). Environments without protobuf get
    a NotImplementedError here rather than an opaque
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE at query start;
    the applyInPandasWithState twin above runs everywhere.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark's state-server protocol); use running_user_totals "
            "(applyInPandasWithState) instead"
        ) from ex
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


HEAVY_HITTERS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", StringType()),
        StructField("mg_count", LongType()),
        StructField("n_processed", LongType()),
    ]
)

_HEAVY_HITTERS_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def heavy_hitters_stateful(
    events: DataFrame, k: int = 8, item_col: str = "user_id"
) -> DataFrame:
    """Streaming MISRA-GRIES heavy hitters per event_type — the
    streaming twin of the batch two-pass MG in text_heavy_hitter_words
    (plans/llm_ops.py), carried ACROSS micro-batches in k-bounded
    state: per key, at most k (item, count) counters regardless of
    stream length, folded batch by batch with the classic
    increment/insert/decrement-all rule.

    The MG guarantee survives batch boundaries because the state IS
    the single-pass summary: after n items, every item with true
    frequency > n/(k+1) is guaranteed present in the counters, and
    each counter underestimates its item's true count by at most
    n/(k+1) (Misra & Gries 1982) — the streaming test asserts exactly
    these two bounds against an exact batch recount rather than exact
    equality, because MG candidates are legitimately order-dependent.

    Update-mode semantics: each batch emits the CURRENT counter set of
    every key the batch touched (plus n_processed, the denominator of
    the error bound); the last emission per (event_type, item) is the
    final summary. Unlike the batch twin there is no second exact
    pass here — at 100 TB the streaming side ships candidates and the
    batch side verifies them, which is the standard split."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        items, counts, n = (
            state.get if state.exists else ([], [], 0)
        )
        mg = dict(zip(list(items), list(counts)))
        for pdf in pdfs:
            # NULL items are excluded BY CONTRACT (same as the batch
            # twin operators/sketches.misra_gries_candidates), and —
            # load-bearing — dropped BEFORE stringification: one NULL
            # in a micro-batch flips an int64 Arrow column to float64,
            # and astype(str) would then key "7.0"/"nan" while
            # null-free batches keyed "7", silently splitting every
            # item's persisted counter. convert_dtypes() restores the
            # nullable integer dtype so keys are stable across batches.
            col = pdf[item_col].dropna()
            if col.dtype == "float64":
                col = col.convert_dtypes()
            for it in col.astype(str):
                n += 1
                if it in mg:
                    mg[it] += 1
                elif len(mg) < k:
                    mg[it] = 1
                else:
                    # decrement-all; drop zeros
                    mg = {i: c - 1 for i, c in mg.items() if c > 1}
        state.update((list(mg.keys()), list(mg.values()), n))
        yield pd.DataFrame(
            [(key[0], it, c, n) for it, c in sorted(mg.items())],
            columns=["event_type", "item", "mg_count", "n_processed"],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=HEAVY_HITTERS_SCHEMA,
        stateStructType=_HEAVY_HITTERS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
