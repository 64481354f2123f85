"""applyInPandasWithState + foreachBatch: the custom-stateful tier of
the streaming surface. Oracle = batch groupBy on the same data (the
final per-user state must equal the batch totals)."""

import pytest

import glob

from pyspark.sql import functions as F

from cc2dataset_spark.sources.tables import load_table
from cc2dataset_spark.streaming.stateful import (
    foreach_batch_writer,
    running_user_totals,
)
from cc2dataset_spark.streaming.windows import read_events_stream


def test_stateful_running_totals_converges_to_batch(spark, sf_dir):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emitted row per user = lifetime totals
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM t_totals").collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - total) < 1e-4


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")
    q = (
        read_events_stream(spark, sf_dir)
        .select("event_id", "user_id")
        .writeStream.foreachBatch(foreach_batch_writer(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = glob.glob(f"{out}/batch_id=*")
    assert batches
    total = spark.read.parquet(*batches).count()
    assert total == load_table(spark, sf_dir, "events").count()


@pytest.mark.slow
def test_stateful_funnel_state_survives_restart(spark, sf_dir, tmp_path):
    """The streaming funnel must (a) converge to the batch funnel
    stages when fed the whole fixture, and (b) carry its per-user state
    across a query RESTART: feeding the early half, stopping, then
    feeding the late half from the same checkpoint must produce the
    same final stages as one pass. (Memory sinks cannot recover from a
    checkpoint, so the restartable foreachBatch parquet sink collects
    the output; the latest batch_id per user is the final state.)"""
    from pyspark.sql import Window

    from cc2dataset_spark.streaming.stateful import (
        foreach_batch_writer,
        funnel_user_stages,
    )

    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    s = (
        events.withColumn("t_view", F.min(F.when(is_("view"), F.col("ts"))).over(w))
        .withColumn(
            "t_click",
            F.min(
                F.when(is_("click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    is_("purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
                )
            ).over(w),
        )
    )
    expected = {
        (r.user_id, r.t_view, r.t_click, r.t_purchase)
        for r in s.groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
        .collect()
    }

    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    half1 = events.where(F.col("ts") <= cut)
    half2 = events.where(F.col("ts") > cut)
    schema = events.schema

    def run_from_checkpoint():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            funnel_user_stages(stream)
            .writeStream.foreachBatch(foreach_batch_writer(out_dir))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half1.coalesce(1).write.mode("append").parquet(src_dir)
    run_from_checkpoint()
    half2.coalesce(1).write.mode("append").parquet(src_dir)
    run_from_checkpoint()

    out = spark.read.parquet(out_dir)  # batch_id partition column
    latest = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    final = {
        (r.user_id, r.t_view, r.t_click, r.t_purchase)
        for r in out.withColumn("rn", F.row_number().over(latest))
        .where("rn = 1")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .collect()
    }
    assert final == expected


@pytest.mark.slow
def test_sessionize_stateful_matches_batch_across_batches(
    spark, sf_dir, tmp_path
):
    """Streaming sessionizer == batch events_sessionize, with the feed
    SPLIT AT THE TIME MEDIAN into two micro-batches so sessions that
    span the boundary must continue from state instead of restarting."""
    import os
    import time as _time

    from cc2dataset_spark.plans.catalog import QUERIES, _load_all
    from cc2dataset_spark.streaming.stateful import sessionize_stateful

    _load_all()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    # cut INSIDE a multi-event session (not the global median, which
    # tends to land between sessions) so the boundary-spanning property
    # below is guaranteed by construction
    batch_rows = QUERIES["events_sessionize"].fn(spark, sf_dir).collect()
    span_row = max(
        (r for r in batch_rows if r.n_events >= 3 and r.t_start < r.t_end),
        key=lambda r: r.duration_secs,
    )
    cut = span_row.t_start + (span_row.t_end - span_row.t_start) / 2
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, part in enumerate(
        (events.where(F.col("ts") <= F.lit(cut)),
         events.where(F.col("ts") > F.lit(cut)))
    ):
        p = f"{feed}/part{i}.parquet"
        pdf = part.toPandas()
        # pandas defaults to ns timestamps; Spark's file stream needs us
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emission per (user, seq) wins: n_events grows monotonically
    # within a session, so keep the max-n row
    got = {}
    for r in spark.sql("SELECT * FROM t_sessions").collect():
        k = (r.user_id, r.session_seq)
        if k not in got or r.n_events > got[k][0]:
            got[k] = (r.n_events, r.t_start, r.t_end)
    batch = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.t_start.replace(tzinfo=None),
            r.t_end.replace(tzinfo=None),
        )
        for r in QUERIES["events_sessionize"].fn(spark, sf_dir).collect()
    }
    norm = {
        k: (n, s.replace(tzinfo=None), e.replace(tzinfo=None))
        for k, (n, s, e) in got.items()
    }
    assert norm == batch
    # and the split actually exercised continuation: some user must
    # have a session whose start is in batch 1 and end in batch 2
    spanning = [
        k for k, (n, s, e) in batch.items() if s <= cut and e > cut
    ]
    assert spanning, "median split produced no boundary-spanning session"


def test_transform_with_state_twin(spark, sf_dir):
    """running_user_totals_tws: gated on protobuf (pyspark's
    transformWithState state-server protocol); where available it must
    converge to the same batch totals as the applyInPandasWithState
    twin."""
    import importlib.util

    from cc2dataset_spark.streaming.stateful import running_user_totals_tws

    has_protobuf = importlib.util.find_spec("google") is not None and (
        importlib.util.find_spec("google.protobuf") is not None
    )
    if not has_protobuf:
        import pytest

        with pytest.raises(NotImplementedError, match="protobuf"):
            running_user_totals_tws(read_events_stream(spark, sf_dir))
        return
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = running_user_totals_tws(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_totals_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM t_totals_tws").collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)


@pytest.mark.slow
def test_heavy_hitters_stateful_guarantee_across_batches(
    spark, sf_dir, tmp_path
):
    """Streaming Misra-Gries state carried across TWO micro-batches
    satisfies the MG guarantee vs an exact batch recount: every true
    heavy hitter (freq > n/(k+1)) is among the final candidates, and
    every candidate count underestimates by at most n/(k+1). Exact
    equality is NOT asserted — MG candidates are order-dependent by
    design; the bounds are the contract."""
    import os

    from cc2dataset_spark.streaming.stateful import heavy_hitters_stateful

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    k = 8
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    feed = str(tmp_path / "hh_feed")
    os.makedirs(feed)
    for i, part in enumerate(
        (events.where(F.col("event_id") <= cut),
         events.where(F.col("event_id") > cut))
    ):
        p = f"{feed}/part{i}.parquet"
        pdf = part.toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        heavy_hitters_stateful(stream, k=k)
        .writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_hh").collect()
    # last emission per (event_type, item): the one with max n_processed
    final: dict[str, dict[str, int]] = {}
    n_final: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: r.n_processed):
        final.setdefault(r.event_type, {})
        if r.n_processed >= n_final.get(r.event_type, 0):
            if r.n_processed > n_final.get(r.event_type, 0):
                final[r.event_type] = {}
                n_final[r.event_type] = r.n_processed
            final[r.event_type][r.item] = r.mg_count
    exact = {}
    for r in (
        events.groupBy("event_type", "user_id").count().collect()
    ):
        exact.setdefault(r.event_type, {})[str(r.user_id)] = r["count"]
    for etype, true_counts in exact.items():
        n = sum(true_counts.values())
        assert n_final[etype] == n  # no rows lost across batches
        bound = n / (k + 1)
        cands = final[etype]
        assert len(cands) <= k
        for item, true_c in true_counts.items():
            if true_c > bound:
                assert item in cands, (etype, item, true_c, bound)
        for item, mg_c in cands.items():
            true_c = true_counts.get(item, 0)
            assert mg_c <= true_c <= mg_c + bound


@pytest.mark.slow
def test_heavy_hitters_state_survives_restart(spark, sf_dir, tmp_path):
    """The MG counters must carry across a query RESTART from the
    checkpoint: feeding the early events, stopping, then feeding the
    late events from the same checkpoint must produce a final summary
    that (a) accounts for EVERY row (n_processed == exact count per
    type — rows lost at the restart boundary would show here) and
    (b) still satisfies the MG containment/undercount bounds."""
    from pyspark.sql import Window

    from cc2dataset_spark.streaming.stateful import (
        foreach_batch_writer,
        heavy_hitters_stateful,
    )

    k = 8
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    src_dir = str(tmp_path / "hh_src")
    out_dir = str(tmp_path / "hh_out")
    ckpt = str(tmp_path / "hh_ckpt")
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    schema = events.schema

    def run_from_checkpoint():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            heavy_hitters_stateful(stream, k=k)
            .writeStream.foreachBatch(foreach_batch_writer(out_dir))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    events.where(F.col("event_id") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    run_from_checkpoint()
    events.where(F.col("event_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    run_from_checkpoint()

    out = spark.read.parquet(out_dir)
    latest = Window.partitionBy("event_type").orderBy(
        F.col("batch_id").desc(), F.col("n_processed").desc()
    )
    top_batch = (
        out.withColumn("rn", F.rank().over(latest)).where("rn = 1")
    )
    final: dict[str, dict[str, int]] = {}
    n_final: dict[str, int] = {}
    for r in top_batch.collect():
        final.setdefault(r.event_type, {})[r.item] = r.mg_count
        n_final[r.event_type] = r.n_processed
    exact: dict[str, dict[str, int]] = {}
    for r in events.groupBy("event_type", "user_id").count().collect():
        exact.setdefault(r.event_type, {})[str(r.user_id)] = r["count"]
    for etype, true_counts in exact.items():
        n = sum(true_counts.values())
        assert n_final[etype] == n, (etype, n_final[etype], n)
        bound = n / (k + 1)
        cands = final[etype]
        assert 0 < len(cands) <= k
        for item, true_c in true_counts.items():
            if true_c > bound:
                assert item in cands
        for item, mg_c in cands.items():
            assert mg_c <= true_counts.get(item, 0) <= mg_c + bound
