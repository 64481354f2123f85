"""applyInPandasWithState + foreachBatch: the custom-stateful tier of
the streaming surface. Oracle = batch groupBy on the same data (the
final per-user state must equal the batch totals)."""

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
