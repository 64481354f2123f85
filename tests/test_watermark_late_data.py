"""Late-data semantics: a watermarked streaming aggregation must drop
events that arrive after the watermark has passed their window
(SURVEY.md §2.10 'watermark + late-data drop').

Two availableNow runs share one checkpoint: run 1 advances the
watermark past the first window's end (closing it); run 2 delivers a
late event for that closed window — it must not reopen or re-emit.
"""

import pytest
import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cc2dataset_spark.streaming.windows import tumbling_counts

BASE_S = 1_700_000_000 - (1_700_000_000 % 600)  # 10-min aligned epoch
M = 60_000_000  # one minute in us


def _write_batch(path, rows):
    ts, eid = zip(*rows)
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([BASE_S * 1_000_000 + t for t in ts], pa.timestamp("us")),
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        path,
    )


def _run_once(spark, src_dir, chk_dir, emitted):
    schema = None
    import glob

    schema = spark.read.parquet(glob.glob(f"{src_dir}/*.parquet")[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> LTZ
        .withWatermark("ts", "5 minutes")
    )

    def sink(batch_df, batch_id):
        emitted.extend(
            (r.window_start, r.n_events) for r in batch_df.collect()
        )

    q = (
        tumbling_counts(stream, "10 minutes")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(chk_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytest.mark.slow
def test_late_rows_dropped_after_watermark(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    chk = tmp_path / "chk"
    emitted = []

    # run 1: window [0,10) gets 3 events; an event at 21m pushes the
    # watermark to 16m, closing and emitting [0,10)
    _write_batch(str(src / "a.parquet"), [(1 * M, 1), (2 * M, 2), (3 * M, 3), (21 * M, 4)])
    _run_once(spark, src, chk, emitted)
    w0 = datetime.datetime.utcfromtimestamp(BASE_S)
    assert emitted == [(w0, 3)], emitted

    # run 2: a LATE event at 4m (watermark already 16m) + on-time 31m.
    # The late row must be dropped: no re-emission for [0,10).
    _write_batch(str(src / "b.parquet"), [(4 * M, 5), (31 * M, 6)])
    _run_once(spark, src, chk, emitted)
    windows = [w for w, _ in emitted]
    assert windows.count(w0) == 1, emitted
    counts = dict(emitted)
    assert counts[w0] == 3  # still only the on-time events
