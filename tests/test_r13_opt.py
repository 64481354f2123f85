"""Focused regression tests for the r13 optimization-round changes:
spread_small_scan's conditional behavior and the image_dims hex-twin
refactor (2-int fold accumulator + pre-hexed variant)."""

import pyspark.sql.functions as F
import pytest

from cc2dataset_spark.operators import multimodal as MM
from cc2dataset_spark.sources.tables import spread_small_scan


def test_spread_small_scan_spreads_single_partition(spark):
    df = spark.range(0, 1000, 1, 1)  # 1 partition by construction
    out = spread_small_scan(df, "id")
    assert out.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    # content unchanged
    assert out.count() == 1000
    assert out.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2


def test_spread_small_scan_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, target + 4)
    out = spread_small_scan(df, "id")
    # must return the input untouched — no exchange in the plan
    assert out is df


def test_image_dims_hex_equals_image_dims(spark):
    # real headers through both entry points: the payload variant must
    # be exactly the hex variant over upper(hex(payload))
    png = bytes.fromhex("89504E470D0A1A0A0000000D49484452")
    png += (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
    png += bytes.fromhex("0806000000")
    jpg = bytes.fromhex(
        "FFD8FFE000104A46494600010100000100010000FFC000110801E0028003"
    )
    gif = bytes.fromhex("4749463839610A001400800000")
    junk = b"not an image at all"
    df = spark.createDataFrame(
        [(0, png), (1, jpg), (2, gif), (3, junk)], "i long, p binary"
    )
    a = df.select(
        "i", MM.image_dims(F.col("p")).alias("d")
    ).orderBy("i").collect()
    b = df.select(
        "i",
        MM.image_dims_hex(F.upper(F.hex(F.col("p")))).alias("d"),
    ).orderBy("i").collect()
    assert [r["d"] for r in a] == [r["d"] for r in b]
    assert a[0]["d"]["format"] == "png"
    assert (a[0]["d"]["width"], a[0]["d"]["height"]) == (640, 480)
    assert a[1]["d"]["format"] == "jpeg"
    assert (a[1]["d"]["width"], a[1]["d"]["height"]) == (640, 480)
    assert a[2]["d"]["format"] == "gif"
    assert (a[2]["d"]["width"], a[2]["d"]["height"]) == (10, 20)
    assert a[3]["d"]["format"] is None


def test_image_dims_jpeg_walk_accumulator_is_small(spark):
    # the fold must keep working past multi-segment headers (the
    # accumulator restructure must not have changed walk semantics):
    # SOI + two APPn segments + SOF0
    app1 = bytes.fromhex("FFE1") + (200).to_bytes(2, "big") + b"\x00" * 198
    com = bytes.fromhex("FFFE") + (50).to_bytes(2, "big") + b"\x00" * 48
    sof = bytes.fromhex("FFC00011080100020003")
    payload = bytes.fromhex("FFD8") + app1 + com + sof + b"\x00" * 8
    df = spark.createDataFrame([(payload,)], "p binary")
    row = df.select(MM.image_dims(F.col("p")).alias("d")).collect()[0]
    assert row["d"]["format"] == "jpeg"
    assert (row["d"]["width"], row["d"]["height"]) == (0x0200, 0x0100)
