"""``tar_shard`` sink (WebDataset-style sharded tar): sample grouping,
binary fidelity, manifest accounting, two-phase commit hygiene, and
byte-reproducible shards."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from cc2dataset_spark.sources.tables import load_table
from cc2dataset_spark.sources.tar_sink import TarShardDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TarShardDataSource)
    return spark


def _members(out):
    got = {}
    for p in sorted(os.listdir(out)):
        if p.startswith("part-") and p.endswith(".tar"):
            with tarfile.open(os.path.join(out, p)) as tar:
                for m in tar.getmembers():
                    got[m.name] = tar.extractfile(m).read()
    return got


def test_roundtrip_grouping_and_manifest(registered, sf_dir, tmp_path):
    spark = registered
    out = str(tmp_path / "wds")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.format_string("%06d", "doc_id").alias("key"),
            F.col("text").alias("txt"),
            F.to_json(F.struct("lang", "source")).alias("json"),
            F.encode("text", "utf-8").alias("bin"),
        )
        .limit(50)
    )
    docs.write.format("tar_shard").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    rows = docs.collect()
    assert manifest["samples"] == len(rows)
    assert manifest["members"] == 3 * len(rows)
    assert manifest["schema"] == ["key", "txt", "json", "bin"]
    assert not os.path.exists(os.path.join(out, "_tmp"))

    got = _members(out)
    assert len(got) == 3 * len(rows)
    for r in rows:
        assert got[f"{r.key}.txt"].decode("utf8") == r.txt
        assert json.loads(got[f"{r.key}.json"].decode("utf8")) == json.loads(r.json)
        assert got[f"{r.key}.bin"] == bytes(r.bin)  # raw binary column

    # WebDataset contract: one sample's members are ADJACENT in-shard
    for p in os.listdir(out):
        if p.startswith("part-"):
            with tarfile.open(os.path.join(out, p)) as tar:
                names = [m.name for m in tar.getmembers()]
            keys = [n.rsplit(".", 1)[0] for n in names]
            dedup_runs = [k for i, k in enumerate(keys) if i == 0 or keys[i - 1] != k]
            assert len(dedup_runs) == len(set(keys))


def test_null_member_skipped_and_null_key_fails(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [("a", "hello", None), ("b", None, "meta")],
        ["key", "txt", "json"],
    )
    df.coalesce(1).write.format("tar_shard").option("path", out).mode(
        "append"
    ).save()
    got = _members(out)
    assert set(got) == {"a.txt", "b.json"}

    bad = spark.createDataFrame(
        [(None, "x")], "key string, txt string"
    )
    with pytest.raises(Exception, match="null sample key"):
        bad.write.format("tar_shard").option(
            "path", str(tmp_path / "badkey")
        ).mode("append").save()


def test_key_col_required_and_overridable(registered, tmp_path):
    spark = registered
    df = spark.createDataFrame([("k1", "x")], ["sample_id", "txt"])
    with pytest.raises(Exception, match="key"):
        df.write.format("tar_shard").option(
            "path", str(tmp_path / "nokey")
        ).mode("append").save()
    out = str(tmp_path / "custom_key")
    df.write.format("tar_shard").option("path", out).option(
        "key_col", "sample_id"
    ).mode("append").save()
    assert set(_members(out)) == {"k1.txt"}


@pytest.mark.slow
def test_append_refuses_stale_parts_overwrite_replaces(
    registered, tmp_path
):
    spark = registered
    out = str(tmp_path / "modes")
    df1 = spark.createDataFrame([("a", "1")], ["key", "txt"])
    df1.coalesce(1).write.format("tar_shard").option("path", out).mode(
        "append"
    ).save()
    with pytest.raises(Exception, match="shard"):
        df1.write.format("tar_shard").option("path", out).mode(
            "append"
        ).save()
    df2 = spark.createDataFrame([("z", "9")], ["key", "txt"])
    df2.coalesce(1).write.format("tar_shard").option("path", out).mode(
        "overwrite"
    ).save()
    got = _members(out)
    assert set(got) == {"z.txt"}
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["samples"] == 1 and manifest["shards"] == 1


def test_byte_reproducible_shards(registered, tmp_path):
    """Pinned tar metadata -> identical row streams give identical
    shard BYTES (dataset hashes stable across re-runs)."""
    spark = registered
    df = (
        spark.range(200)
        .select(
            F.format_string("%06d", "id").alias("key"),
            F.sha2(F.format_string("%d", "id"), 256).alias("txt"),
        )
        .coalesce(1)
        .sortWithinPartitions("key")
    )
    digests = []
    for name in ("r1", "r2"):
        out = str(tmp_path / name)
        df.write.format("tar_shard").option("path", out).mode(
            "append"
        ).save()
        h = hashlib.sha256()
        h.update(open(os.path.join(out, "part-00000.tar"), "rb").read())
        digests.append(h.hexdigest())
    assert digests[0] == digests[1]


def test_key_invariants_enforced(registered, tmp_path):
    # Duplicate keys within a shard merge samples under WebDataset's
    # basename regrouping; '/' nests the member path; empty keys make
    # extension-only names — all three must fail the write, not ship.
    spark = registered
    dup = spark.createDataFrame(
        [("k", "a"), ("k", "b")], ["key", "txt"]
    ).coalesce(1)
    with pytest.raises(Exception, match="duplicate sample key"):
        dup.write.format("tar_shard").option(
            "path", str(tmp_path / "dup")
        ).mode("append").save()
    for bad_key, name in [("a/b", "slash"), ("", "empty")]:
        bad = spark.createDataFrame([(bad_key, "x")], ["key", "txt"])
        with pytest.raises(Exception, match="invalid sample key"):
            bad.write.format("tar_shard").option(
                "path", str(tmp_path / name)
            ).mode("append").save()


# ---------------------------------------------------------------------
# r12: tar_shard READ source — the loader-handoff loop closed
# ---------------------------------------------------------------------


def test_read_source_roundtrips_byte_identical(registered, sf_dir, tmp_path):
    """write -> read through Spark: every sample comes back with its
    exact member bytes (text columns as their UTF-8 encodings —
    extension-based decoding is the loader's job), schema from the
    sink manifest, one partition per shard."""
    spark = registered
    out = str(tmp_path / "wds_rt")
    src = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.format_string("%06d", "doc_id").alias("key"),
            F.col("text").alias("txt"),
            F.to_json(F.struct("lang", "source")).alias("json"),
            F.encode("text", "utf-8").alias("bin"),
        )
        .limit(40)
    )
    src.repartition(3).write.format("tar_shard").option(
        "path", out
    ).mode("append").save()

    back = spark.read.format("tar_shard").option("path", out).load()
    assert back.columns == ["key", "txt", "json", "bin"]
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "string", "binary", "binary", "binary",
    ]
    got = {
        r.key: (bytes(r.txt), bytes(r.json), bytes(r.bin))
        for r in back.collect()
    }
    want = {
        r.key: (
            r.txt.encode("utf8"),
            r.json.encode("utf8"),
            bytes(r.bin),
        )
        for r in src.collect()
    }
    assert got == want
    # one partition per shard file
    n_shards = len(
        [p for p in os.listdir(out) if p.startswith("part-")]
    )
    assert back.rdd.getNumPartitions() == n_shards


def test_read_source_null_members_and_options(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "wds_nulls")
    df = spark.createDataFrame(
        [("a", "hello", None), ("b", None, b"\x00\xff")],
        "key string, txt string, bin binary",
    )
    df.coalesce(1).write.format("tar_shard").option("path", out).mode(
        "append"
    ).save()
    rows = {
        r.key: (r.txt, r.bin)
        for r in spark.read.format("tar_shard")
        .option("path", out)
        .load()
        .collect()
    }
    assert rows["a"] == (b"hello", None)
    assert rows["b"] == (None, b"\x00\xff")

    # explicit columns option (foreign shards without a manifest)
    os.remove(os.path.join(out, "_MANIFEST.json"))
    with pytest.raises(Exception, match="columns"):
        spark.read.format("tar_shard").option("path", out).load().collect()
    rows2 = (
        spark.read.format("tar_shard")
        .option("path", out)
        .option("columns", "key,txt,bin")
        .load()
        .collect()
    )
    assert len(rows2) == 2
