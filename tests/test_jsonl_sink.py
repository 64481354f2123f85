"""``jsonl_shard`` sink (Spark 4 Python DataSource writer): two-phase
commit, manifest accounting, roundtrip fidelity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cc2dataset_spark.sources.jsonl_sink import JsonlShardDataSource
from cc2dataset_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(JsonlShardDataSource)
    return spark


def test_roundtrip_and_manifest(registered, sf_dir, tmp_path):
    spark = registered
    out = str(tmp_path / "shards")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    docs.write.format("jsonl_shard").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    n = docs.count()
    assert manifest["rows"] == n
    assert manifest["schema"] == ["doc_id", "lang", "source"]
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) == manifest["files"] >= 1
    # commit cleaned the temp staging area entirely
    assert not os.path.exists(os.path.join(out, "_tmp"))

    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == n
    a = sorted(
        (r.doc_id, r.lang, r.source) for r in back.collect()
    )
    b = sorted((r.doc_id, r.lang, r.source) for r in docs.collect())
    assert a == b


def test_missing_path_option_rejected(registered, sf_dir):
    docs = load_table(registered, sf_dir, "documents").limit(1)
    with pytest.raises(Exception, match="path"):
        docs.write.format("jsonl_shard").mode("append").save()


def test_shards_follow_partitioning(registered, sf_dir, tmp_path):
    """One shard per input partition — the write parallelism contract."""
    out = str(tmp_path / "p4")
    docs = (
        load_table(registered, sf_dir, "documents")
        .select("doc_id")
        .repartition(4, "doc_id")
    )
    docs.write.format("jsonl_shard").option("path", out).mode(
        "append"
    ).save()
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) == 4


def test_overwrite_clears_stale_parts(registered, sf_dir, tmp_path):
    """A second, SMALLER overwrite run must not leave part files from
    the first run behind: manifest totals and a directory glob must
    agree (the r7 ADVICE stale-part finding)."""
    spark = registered
    out = str(tmp_path / "shards_ow")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    docs.repartition(6).write.format("jsonl_shard").option(
        "path", out
    ).mode("append").save()
    first_parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(first_parts) == 6

    small = docs.limit(5).repartition(2)
    small.write.format("jsonl_shard").option("path", out).mode(
        "overwrite"
    ).save()
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert len(parts) == manifest["files"]
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == manifest["rows"] == 5


def test_append_into_dirty_dir_fails_fast(registered, sf_dir, tmp_path):
    """Without overwrite, committing over existing parts would let a
    non-manifest reader double-count — refuse up front."""
    spark = registered
    out = str(tmp_path / "shards_dirty")
    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(3)
    docs.write.format("jsonl_shard").option("path", out).mode(
        "append"
    ).save()
    with pytest.raises(Exception, match="part file"):
        docs.write.format("jsonl_shard").option("path", out).mode(
            "append"
        ).save()
