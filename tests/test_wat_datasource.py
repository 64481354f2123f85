"""Tests for the ``wat`` Python Data Source (Spark 4 DataSource API):
same records, same extraction output as the schema-on-read jsonl path,
and partition-per-archive planning.
"""

from __future__ import annotations

import json

import pytest

from cc2dataset_spark.operators.extraction import extract_document_links
from cc2dataset_spark.sources.wat import read_wat_jsonl
from cc2dataset_spark.sources.wat_datasource import WatDataSource
from tests.fixtures.build_tiny_wat import FIXTURE_PATH
from tests.wat_fixtures import FIXTURE_RECORDS, oracle_extract

# Records that pass the envelope guards (the wat source drops guard
# failures pre-emit; the schema-on-read jsonl twin keeps them as
# null-Links rows for the downstream declarative guard).
_GUARDED = [
    r
    for r in FIXTURE_RECORDS
    if r["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]["Links"]
    is not None
]


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(WatDataSource)
    return spark


@pytest.fixture(scope="module")
def jsonl_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("watds")
    paths = []
    # split records across two files to exercise multi-partition planning
    half = len(FIXTURE_RECORDS) // 2
    for i, chunk in enumerate(
        (FIXTURE_RECORDS[:half], FIXTURE_RECORDS[half:])
    ):
        p = d / f"part{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in chunk) + "\nnot json\n")
        paths.append(str(p))
    return paths


def test_wat_source_matches_jsonl_reader(registered, jsonl_paths):
    spark = registered
    via_ds = (
        spark.read.format("wat")
        .option("paths", ",".join(jsonl_paths))
        .option("mode", "jsonl")
        .load()
    )
    via_jsonl = read_wat_jsonl(spark, jsonl_paths)
    # jsonl reader nulls failed guards, the source drops them pre-emit;
    # compare post-guard extraction output instead of raw record sets
    for doc_type in ("image", "text"):
        a = sorted(tuple(r) for r in extract_document_links(via_ds, doc_type).collect())
        b = sorted(
            tuple(r) for r in extract_document_links(via_jsonl, doc_type).collect()
        )
        assert a == b
        assert a == sorted(oracle_extract(FIXTURE_RECORDS, doc_type))


def test_wat_source_one_partition_per_archive(registered, jsonl_paths):
    df = (
        registered.read.format("wat")
        .option("paths", ",".join(jsonl_paths))
        .option("mode", "jsonl")
        .load()
    )
    assert df.rdd.getNumPartitions() == len(jsonl_paths)


def test_wat_source_manifest_option(registered, jsonl_paths, tmp_path):
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("\n".join(jsonl_paths))
    df = (
        registered.read.format("wat")
        .option("manifest", str(manifest))
        .option("mode", "jsonl")
        .load()
    )
    assert df.count() == len(_GUARDED)


def test_wat_source_rejects_bad_options(registered):
    with pytest.raises(Exception, match="paths|manifest"):
        registered.read.format("wat").option("mode", "jsonl").load().count()
    with pytest.raises(Exception, match="mode"):
        (
            registered.read.format("wat")
            .option("paths", "x.jsonl")
            .option("mode", "nope")
            .load()
            .count()
        )


def test_wat_source_warc_mode_golden(registered):
    df = (
        registered.read.format("wat")
        .option("paths", FIXTURE_PATH)
        .option("mode", "warc")
        .load()
    )
    assert df.count() == len(_GUARDED)
    got = sorted(
        tuple(r) for r in extract_document_links(df, "image").collect()
    )
    assert got == sorted(oracle_extract(FIXTURE_RECORDS, "image"))


def test_pipeline_runs_on_wat_datasource(registered, jsonl_paths, tmp_path):
    """Full pipeline (extract -> dedup -> write -> count) fed by the
    registered wat source via the public `source` seam — no
    monkeypatching, end-to-end through spark.read.format("wat")."""
    from cc2dataset_spark import pipeline
    from tests.wat_fixtures import oracle_extract

    def wat_source(spark, paths):
        return (
            spark.read.format("wat")
            .option("paths", ",".join(paths))
            .option("mode", "jsonl")
            .load()
        )

    out = str(tmp_path / "out")
    n = pipeline.cc2dataset(
        registered,
        out,
        jsonl_paths,
        document_type="image",
        min_files=2,
        source=wat_source,
    )
    assert n == len({t[0] for t in oracle_extract(FIXTURE_RECORDS, "image")})


def test_warc_iter_retries_flaky_io(monkeypatch):
    """X6: the whole-file read retries with backoff and then succeeds;
    when retries are exhausted the file is skipped (empty, no raise) —
    the reference's file-tier containment (main.py:190-200). Driven
    directly through the module-level _iter_warc/_open_binary seam (the
    same closure the executors run)."""
    import time

    from cc2dataset_spark.sources import wat_datasource as ds

    monkeypatch.setattr(time, "sleep", lambda s: None)
    real_open = ds._open_binary
    calls = {"n": 0}

    def flaky(path):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient remote failure")
        return real_open(path)

    monkeypatch.setattr(ds, "_open_binary", flaky)
    rows = list(ds._iter_warc(FIXTURE_PATH, retries=5))
    assert calls["n"] == 3  # two failures + one success
    assert len(rows) == len(_GUARDED)

    calls["n"] = 0
    assert list(ds._iter_warc(FIXTURE_PATH, retries=2)) == []
    assert calls["n"] == 2  # exhausted, skipped silently


def test_wat_source_file_tier_drops_whole_file(registered, tmp_path):
    """Reference containment parity in the V2 source (both modes): a
    valid-JSON record missing 'Envelope' is a FILE-tier failure that
    discards the file's earlier rows (main.py:178-183 returns []),
    while malformed JSON is a record-tier skip."""
    import json

    spark = registered
    good = json.dumps(FIXTURE_RECORDS[0])
    broken = '{"not_envelope": 1}'
    fa = tmp_path / "a.jsonl"
    fa.write_text(good + "\n" + broken + "\n")
    fb = tmp_path / "b.jsonl"
    fb.write_text(good + "\nnot json!!\n" + good + "\n")
    read = lambda p: (
        spark.read.format("wat")
        .option("paths", str(p))
        .option("mode", "jsonl")
        .load()
    )
    assert read(fa).count() == 0
    assert read(fb).count() == 2
