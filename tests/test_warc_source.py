"""Archive-source tests (S6/S7, sources/wat.read_wat_archives).

The checked-in tiny.wat.warc.gz fixture holds the SAME envelopes as
tests/wat_fixtures.FIXTURE_RECORDS plus a warcinfo record and a
malformed-JSON record, so the fastwarc path is checked golden-count
style against the same pure-Python oracle as the jsonl twin — the
rebuild's hermetic version of the reference's pinned-WAT golden tests
(/root/reference/tests/test_single_warc.py:22-54).

fastwarc is not installed in every environment (it is absent from the
build sandbox); the golden tests skip there but the fixture itself and
the NotImplementedError gate are always exercised.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from cc2dataset_spark.operators.extraction import extract_document_links
from cc2dataset_spark.sources.wat import read_wat_archives
from tests.fixtures.build_tiny_wat import FIXTURE_PATH, build_warc_bytes, build
from tests.wat_fixtures import FIXTURE_RECORDS, oracle_extract

_HAS_FASTWARC = importlib.util.find_spec("fastwarc") is not None


def test_fixture_is_deterministic_and_checked_in():
    """The committed bytes must equal a fresh rebuild (mtime=0 gzip)."""
    assert os.path.exists(FIXTURE_PATH), "run tests/fixtures/build_tiny_wat.py"
    import gzip

    with open(FIXTURE_PATH, "rb") as f:
        committed = f.read()
    assert gzip.decompress(committed) == build_warc_bytes()


@pytest.mark.skipif(_HAS_FASTWARC, reason="fastwarc installed")
def test_read_wat_archives_gates_on_fastwarc(spark):
    with pytest.raises(NotImplementedError, match="fastwarc"):
        read_wat_archives(spark, [FIXTURE_PATH])


@pytest.mark.skipif(not _HAS_FASTWARC, reason="fastwarc not installed")
def test_read_wat_archives_golden_records(spark):
    """Archive scan yields exactly the guard-passing fixture records:
    the warcinfo record is filtered by record type, the malformed-JSON
    record is skipped at record level, and the null-Links record fails
    the envelope guard inside the iterator."""
    guarded = [
        r
        for r in FIXTURE_RECORDS
        if r["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]["Links"]
        is not None
    ]
    df = read_wat_archives(spark, [FIXTURE_PATH])
    assert df.count() == len(guarded)


@pytest.mark.skipif(not _HAS_FASTWARC, reason="fastwarc not installed")
@pytest.mark.parametrize(
    "document_type", ["image", "image_only", "audio", "text", "video"]
)
def test_read_wat_archives_golden_extraction(spark, tmp_path, document_type):
    """End-to-end archive bytes -> extraction == pure-Python oracle
    (uid spot checks included via full-tuple comparison)."""
    df = read_wat_archives(spark, [FIXTURE_PATH])
    got = sorted(
        tuple(r) for r in extract_document_links(df, document_type).collect()
    )
    want = sorted(oracle_extract(FIXTURE_RECORDS, document_type))
    assert got == want


def test_build_writes_fixture(tmp_path):
    """The builder runs anywhere and is stable across invocations."""
    p1 = build(str(tmp_path / "a.warc.gz"))
    p2 = build(str(tmp_path / "b.warc.gz"))
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
