"""Archive-source tests (S6/S7, sources/wat.read_wat_archives).

The checked-in tiny.wat.warc.gz fixture holds the SAME envelopes as
tests/wat_fixtures.FIXTURE_RECORDS plus a warcinfo record and a
malformed-JSON record, so the archive path is checked golden-count
style against the same pure-Python oracle as the jsonl twin — the
rebuild's hermetic version of the reference's pinned-WAT golden tests
(/root/reference/tests/test_single_warc.py:22-54).

The archive path no longer gates on fastwarc: when it is absent (as
in the build sandbox) the stdlib gzip-member parser
(sources/warc_fallback.py) serves the same record stream, so the
golden tests run everywhere; where fastwarc IS installed the identical
assertions cover the fast path instead.
"""

from __future__ import annotations

import io
import os

import pytest

from cc2dataset_spark.operators.extraction import extract_document_links
from cc2dataset_spark.sources.wat import read_wat_archives
from cc2dataset_spark.sources.warc_fallback import iter_warc_records
from tests.fixtures.build_tiny_wat import FIXTURE_PATH, build_warc_bytes, build
from tests.wat_fixtures import FIXTURE_RECORDS, oracle_extract


def test_fixture_is_deterministic_and_checked_in():
    """The committed bytes must equal a fresh rebuild (mtime=0 gzip)."""
    assert os.path.exists(FIXTURE_PATH), "run tests/fixtures/build_tiny_wat.py"
    import gzip

    with open(FIXTURE_PATH, "rb") as f:
        committed = f.read()
    assert gzip.decompress(committed) == build_warc_bytes()


def test_fallback_parser_reads_fixture_records():
    """The stdlib parser sees every record (warcinfo + metadata) with
    headers and exact payload lengths, from the gzipped bytes."""
    with open(FIXTURE_PATH, "rb") as f:
        recs = list(iter_warc_records(f))
    types = [t for t, _, _ in recs]
    assert types.count("warcinfo") == 1
    # FIXTURE_RECORDS metadata + 1 malformed-JSON metadata record
    assert types.count("metadata") == len(FIXTURE_RECORDS) + 1
    for _, headers, payload in recs:
        assert int(headers["Content-Length"]) == len(payload)
        assert "WARC-Record-ID" in headers


def test_fallback_parser_reads_plain_and_raises_on_truncation():
    plain = build_warc_bytes()  # uncompressed
    recs = list(iter_warc_records(io.BytesIO(plain)))
    assert len(recs) >= 2
    with pytest.raises(ValueError, match="truncated|Content-Length|malformed"):
        list(iter_warc_records(io.BytesIO(plain[: len(plain) // 2])))
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(io.BytesIO(b"HTTP/1.1 200 OK\r\n\r\n")))


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


def _gz_warc(path, payloads):
    """Write a gzipped WARC of metadata records with the given JSON
    payload bytes (reusing the fixture builder's record writer)."""
    import gzip

    from tests.fixtures.build_tiny_wat import _warc_record

    buf = io.BytesIO()
    for i, payload in enumerate(payloads):
        buf.write(
            _warc_record(
                "metadata",
                {
                    "WARC-Date": "2020-01-01T00:00:00Z",
                    "WARC-Record-ID": f"<urn:uuid:t-{i}>",
                    "Content-Type": "application/json",
                },
                payload,
            )
        )
    with open(path, "wb") as f:
        f.write(gzip.compress(buf.getvalue(), mtime=0))
    return str(path)


def test_file_tier_drops_already_extracted_records(spark, tmp_path):
    """Reference containment parity (main.py:178-183): a structural
    failure (valid JSON, missing 'Envelope') anywhere in a file drops
    the WHOLE file's links — including records already parsed BEFORE
    the failure point (the reference returns [], discarding its
    all_links buffer). A malformed-JSON record, by contrast, is a
    record-tier skip that keeps the rest of ITS file."""
    import json

    good = json.dumps(FIXTURE_RECORDS[0], separators=(",", ":")).encode()
    # file A: good record THEN a structurally-broken one -> drop ALL
    fa = _gz_warc(tmp_path / "a.warc.gz", [good, b'{"not_envelope": 1}'])
    # file B: malformed JSON between two good records -> keep both
    fb = _gz_warc(
        tmp_path / "b.warc.gz", [good, b"{not json!!", good]
    )
    assert read_wat_archives(spark, [fa]).count() == 0
    assert read_wat_archives(spark, [fb]).count() == 2
    # both files in one scan: only file B's records survive
    assert read_wat_archives(spark, [fa, fb]).count() == 2


def test_http_scrape_discovery_rewrite_offline():
    """S1/S2 http-scrape discovery, offline: the get-started HTML
    rewrite (reference main.py:215-228 semantics) against a checked-in
    page fixture — '[WARC] ' prefixes stripped, <wbr> soft breaks
    removed, first space-token taken, s3 bucket prefix rewritten to
    the https gateway, trailing-slash entries collapsing //wat, and
    non-crawl bullets ignored. Only the live fetch stays env-gated."""
    import os

    from cc2dataset_spark.sources.wat import crawl_links_from_get_started_html

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "cc_get_started.html"
    )
    html = open(fixture, encoding="utf8").read()
    got = crawl_links_from_get_started_html(html)
    assert got == [
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-50/wat.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-40/wat.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-23/wat.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2023-14/wat.paths.gz",
    ]


# ---------------------------------------------------------------------------
# S1-S5 offline: glob discovery -> prefix derivation -> index read
# ---------------------------------------------------------------------------


class _FakeFS:
    """fsspec-shaped stand-in (glob + unstrip_protocol + open) with
    MemoryFileSystem / s3fs path semantics, so the discovery logic
    runs hermetically — this container ships no fsspec, which is
    exactly why the seam exists."""

    def __init__(self, protocol, files):
        self.protocol = protocol
        self.files = files  # path -> bytes

    def glob(self, pattern):
        import re

        rx = re.compile(
            "^"
            + "".join(
                "[^/]*" if c == "*" else re.escape(c) for c in pattern
            )
            + "$"
        )
        return sorted(p for p in self.files if rx.match(p))

    def unstrip_protocol(self, path):
        return f"{self.protocol}://{path}"

    def open(self, path, mode="rb"):
        import io

        return io.BytesIO(self.files[path])


def _gz_index(lines):
    import gzip

    return gzip.compress(("\n".join(lines) + "\n").encode("utf8"))


_CRAWLS = ["CC-MAIN-2023-50", "CC-MAIN-2024-10", "CC-MAIN-2024-18"]


def _fake_store(lead):
    files = {
        f"{lead}commoncrawl/crawl-data/{c}/wat.paths.gz": _gz_index(
            [
                f"crawl-data/{c}/segments/{s}/wat/f{s}.warc.wat.gz"
                for s in range(3)
            ]
        )
        for c in _CRAWLS
    }
    # decoys: wrong filename at crawl depth, right filename at the
    # wrong depth (a naive fnmatch '*' would cross the '/'), root junk
    files[f"{lead}commoncrawl/crawl-data/{_CRAWLS[0]}/warc.paths.gz"] = b"x"
    files[
        f"{lead}commoncrawl/crawl-data/{_CRAWLS[0]}/seg/wat.paths.gz"
    ] = b"x"
    files[f"{lead}commoncrawl/crawl-data/README"] = b"x"
    return files


def test_s3_glob_discovery_offline():
    """S1/S2 s3-glob branch (reference main.py:209-214), offline: the
    bucket glob must select exactly crawl-data/*/wat.paths.gz one
    level deep and reattach the filesystem's own scheme — byte-parity
    with the reference's 's3://' + path on s3 semantics."""
    from cc2dataset_spark.sources.wat import (
        derive_wat_prefix,
        get_cc_wat_index_links,
    )

    # s3fs semantics: no leading slash, protocol 's3'
    s3 = _FakeFS("s3", _fake_store(""))
    links = get_cc_wat_index_links(
        "s3", url_to_fs=lambda url: (s3, "commoncrawl/crawl-data/")
    )
    assert links == [
        f"s3://commoncrawl/crawl-data/{c}/wat.paths.gz" for c in _CRAWLS
    ]
    assert {derive_wat_prefix(l) for l in links} == {"s3://commoncrawl/"}

    # MemoryFileSystem semantics: leading slash, protocol 'memory'
    mem = _FakeFS("memory", _fake_store("/"))
    links = get_cc_wat_index_links(
        "s3",
        bucket_url="memory://commoncrawl/crawl-data/",
        url_to_fs=lambda url: (mem, "/commoncrawl/crawl-data"),
    )
    assert links == [
        f"memory:///commoncrawl/crawl-data/{c}/wat.paths.gz"
        for c in _CRAWLS
    ]
    # non-CommonCrawl layout: caller must supply the prefix explicitly
    assert {derive_wat_prefix(l) for l in links} == {""}


def test_wat_index_read_end_to_end_offline(spark):
    """S1->S5 chained offline: glob-discovered memory:// index links,
    driver-side gunzip via the opener seam, explicit prefix join,
    deterministic shuffle, and with-replacement sampling (reference
    main.py:237-251 semantics)."""
    from cc2dataset_spark.sources.wat import (
        get_cc_wat_index_links,
        read_wat_index,
    )

    mem = _FakeFS("memory", _fake_store("/"))
    links = get_cc_wat_index_links(
        "s3",
        bucket_url="memory://commoncrawl/crawl-data/",
        url_to_fs=lambda url: (mem, "/commoncrawl/crawl-data"),
    )

    def opener(url, mode="rb"):
        assert url.startswith("memory:///")
        return mem.open(url[len("memory://") :], mode)

    wats = read_wat_index(
        spark, links, prefix="s3a://commoncrawl/", opener=opener
    )
    want = {
        f"s3a://commoncrawl/crawl-data/{c}/segments/{s}/wat/f{s}.warc.wat.gz"
        for c in _CRAWLS
        for s in range(3)
    }
    assert set(wats) == want and len(wats) == len(want)
    # same seed -> identical shuffle order (decorrelation stays
    # reproducible for resume/debug)
    w1 = read_wat_index(
        spark, links, prefix="s3a://commoncrawl/", seed=7, opener=opener
    )
    w2 = read_wat_index(
        spark, links, prefix="s3a://commoncrawl/", seed=7, opener=opener
    )
    assert w1 == w2 and set(w1) == want
    # S5 sampling WITH replacement: exact count, all drawn from the index
    sampled = read_wat_index(
        spark, links, wat_count=20, seed=3, prefix="s3a://commoncrawl/",
        opener=opener,
    )
    assert len(sampled) == 20 and set(sampled) <= want
