"""WAT/WARC sources (SURVEY.md §2.1 S1-S10).

Three ingestion paths, most- to least-declarative:

1. ``read_wat_structs`` — WAT records already materialized as structs
   (parquet/JSON with WAT_SCHEMA). Fully declarative; used by the
   hermetic tests and any pre-parsed lake.
2. ``read_wat_jsonl`` — JSON-lines of WAT envelopes via
   ``spark.read.schema(WAT_SCHEMA).json`` (schema-on-read, no inference;
   malformed rows -> nulls, dropped by the envelope guards, mirroring
   the reference's skip-and-log at main.py:139-143).
3. ``read_wat_archives`` — real gzipped WARC archives. Binary WARC
   decoding has no Spark primitive, so this is the one mapPartitions
   source (one Spark partition per WAT path, exactly like the
   reference's ``sc.parallelize(paths, len(paths))`` at main.py:274),
   emitting rows with an EXPLICIT schema (no sampling inference).
   Needs fastwarc; import is gated so the engine works without it.

Index discovery (S1-S5) lists crawl indexes and samples WAT paths;
network listing is driver-side (it is a metadata operation), the
index-file *content* read is distributed via spark.read.text.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# Explicit WAT record schema (SURVEY.md §1.1) — the dynamic dict paths
# the reference navigates (main.py:144-164), made static.
LINK_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("alt", StringType()),
        StructField("text", StringType()),
        StructField("path", StringType()),
    ]
)

WAT_SCHEMA = StructType(
    [
        StructField(
            "Envelope",
            StructType(
                [
                    StructField(
                        "Payload-Metadata",
                        StructType(
                            [
                                StructField(
                                    "HTTP-Response-Metadata",
                                    StructType(
                                        [
                                            StructField(
                                                "HTML-Metadata",
                                                StructType(
                                                    [
                                                        StructField(
                                                            "Links", ArrayType(LINK_TYPE)
                                                        ),
                                                        StructField(
                                                            "Head",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "Base",
                                                                        StringType(),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                ),
                                            )
                                        ]
                                    ),
                                )
                            ]
                        ),
                    ),
                    StructField(
                        "WARC-Header-Metadata",
                        StructType([StructField("WARC-Target-URI", StringType())]),
                    ),
                ]
            ),
        ),
        StructField(
            "Container", StructType([StructField("Filename", StringType())])
        ),
    ]
)

# Output schema of extraction — explicit, never inferred
# (reference infers via toDF at main.py:285; column order pinned by
# tests/test_single_warc.py:19).
EXTRACT_SCHEMA = StructType(
    [
        StructField("uid", StringType()),
        StructField("url", StringType()),
        StructField("alt", StringType()),
        StructField("cc_filename", StringType()),
        StructField("page_url", StringType()),
    ]
)


def read_wat_structs(spark: SparkSession, path: str) -> DataFrame:
    """Pre-parsed WAT records from parquet (nested-schema pruning keeps
    the scan to just the navigated paths)."""
    return spark.read.schema(WAT_SCHEMA).parquet(path)


def read_wat_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """WAT envelopes as JSON lines with schema-on-read."""
    return spark.read.schema(WAT_SCHEMA).json(path)


# ---------------------------------------------------------------------------
# Index discovery (S1-S5) — driver-side listing + distributed index read
# ---------------------------------------------------------------------------

CC_S3_GLOB = "s3://commoncrawl/crawl-data/*/wat.paths.gz"
CC_HTTP_PREFIX = "https://data.commoncrawl.org/"


def crawl_links_from_get_started_html(html: str) -> list[str]:
    """Extract per-crawl ``wat.paths.gz`` index URLs from the
    commoncrawl.org *get-started* page HTML — the reference's http
    discovery semantics (main.py:215-228), re-expressed as a PURE
    function over the page text so it is unit-testable offline against
    a checked-in HTML fixture (tests/fixtures/cc_get_started.html);
    only the live fetch needs network.

    Per the reference's contract: lines are pre-stripped of a
    ``[WARC] `` prefix; a line participates iff it mentions an
    ``<li>s3://commoncrawl/crawl-data/`` entry; the first
    space-delimited token is kept; the s3 bucket prefix rewrites to
    the public https gateway (``https://data.commoncrawl.org/``);
    ``<wbr>`` soft-break tags the site injects into long paths are
    removed; and ``/wat.paths.gz`` is appended with a ``//wat`` →
    ``/wat`` collapse so entries with and without a trailing slash
    both resolve."""
    out = []
    for raw in html.splitlines():
        line = raw.replace("[WARC] ", "")
        if "<li>s3://commoncrawl/crawl-data/" not in line:
            continue
        tok = line.split(" ")[0]
        tok = tok.replace(
            "<li>s3://commoncrawl/", CC_HTTP_PREFIX
        ).replace("<wbr>", "")
        out.append((tok + "/wat.paths.gz").replace("//wat", "/wat"))
    return out


def get_cc_wat_index_links(
    source_cc_protocol: str = "s3",
    bucket_url: str = "s3://commoncrawl/crawl-data/",
    url_to_fs=None,
) -> list[str]:
    """List crawl-index files (S1/S2, main.py:209-228). Driver-side
    metadata operation; requires fsspec+s3fs at call time.

    ``bucket_url`` relocates the crawl root (any fsspec scheme — the
    offline tests point it at a memory://-semantics store);
    ``url_to_fs`` injects the filesystem resolver (default
    ``fsspec.core.url_to_fs``) so the glob/link-building logic is
    unit-testable without fsspec installed — the same hermetic
    injection seam as pipeline's ``source``/``session_factory``.
    Scheme reattachment goes through ``fs.unstrip_protocol``, which
    yields exactly the reference's ``"s3://" + path`` form on s3 and
    stays correct for any other filesystem.

    Three protocols:

    - ``s3``: glob the bucket (reference parity).
    - ``http``: DELIBERATE divergence from the reference — read the
      machine-readable collinfo.json index instead of scraping the
      get-started HTML page (brittle against site redesigns). The
      crawl-id set can therefore differ from the scrape (collinfo
      lists every indexed crawl, newest first) — callers selecting
      "the last N crawls" get the same semantics, but the raw ordering
      is collinfo's, not the HTML page's.
    - ``http-scrape``: the reference's exact HTML-rewrite path
      (:func:`crawl_links_from_get_started_html` — the parse logic is
      offline-tested; only this fetch needs network), for when
      byte-parity with the reference's discovery matters."""
    if url_to_fs is None:
        import fsspec

        url_to_fs = fsspec.core.url_to_fs
    if source_cc_protocol == "s3":
        fs, p = url_to_fs(bucket_url)
        return [
            fs.unstrip_protocol(e)
            for e in fs.glob(p.rstrip("/") + "/*/wat.paths.gz")
        ]
    if source_cc_protocol == "http":
        fs, p = url_to_fs("https://index.commoncrawl.org/collinfo.json")
        import json as _json

        crawls = _json.loads(fs.open(p).read())
        return [
            CC_HTTP_PREFIX + f"crawl-data/{c['id']}/wat.paths.gz" for c in crawls
        ]
    if source_cc_protocol == "http-scrape":
        fs, p = url_to_fs(
            "https://commoncrawl.org/the-data/get-started/"
        )
        html = fs.open(p).read().decode("utf8")
        return crawl_links_from_get_started_html(html)
    raise ValueError(f"Unknown protocol {source_cc_protocol}")


def derive_wat_prefix(index_path: str) -> str:
    """The path prefix that makes a crawl index's BUCKET-RELATIVE
    entries ('crawl-data/CC-MAIN-.../....warc.wat.gz') openable, from
    the index file's own location: an s3/s3a commoncrawl index needs
    the bucket prefix, an https one the public gateway. '' for
    local/unknown layouts (caller supplies ``prefix`` explicitly).
    Silent-empty-run guard: without a prefix the relative entries look
    like missing LOCAL files on every executor, the retry/skip tiers
    swallow them, and the pipeline 'succeeds' with zero rows."""
    for scheme in ("s3://", "s3a://"):
        if index_path.startswith(scheme + "commoncrawl/"):
            return scheme + "commoncrawl/"
    if index_path.startswith(CC_HTTP_PREFIX):
        return CC_HTTP_PREFIX
    return ""


def read_wat_index(
    spark: SparkSession,
    index_paths: list[str],
    wat_count: int | None = None,
    seed: int | None = None,
    prefix: str | None = None,
    opener=None,
) -> list[str]:
    """Read gzipped index files of WAT paths (S3/S4) distributed via
    spark.read.text (Hadoop gzip codec), then sample/shuffle (S5).

    Scheme handling: Hadoop 3 ships only the ``s3a://`` S3 filesystem
    (``s3://``/``s3n://`` were removed), so discovery's ``s3://``
    index URLs are rewritten to ``s3a://`` for the distributed read;
    ``http(s)://`` indexes — which Hadoop's stub HttpFileSystem cannot
    list/read — are fetched driver-side via fsspec (they are a few MB
    of gzipped text; the 5M-path payload lands on the driver either
    way, see below).

    ``prefix=None`` (default) derives each index's WAT-path prefix
    from its own location (:func:`derive_wat_prefix`) — index entries
    are bucket-relative, and an empty prefix silently yields an
    all-unopenable path list. Pass an explicit prefix (possibly '')
    for non-CommonCrawl layouts.

    The reference samples WITH replacement (random.choices,
    main.py:247) — kept for parity; pre-dedup duplicates are fine
    because the pipeline dedups by uid anyway.

    Driver-memory note: the sampled/shuffled path list materializes
    on the driver ONCE here (the sample/shuffle needs the full list;
    the reference does the same, main.py:237-251) — ~5M strings ≈
    hundreds of MB at full crawl. It does NOT stay resident:
    pipeline.cc2dataset streams it to the on-disk manifest, drops it,
    and re-streams only each part's slice
    (pipeline._read_manifest_slice), so steady-state driver path
    memory is ~n/multipart; resume never materializes the list at
    all.
    """
    wats: list[str] = []
    hadoop_paths: list[tuple[str, str]] = []
    for ip in index_paths:
        pfx = derive_wat_prefix(ip) if prefix is None else prefix
        # Schemes Hadoop has no real filesystem for go driver-side
        # via fsspec (memory:// serves the offline S1-S5 tests; the
        # ``opener`` seam lets them run without fsspec installed).
        if ip.startswith(("http://", "https://", "memory://")):
            import gzip

            if opener is None:
                import fsspec

                opener = fsspec.open
            with opener(ip, "rb") as f:
                raw = f.read()
            text = (
                gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            ).decode("utf8")
            wats.extend(
                pfx + line.strip()
                for line in text.splitlines()
                if line.strip()
            )
        else:
            hp = (
                "s3a://" + ip[len("s3://"):]
                if ip.startswith("s3://")
                else ip
            )
            hadoop_paths.append((hp, pfx))
    by_prefix: dict[str, list[str]] = {}
    for hp, pfx in hadoop_paths:
        by_prefix.setdefault(pfx, []).append(hp)
    for pfx, hps in by_prefix.items():
        rows = spark.read.text(hps).collect()
        wats.extend(pfx + r.value.strip() for r in rows if r.value.strip())
    rng = random.Random(seed)
    if wat_count is not None:
        return rng.choices(wats, k=wat_count)
    rng.shuffle(wats)  # decorrelate parts (main.py:249-250)
    return wats


# ---------------------------------------------------------------------------
# Archive source (S6-S10) — the one mapPartitions boundary
# ---------------------------------------------------------------------------


def read_wat_archives(
    spark: SparkSession, wat_paths: list[str], retries: int = 10
) -> DataFrame:
    """WAT archives -> DataFrame[WAT_SCHEMA].

    One Spark partition per WAT path so a 100 TB crawl parallelizes to
    one task per ~1 GB archive with no skew (reference main.py:273-274).
    Everything downstream (explode, predicates, dedup) is declarative.

    The per-path iterator mirrors the reference's 3-tier error
    containment (main.py:141-143, 178-183, 190-200): record-level skip,
    file-level skip, retried IO. It is a self-contained closure —
    pickled by value (including the dependency-free WARC parser, see
    sources/warc_fallback.py), so executors need NOTHING beyond
    pyspark on their PYTHONPATH: fastwarc (fast C parser) and fsspec
    (remote IO) are used when present, with pure-stdlib fallbacks
    (gzip-member WARC reader, local open) otherwise.
    """
    from cc2dataset_spark.sources.warc_fallback import iter_warc_records

    def iter_wat_links(path: str) -> Iterator[dict]:
        import random as _random
        import time as _time
        from io import BytesIO

        try:
            import simdjson as _json
        except ImportError:  # pragma: no cover - container-dependent
            import json as _json

        def _open(p: str):
            try:
                import fsspec

                return fsspec.open(p, "rb").open()
            except ImportError:
                # same contract as wat_datasource._open_binary: a
                # remote scheme without fsspec is a CONFIGURATION
                # error and must fail loudly — builtin open would
                # raise FileNotFoundError, which the retry tier below
                # treats as flaky IO (10 retries, ~14 s of sleeps)
                # and then silently skips the file, making a missing
                # dependency indistinguishable from an empty crawl
                if "://" in p and not p.startswith("file://"):
                    raise NotImplementedError(
                        f"reading {p!r} requires fsspec for remote "
                        "schemes"
                    ) from None
                return open(p.removeprefix("file://"), "rb")

        def _payload_readers(stream) -> Iterator:
            """metadata-record payload streams, via fastwarc when
            installed, else the stdlib WARC parser (identical record
            selection: WARC-Type == metadata)."""
            try:
                from fastwarc.warc import ArchiveIterator, WarcRecordType
            except ImportError:
                for wtype, _headers, payload in iter_warc_records(stream):
                    if wtype == "metadata":
                        yield BytesIO(payload)
                return
            for record in ArchiveIterator(
                stream, record_types=WarcRecordType.metadata, parse_http=False
            ):
                yield record.reader

        stream = None
        for i in range(retries):
            try:
                with _open(path) as f:
                    stream = BytesIO(f.read())
                break
            except NotImplementedError:
                raise  # missing fsspec: deterministic, never retried
            except Exception:  # noqa: BLE001 - flaky remote IO
                if i == retries - 1:
                    return
                _time.sleep(1 + _random.random())
        # Rows BUFFER per file, yielded only after the whole archive
        # parsed: the reference's file tier returns [] on a structural
        # failure (extract_documents_from_wat's broad except,
        # main.py:178-183), discarding links already extracted from
        # EARLIER records of that file — an incremental yield would
        # leak them. The buffer is bounded by one archive's extracted
        # links, exactly the reference's ``all_links`` list.
        rows: list[dict] = []
        try:
            for reader in _payload_readers(stream):
                try:
                    data = _json.load(reader)
                except Exception:  # noqa: BLE001 - malformed record: skip
                    continue
                envelope = data["Envelope"]
                payload = envelope["Payload-Metadata"]
                if "HTTP-Response-Metadata" not in payload:
                    continue
                html = payload["HTTP-Response-Metadata"]
                if "HTML-Metadata" not in html:
                    continue
                meta = html["HTML-Metadata"]
                # explicit None check: a present-but-null Links key must
                # fail the guard (not TypeError into the whole-file skip)
                if meta.get("Links") is None:
                    continue
                rows.append({
                    "Envelope": {
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": {
                                "HTML-Metadata": {
                                    "Links": [
                                        {
                                            "url": l.get("url"),
                                            "alt": l.get("alt"),
                                            "text": l.get("text"),
                                            "path": l.get("path"),
                                        }
                                        for l in meta["Links"]
                                    ],
                                    # (meta.get("Head") or {}): Head
                                    # PRESENT-BUT-NULL would make
                                    # .get default useless and the
                                    # AttributeError would hit the
                                    # whole-file except below,
                                    # discarding the entire archive —
                                    # the same null trap the Links
                                    # guard above documents
                                    "Head": {
                                        "Base": (
                                            meta.get("Head") or {}
                                        ).get("Base")
                                    },
                                }
                            }
                        },
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI": envelope["WARC-Header-Metadata"][
                                "WARC-Target-URI"
                            ]
                        },
                    },
                    "Container": {"Filename": data["Container"]["Filename"]},
                })
        except Exception:  # noqa: BLE001 - whole-file parse failure: drop ALL
            return
        yield from rows

    sc = spark.sparkContext
    rdd = sc.parallelize(wat_paths, max(1, len(wat_paths))).flatMap(iter_wat_links)
    return spark.createDataFrame(rdd, WAT_SCHEMA)
