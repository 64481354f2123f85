"""``wat`` Python Data Source (Spark 4 DataSource API) — the
DataSourceV2-style packaging of the WAT archive source that SURVEY.md
§4 lists as the clean enhancement over a bare mapPartitions bridge:

    spark.dataSource.register(WatDataSource)
    df = (spark.read.format("wat")
               .option("paths", "a.warc.gz,b.warc.gz")   # or a manifest
               .option("mode", "warc")                    # or "jsonl"
               .load())

Properties the V2 packaging buys over ``read_wat_archives``:

- **Partition planning is the source's job**: one InputPartition per
  archive (the reference's ``parallelize(paths, len(paths))`` contract,
  main.py:273-274) is declared to the planner, so AQE sees real
  per-partition stats instead of an opaque RDD.
- **Schema is declared, not inferred** — the fixed WAT_SCHEMA.
- **Composable**: the result is a normal DataFrame; the extraction plan
  (operators/extraction.py) applies unchanged.

Two modes share the record pipeline:
- ``mode=warc``: real gzipped WARC archives — fastwarc when installed,
  else the stdlib gzip-member parser (sources/warc_fallback.py),
  exactly like read_wat_archives.
- ``mode=jsonl``: one WAT envelope JSON per line — the hermetic twin.

Reference parity notes: record iteration and the 3-tier error
containment mirror /root/reference/cc2dataset/main.py:138-200
(record-level skip on malformed JSON, file-level skip on archive
failure, retried whole-file read).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from cc2dataset_spark.sources.wat import WAT_SCHEMA


def _open_binary(path: str):
    """fsspec when available (any scheme), builtin open for local paths
    otherwise — keeps the source usable in minimal installs."""
    try:
        import fsspec
    except ImportError:
        if "://" in path and not path.startswith("file://"):
            raise NotImplementedError(
                f"reading {path!r} requires fsspec for remote schemes"
            ) from None
        return open(path.removeprefix("file://"), "rb")
    return fsspec.open(path, "rb").open()


def _navigate(data: dict) -> tuple | None:
    """WAT envelope dict -> WAT_SCHEMA-shaped nested tuple, or None when
    an explicit envelope guard fails (main.py:146-153 ``in`` checks —
    RECORD skip). Any OTHER structural error (missing Envelope /
    Container.Filename / WARC-Target-URI, a non-dict link) RAISES: the
    reference contains those at the FILE tier (the broad except at
    main.py:178-183 returns [], dropping the whole file), so the
    callers buffer per file and discard on raise."""
    envelope = data["Envelope"]
    payload = envelope["Payload-Metadata"]
    if "HTTP-Response-Metadata" not in payload:
        return None
    html = payload["HTTP-Response-Metadata"]
    if "HTML-Metadata" not in html:
        return None
    meta = html["HTML-Metadata"]
    if meta.get("Links") is None:
        return None
    links = [
        (l.get("url"), l.get("alt"), l.get("text"), l.get("path"))
        for l in meta["Links"]
    ]
    base = (meta.get("Head") or {}).get("Base")
    page_url = envelope["WARC-Header-Metadata"]["WARC-Target-URI"]
    filename = data["Container"]["Filename"]
    return (((((links, (base,)),),), (page_url,)), (filename,))


def _iter_warc(path: str, retries: int) -> Iterator[tuple]:
    import random as _random
    import time as _time
    from io import BytesIO

    try:
        import simdjson as _json
    except ImportError:  # pragma: no cover - container-dependent
        import json as _json

    def _payload_readers(stream) -> Iterator:
        try:
            from fastwarc.warc import ArchiveIterator, WarcRecordType
        except ImportError:
            from cc2dataset_spark.sources.warc_fallback import (
                iter_warc_records,
            )

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
            # open INSIDE the retry: remote stores fail at open() as
            # often as at read() (found by the X6 flaky-IO test)
            with _open_binary(path) as f:
                stream = BytesIO(f.read())
            break
        except Exception:  # noqa: BLE001 - flaky remote IO
            if i == retries - 1:
                return
            _time.sleep(1 + _random.random())
    # buffer per file: a structural failure anywhere drops the WHOLE
    # file's rows, including ones from earlier records — the
    # reference's file tier returns [] (main.py:178-183)
    rows: list[tuple] = []
    try:
        for reader in _payload_readers(stream):
            try:
                data = _json.load(reader)
            except Exception:  # noqa: BLE001 - malformed record: skip
                continue
            row = _navigate(data)
            if row is not None:
                rows.append(row)
    except Exception:  # noqa: BLE001 - whole-file parse failure: drop ALL
        return
    yield from rows


def _iter_jsonl(path: str, retries: int) -> Iterator[tuple]:
    import json as _json
    import random as _random
    import time as _time

    text = None
    for i in range(retries):
        try:
            with _open_binary(path) as f:
                text = f.read().decode("utf8")
            break
        except Exception:  # noqa: BLE001 - flaky remote IO
            if i == retries - 1:
                return
            _time.sleep(1 + _random.random())
    rows: list[tuple] = []
    try:
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                data = _json.loads(line)
            except ValueError:
                continue
            row = _navigate(data)  # structural raise -> file tier
            if row is not None:
                rows.append(row)
    except Exception:  # noqa: BLE001 - whole-file parse failure: drop ALL
        return
    yield from rows


class WatPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WatReader(DataSourceReader):
    def __init__(self, options: dict):
        paths_opt = options.get("paths", "")
        manifest = options.get("manifest")
        if manifest:
            with _open_binary(manifest) as f:
                lines = f.read().decode("utf8").splitlines()
            self.paths = [p.strip() for p in lines if p.strip()]
        else:
            self.paths = [p for p in paths_opt.split(",") if p]
        if not self.paths:
            raise ValueError("wat source needs option 'paths' or 'manifest'")
        self.mode = options.get("mode", "warc")
        if self.mode not in ("warc", "jsonl"):
            raise ValueError(f"unknown wat mode {self.mode!r}")
        # mode=warc runs fastwarc when installed, else the stdlib
        # gzip-member parser (sources/warc_fallback.py) — no gate.
        self.retries = int(options.get("retries", "10"))

    def partitions(self) -> list[InputPartition]:
        # one task per archive — the reference's parallelization contract
        return [WatPartition(p) for p in self.paths]

    def read(self, partition: WatPartition) -> Iterator[tuple]:
        it = _iter_warc if self.mode == "warc" else _iter_jsonl
        yield from it(partition.path, self.retries)


class WatDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wat"

    def schema(self):
        return WAT_SCHEMA

    def reader(self, schema) -> WatReader:
        return WatReader(self.options)
