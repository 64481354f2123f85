"""``tar_shard`` Python Data Source SINK — WebDataset-style sharded
tar output, the de-facto loader format for multimodal training data
(image/caption pairs stream as `.tar` shards; every major large-scale
vision-language training stack reads this layout). The write-side
counterpart of the multimodal ingestion path (`read_binary_files`),
and the natural final hop after the image-text manifest capstone.

Sample layout (WebDataset convention): each ROW becomes one sample —
a group of adjacent tar members sharing the row's ``key`` as
basename, one member per non-null column, named ``<key>.<column>``
(the column NAME is the member extension: ``jpg``, ``txt``,
``json``...). Binary columns write raw bytes; everything else writes
UTF-8 text. Null columns skip their member (a sample may lack a
modality). Loaders regroup members by basename, which is why members
of one sample are written adjacently and keys must be unique per row.

Commit protocol: identical two-phase structure as the ``jsonl_shard``
sink (temp-uuid per task attempt -> driver renames winners to
``part-NNNNN.tar`` + ``_MANIFEST.json`` exactly once; abort removes
losers) — see sources/jsonl_sink.py for the rationale. All IO routes
through ``cc2dataset_spark.fsio`` (r10): local paths via the os shim,
object stores via fsspec (or a registered filesystem), with the same
resolve-once-on-the-driver / pickle-to-executors pattern and the
same manifest-writes-last visibility gate.

Reproducibility: tar member metadata is pinned (mtime=0, uid/gid=0,
mode 0644), so identical row streams produce byte-identical shards —
dataset hashes are stable across re-runs, which is what makes shard
caching and integrity checks possible at 100 TB.
"""

from __future__ import annotations

import io
import json
import posixpath
import tarfile
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from cc2dataset_spark import fsio


class _TarCommit(WriterCommitMessage):
    def __init__(self, temp_path: str, n_samples: int, n_members: int):
        self.temp_path = temp_path
        self.n_samples = n_samples
        self.n_members = n_members


class _TarShardWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tar_shard sink needs option 'path'")
        # resolve once on the driver; the writer (and its filesystem)
        # is pickled to executors — see jsonl_sink.py
        self._fs, self.path = fsio.fs_for(path)
        self.key_col = options.get("key_col", "key")
        names = schema.fieldNames()
        if self.key_col not in names:
            raise ValueError(
                f"tar_shard sink needs a {self.key_col!r} column "
                f"(have {names}); override with option 'key_col'"
            )
        self.cols = names
        self.key_idx = names.index(self.key_col)
        self.overwrite = overwrite
        if not overwrite and self._fs.isdir(self.path):
            stale = [
                f
                for f in self._fs.ls(self.path)
                if posixpath.basename(f).startswith("part-")
                and f.endswith(".tar")
            ]
            if stale:
                raise FileExistsError(
                    f"tar_shard target {path!r} already holds "
                    f"{len(stale)} shard(s); use mode('overwrite') "
                    "to replace them"
                )

    def write(self, iterator) -> _TarCommit:
        tmp_dir = posixpath.join(self.path, "_tmp")
        self._fs.makedirs(tmp_dir, exist_ok=True)
        temp = posixpath.join(tmp_dir, f"attempt-{uuid.uuid4().hex}.tar")
        n_samples = n_members = 0
        # WebDataset regrouping is by member BASENAME: a duplicate key
        # silently merges two samples and a '/' nests the member under
        # a directory the loader never regroups — both documented
        # invariants, so enforce them here instead of shipping a
        # corrupt shard. The seen-set is per shard (task), bounded by
        # one partition's sample count.
        seen: set = set()
        with self._fs.open(temp, "wb") as fo, tarfile.open(
            fileobj=fo, mode="w"
        ) as tar:
            for row in iterator:
                key = row[self.key_idx]
                if key is None:
                    raise ValueError("tar_shard: null sample key")
                key = str(key)
                if not key or "/" in key:
                    raise ValueError(
                        f"tar_shard: invalid sample key {key!r} — keys "
                        "must be non-empty and must not contain '/' "
                        "(member names are <key>.<column> basenames)"
                    )
                if key in seen:
                    raise ValueError(
                        f"tar_shard: duplicate sample key {key!r} in "
                        "one shard — loaders regroup members by key, "
                        "so duplicates silently merge samples"
                    )
                seen.add(key)
                for i, col in enumerate(self.cols):
                    if i == self.key_idx:
                        continue
                    v = row[i]
                    if v is None:
                        continue
                    data = (
                        bytes(v)
                        if isinstance(v, (bytes, bytearray))
                        else str(v).encode("utf8")
                    )
                    info = tarfile.TarInfo(name=f"{key}.{col}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(data))
                    n_members += 1
                n_samples += 1
        return _TarCommit(temp, n_samples, n_members)

    def commit(self, messages) -> None:
        # same overwrite-at-commit + loud-stale-removal contract as
        # jsonl_sink.commit (failures there keep the old output whole)
        if self.overwrite and self._fs.isdir(self.path):
            for f in self._fs.ls(self.path):
                base = posixpath.basename(f)
                if (
                    base.startswith("part-") and base.endswith(".tar")
                ) or base == "_MANIFEST.json":
                    try:
                        self._fs.rm_file(f)
                    except FileNotFoundError:
                        pass
        samples = members = 0
        for i, m in enumerate(messages):
            final = posixpath.join(self.path, f"part-{i:05d}.tar")
            self._fs.mv(m.temp_path, final)
            samples += m.n_samples
            members += m.n_members
        manifest = {
            "samples": samples,
            "members": members,
            "shards": len(messages),
            "key_col": self.key_col,
            "schema": list(self.cols),
        }
        with self._fs.open(
            posixpath.join(self.path, "_MANIFEST.json"),
            "w",
            encoding="utf8",
        ) as f:
            json.dump(manifest, f)
        tmp_dir = posixpath.join(self.path, "_tmp")
        try:
            if self._fs.isdir(tmp_dir):
                self._fs.rm(tmp_dir, recursive=True)
        except OSError:
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                self._fs.rm_file(m.temp_path)
            except (OSError, FileNotFoundError):
                pass


class _TarShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TarShardReader(DataSourceReader):
    """READ side of ``tar_shard`` (r12 — closes the loader-handoff
    loop the r11 verdict flagged): partition = one ``part-*.tar``
    shard, rows = samples regrouped from adjacent ``<key>.<column>``
    members, exactly the WebDataset loader contract. Every non-key
    column surfaces as BINARY (raw member bytes — extension-based
    decoding is the loader's job, and it keeps the write->read round
    trip byte-exact); a sample that skipped a modality reads back as
    NULL. Column set and order come from the sink's
    ``_MANIFEST.json`` (override with option ``columns`` as a
    comma-list for foreign tars without a manifest)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("tar_shard source needs option 'path'")
        self._fs, self.path = fsio.fs_for(path)
        self.key_col, self.cols = _tar_shard_layout(
            self._fs, self.path, options
        )
        self.shards = sorted(
            f
            for f in self._fs.ls(self.path)
            if posixpath.basename(f).startswith("part-")
            and f.endswith(".tar")
        )

    def partitions(self) -> list[InputPartition]:
        # one task per shard — the same unit the sink committed and
        # the unit a training loader streams; at 100 TB parallelism
        # is shard count, no byte-range splitting of tar needed
        return [_TarShardPartition(p) for p in self.shards]

    def read(self, partition: _TarShardPartition):
        value_cols = [c for c in self.cols if c != self.key_col]
        col_set = set(value_cols)
        key_idx = self.cols.index(self.key_col)

        def make_row(key: str, members: dict):
            row = [members.get(c) for c in value_cols]
            row.insert(key_idx, key)
            return tuple(row)

        with self._fs.open(partition.path, "rb") as fo, tarfile.open(
            fileobj=fo, mode="r"
        ) as tar:
            cur_key = None
            members: dict = {}
            seen: set = set()
            for info in tar:
                if not info.isfile():
                    continue
                base = posixpath.basename(info.name)
                if "." not in base:
                    raise ValueError(
                        f"tar_shard: member {info.name!r} is not "
                        "<key>.<column>-shaped"
                    )
                key, col = base.rsplit(".", 1)
                if col not in col_set:
                    raise ValueError(
                        f"tar_shard: member {info.name!r} has unknown "
                        f"column {col!r} (schema: {self.cols})"
                    )
                if key != cur_key:
                    if cur_key is not None:
                        yield make_row(cur_key, members)
                    if key in seen:
                        # sink writes samples adjacently; a key
                        # reappearing later means an interleaved /
                        # foreign tar whose samples would silently
                        # split in two
                        raise ValueError(
                            f"tar_shard: sample key {key!r} is not "
                            "contiguous in the shard"
                        )
                    seen.add(key)
                    cur_key, members = key, {}
                members[col] = tar.extractfile(info).read()
            if cur_key is not None:
                yield make_row(cur_key, members)


def _tar_shard_layout(fs, path: str, options: dict):
    """(key_col, ordered column list) for a shard directory — from
    the sink's manifest, or the ``columns``/``key_col`` options."""
    cols_opt = options.get("columns")
    if cols_opt:
        cols = [c.strip() for c in cols_opt.split(",") if c.strip()]
        key_col = options.get("key_col", "key")
        if key_col not in cols:
            cols = [key_col] + cols
        return key_col, cols
    manifest_path = posixpath.join(path, "_MANIFEST.json")
    try:
        with fs.open(manifest_path, "r", encoding="utf8") as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"tar_shard source: no _MANIFEST.json under {path!r} — "
            "pass option 'columns' for foreign shard directories"
        ) from None
    return manifest["key_col"], list(manifest["schema"])


class TarShardDataSource(DataSource):
    """Register with ``spark.dataSource.register(TarShardDataSource)``
    then ``df.write.format("tar_shard").option("path", p).save()`` to
    write shards, and ``spark.read.format("tar_shard").option("path",
    p).load()`` to stream them back as (key string, <column> binary,
    ...) rows — both halves of the WebDataset loader handoff."""

    @classmethod
    def name(cls) -> str:
        return "tar_shard"

    def writer(self, schema, overwrite: bool) -> _TarShardWriter:
        return _TarShardWriter(self.options, schema, overwrite)

    def schema(self):
        from pyspark.sql.types import (
            BinaryType,
            StructField,
            StructType,
        )
        from pyspark.sql.types import StringType as _Str

        path = self.options.get("path")
        if not path:
            raise ValueError("tar_shard source needs option 'path'")
        fs, p = fsio.fs_for(path)
        key_col, cols = _tar_shard_layout(fs, p, self.options)
        return StructType(
            [
                StructField(
                    c, _Str() if c == key_col else BinaryType()
                )
                for c in cols
            ]
        )

    def reader(self, schema) -> _TarShardReader:
        return _TarShardReader(self.options)
