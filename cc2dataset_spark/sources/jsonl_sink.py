"""``jsonl_shard`` Python Data Source SINK (Spark 4 DataSource writer
API) — the write-side counterpart of the ``wat`` read source: sharded
jsonl output with a two-phase commit, the same atomicity concern the
pipeline's manifest + commit markers address (pipeline.py X13/X14,
reference main.py:254-329's write-then-count contract).

Protocol (executor/driver split):

- ``write`` (per task): rows stream to a TEMP file under ``_tmp/``
  named with a uuid, so concurrent speculative attempts of the same
  task never collide; the task returns a commit message carrying its
  temp path + row count.
- ``commit`` (driver, exactly once, only with one SUCCESSFUL message
  per task): temp files are renamed to their final ``part-NNNNN``
  names and a ``_MANIFEST.json`` records row/file totals — a reader
  that requires the manifest sees either the complete output or
  nothing.
- ``abort``: temp files from failed attempts are removed; the final
  directory is never touched.

Worth having beside ``DataFrame.write.json`` because the commit hook
is user-visible: production sinks hang dataset registration, count
reconciliation, or marker files off exactly this two-phase structure.

SHARED-FILESYSTEM REQUIREMENT: ``write`` runs on executors and
``commit`` renames those temp paths on the DRIVER, so the output path
must be a filesystem both sides see. All IO routes through
``cc2dataset_spark.fsio`` (r10): local paths use the os shim
(``mv`` = atomic os.replace), and with fsspec installed the same
protocol runs against object stores (``s3a://``/``s3://``, ``gs://``
— the writer resolves the filesystem once on the driver and ships it
pickled to executors, the standard fsspec pattern; ``mv`` there is
copy+delete, safe because it happens inside the exactly-once driver
commit and the manifest — the reader's visibility gate — writes
last). The two-phase PROTOCOL (temp -> message -> driver commit) is
the production shape on every backend.
"""

from __future__ import annotations

import json
import posixpath
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

from cc2dataset_spark import fsio


class _ShardCommit(WriterCommitMessage):
    def __init__(self, temp_path: str, n_rows: int) -> None:
        self.temp_path = temp_path
        self.n_rows = n_rows


class _JsonlShardWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_shard sink needs option 'path'")
        # Resolve the filesystem ONCE on the driver and keep it on the
        # writer: the writer object is pickled to executors, so write()
        # uses the same (re-connectable) filesystem the commit will.
        self._fs, self.path = fsio.fs_for(path)
        self.cols = schema.fieldNames()
        self.overwrite = overwrite
        # Fail fast on the driver in append/default mode: committing
        # into a directory holding parts from a previous, LARGER run
        # would leave stale part-NNNNN files beyond len(messages) —
        # _MANIFEST.json totals would disagree with a directory glob
        # and a non-manifest reader double-counts rows.
        if not overwrite and self._fs.isdir(self.path):
            stale = [
                f
                for f in self._fs.ls(self.path)
                if posixpath.basename(f).startswith("part-")
                and f.endswith(".jsonl")
            ]
            if stale:
                raise FileExistsError(
                    f"jsonl_shard target {path!r} already holds "
                    f"{len(stale)} part file(s); use mode('overwrite') "
                    "to replace them"
                )

    def write(self, iterator) -> _ShardCommit:
        tmp_dir = posixpath.join(self.path, "_tmp")
        self._fs.makedirs(tmp_dir, exist_ok=True)
        temp = posixpath.join(
            tmp_dir, f"attempt-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with self._fs.open(temp, "w", encoding="utf8") as f:
            for row in iterator:
                f.write(
                    json.dumps(dict(zip(self.cols, row)), default=str) + "\n"
                )
                n += 1
        return _ShardCommit(temp, n)

    def commit(self, messages) -> None:
        # Overwrite happens at the commit point, not at write start:
        # a failed job aborts with the previous output intact, and the
        # stale-part hazard (old run larger than this one) is cleared
        # in the same exactly-once step that renames the new parts.
        # Removal failures must FAIL the commit (only a concurrent
        # already-gone file is tolerable): swallowing one (NFS ESTALE,
        # a reader's lock) would leave a stale part beyond the new
        # len(messages) and re-create the exact double-count hazard
        # overwrite exists to prevent — with the manifest asserting a
        # smaller total than a directory glob sees.
        if self.overwrite and self._fs.isdir(self.path):
            for f in self._fs.ls(self.path):
                base = posixpath.basename(f)
                if (
                    base.startswith("part-") and base.endswith(".jsonl")
                ) or base == "_MANIFEST.json":
                    try:
                        self._fs.rm_file(f)
                    except FileNotFoundError:
                        pass
        total = 0
        for i, m in enumerate(messages):
            final = posixpath.join(self.path, f"part-{i:05d}.jsonl")
            self._fs.mv(m.temp_path, final)
            total += m.n_rows
        manifest = {
            "rows": total,
            "files": len(messages),
            "schema": list(self.cols),
        }
        with self._fs.open(
            posixpath.join(self.path, "_MANIFEST.json"),
            "w",
            encoding="utf8",
        ) as f:
            json.dump(manifest, f)
        # losing attempts of speculated tasks leave temp files behind;
        # the commit point is where they are provably dead
        tmp_dir = posixpath.join(self.path, "_tmp")
        # an empty write (zero tasks produced rows) never created _tmp
        try:
            if self._fs.isdir(tmp_dir):
                self._fs.rm(tmp_dir, recursive=True)
        except OSError:
            pass

    def abort(self, messages) -> None:
        # messages holds None for every FAILED task (pyspark passes a
        # commit message only for tasks that completed) — skip those
        # rather than AttributeError over the original task failure.
        for m in messages:
            if m is None:
                continue
            try:
                self._fs.rm_file(m.temp_path)
            except (OSError, FileNotFoundError):
                pass


class JsonlShardDataSource(DataSource):
    """Register with ``spark.dataSource.register(JsonlShardDataSource)``
    then ``df.write.format("jsonl_shard").option("path", p).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shard"

    def writer(self, schema, overwrite: bool) -> _JsonlShardWriter:
        return _JsonlShardWriter(self.options, schema, overwrite)
