"""fsio routing of the sink commit protocols: the jsonl_shard and
tar_shard two-phase commits (temp write -> driver rename -> manifest
last; abort removes losers) must run unchanged against a non-local
fsspec-shaped filesystem. The container ships no fsspec, so these
tests mount an in-memory fake through fsio.register_filesystem — the
same seam a real fsspec filesystem resolves through — and drive the
DataSourceWriter objects directly (the pure-Python API Spark calls),
which is exactly the protocol surface; Spark-integration coverage of
the same writers on local paths lives in test_jsonl_sink.py /
test_tar_sink.py. An in-memory fs shared across REAL executor
processes is impossible by construction (each worker unpickles its
own copy), so driver-side protocol coverage is the honest test here.
"""

import io
import json
import tarfile

import pytest
from pyspark.sql import types as ST

from cc2dataset_spark import fsio
from cc2dataset_spark.sources.jsonl_sink import _JsonlShardWriter
from cc2dataset_spark.sources.tar_sink import _TarShardWriter


class _MemWriteBuf(io.BytesIO):
    def __init__(self, fs, path, text):
        super().__init__()
        self._fs, self._path, self._text = fs, path, text

    def write(self, data):
        if self._text and isinstance(data, str):
            data = data.encode("utf8")
        return super().write(data)

    def close(self):
        if not self.closed:
            self._fs.files[self._path] = self.getvalue()
        super().close()


class _MemFS:
    """Dict-backed fsspec-shaped filesystem (the fsio surface)."""

    def __init__(self):
        self.files: dict[str, bytes] = {}

    def makedirs(self, path, exist_ok=True):
        pass  # object-store semantics: directories are implicit

    def isdir(self, path):
        p = path.rstrip("/") + "/"
        return any(k.startswith(p) for k in self.files)

    def exists(self, path):
        return path in self.files or self.isdir(path)

    def ls(self, path):
        p = path.rstrip("/") + "/"
        if not self.isdir(path):
            raise FileNotFoundError(path)
        return sorted(
            {p + k[len(p) :].split("/", 1)[0] for k in self.files if k.startswith(p)}
        )

    def open(self, path, mode="r", encoding=None):
        if "w" in mode:
            return _MemWriteBuf(self, path, "b" not in mode)
        data = self.files.get(path)
        if data is None:
            raise FileNotFoundError(path)
        if "b" in mode:
            return io.BytesIO(data)
        return io.StringIO(data.decode(encoding or "utf8"))

    def mv(self, src, dst):
        if src not in self.files:
            raise FileNotFoundError(src)
        self.files[dst] = self.files.pop(src)

    def rm_file(self, path):
        if path not in self.files:
            raise FileNotFoundError(path)
        del self.files[path]

    def rm(self, path, recursive=False):
        if recursive:
            p = path.rstrip("/") + "/"
            for k in [k for k in self.files if k.startswith(p)]:
                del self.files[k]
        else:
            self.rm_file(path)


@pytest.fixture()
def memfs():
    fs = _MemFS()
    fsio.register_filesystem("memory", fs)
    try:
        yield fs
    finally:
        fsio.unregister_filesystem("memory")


_JSONL_SCHEMA = ST.StructType(
    [
        ST.StructField("k", ST.StringType()),
        ST.StructField("v", ST.LongType()),
    ]
)
_TAR_SCHEMA = ST.StructType(
    [
        ST.StructField("key", ST.StringType()),
        ST.StructField("txt", ST.StringType()),
    ]
)


def _jsonl_writer(memfs, overwrite=False, path="memory://bkt/out"):
    return _JsonlShardWriter({"path": path}, _JSONL_SCHEMA, overwrite)


def test_jsonl_two_phase_commit_on_memory_fs(memfs):
    w = _jsonl_writer(memfs)
    m0 = w.write(iter([("a", 1), ("b", 2)]))
    m1 = w.write(iter([("c", 3)]))
    # phase 1 done: temps exist under _tmp, nothing final yet
    assert all(k.startswith("/bkt/out/_tmp/") for k in memfs.files)
    w.commit([m0, m1])
    names = sorted(memfs.files)
    assert names == [
        "/bkt/out/_MANIFEST.json",
        "/bkt/out/part-00000.jsonl",
        "/bkt/out/part-00001.jsonl",
    ]
    manifest = json.loads(memfs.files["/bkt/out/_MANIFEST.json"])
    assert manifest == {"rows": 3, "files": 2, "schema": ["k", "v"]}
    rows = [
        json.loads(line)
        for name in names
        if name.endswith(".jsonl")
        for line in memfs.files[name].decode().splitlines()
    ]
    assert rows == [
        {"k": "a", "v": 1},
        {"k": "b", "v": 2},
        {"k": "c", "v": 3},
    ]


def test_jsonl_abort_cleans_losers_on_memory_fs(memfs):
    w = _jsonl_writer(memfs)
    m0 = w.write(iter([("a", 1)]))
    w.abort([m0, None])  # None = task that failed before a message
    assert not any(k.endswith(".jsonl") for k in memfs.files)
    assert "_MANIFEST.json" not in str(memfs.files)


def test_jsonl_commit_drops_speculative_losers(memfs):
    w = _jsonl_writer(memfs)
    m0 = w.write(iter([("a", 1)]))
    _loser = w.write(iter([("a", 1)]))  # speculative twin, not committed
    w.commit([m0])
    assert sorted(memfs.files) == [
        "/bkt/out/_MANIFEST.json",
        "/bkt/out/part-00000.jsonl",
    ]


def test_jsonl_append_refuses_stale_overwrite_replaces(memfs):
    w = _jsonl_writer(memfs)
    w.commit([w.write(iter([("a", 1)])), w.write(iter([("b", 2)]))])
    with pytest.raises(FileExistsError, match="already holds"):
        _jsonl_writer(memfs)
    w2 = _jsonl_writer(memfs, overwrite=True)
    m = w2.write(iter([("z", 9)]))
    w2.commit([m])
    # the old LARGER run's part-00001 must be gone (double-count hazard)
    assert sorted(memfs.files) == [
        "/bkt/out/_MANIFEST.json",
        "/bkt/out/part-00000.jsonl",
    ]
    assert json.loads(memfs.files["/bkt/out/_MANIFEST.json"])["rows"] == 1


def test_tar_two_phase_commit_on_memory_fs(memfs):
    w = _TarShardWriter({"path": "memory://bkt/tars"}, _TAR_SCHEMA, False)
    m = w.write(iter([("s1", "hello"), ("s2", "world")]))
    w.commit([m])
    assert sorted(memfs.files) == [
        "/bkt/tars/_MANIFEST.json",
        "/bkt/tars/part-00000.tar",
    ]
    with tarfile.open(
        fileobj=io.BytesIO(memfs.files["/bkt/tars/part-00000.tar"])
    ) as tar:
        got = {
            mem.name: tar.extractfile(mem).read().decode()
            for mem in tar.getmembers()
        }
    assert got == {"s1.txt": "hello", "s2.txt": "world"}
    manifest = json.loads(memfs.files["/bkt/tars/_MANIFEST.json"])
    assert manifest["samples"] == 2 and manifest["shards"] == 1


def test_tar_abort_on_memory_fs(memfs):
    w = _TarShardWriter({"path": "memory://bkt/tars"}, _TAR_SCHEMA, False)
    m = w.write(iter([("s1", "hello")]))
    w.abort([m, None])
    assert memfs.files == {}


def test_pipeline_manifest_roundtrip_on_memory_fs(memfs):
    from cc2dataset_spark.pipeline import (
        _manifest_len,
        _read_manifest_slice,
        _write_manifest,
    )

    paths = [f"wat-{i:03d}" for i in range(10)]
    _write_manifest("memory://bkt/job/_wat_index_files.txt", iter(paths))
    assert _manifest_len("memory://bkt/job/_wat_index_files.txt") == 10
    assert _read_manifest_slice(
        "memory://bkt/job/_wat_index_files.txt", 3, 6
    ) == paths[3:6]


def test_unregistered_remote_scheme_fails_loudly():
    with pytest.raises(NotImplementedError, match="fsspec"):
        fsio.fs_for("gs://bucket/x")
