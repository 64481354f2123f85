"""Filesystem routing for job-level IO (manifests, sink commits).

All driver/executor-side file manipulation outside Spark's own
readers/writers goes through ``fs_for(path)`` so output paths may
live on any filesystem an fsspec driver can reach (s3a://, gs://,
hdfs://, memory://, local). The reference does the same for its
manifests (main.py:290-296, 376-380); plain ``os.*`` would silently
write a literal ``"s3a:"`` directory on the driver's local disk.

Resolution order:

1. A filesystem registered via :func:`register_filesystem` for the
   path's protocol — the seam tests use to mount an fsspec-shaped
   in-memory fake (this container ships no fsspec), and embedders can
   use to inject pre-authenticated clients.
2. ``fsspec.core.url_to_fs`` when fsspec is installed (``s3a://`` is
   rewritten to fsspec's ``s3://`` — same object store).
3. A local-filesystem shim exposing the fsspec surface we use, so
   plain paths always work; remote schemes without fsspec fail
   loudly instead of landing on local disk.

The surface intentionally mirrors fsspec's AbstractFileSystem subset
used here: ``open, makedirs, exists, isdir, ls, mv, rm, rm_file,
glob``. ``ls`` returns FULL paths (fsspec semantics), callers
basename-filter. ``mv`` on a local filesystem is an atomic
``os.replace``; on object stores it is fsspec's copy+delete — safe
here because every ``mv`` happens inside an exactly-once driver-side
commit and the manifest (the reader's visibility gate) writes last.
"""

from __future__ import annotations

import glob as _glob
import os
import posixpath
import shutil

try:  # pragma: no cover - import gate
    import fsspec

    _HAVE_FSSPEC = True
except ImportError:  # pragma: no cover
    fsspec = None
    _HAVE_FSSPEC = False

# protocol -> filesystem object (tests, embedders). Consulted before
# fsspec so a registered fake wins even where fsspec is installed.
_REGISTRY: dict[str, object] = {}


def register_filesystem(protocol: str, fs: object) -> None:
    _REGISTRY[protocol] = fs


def unregister_filesystem(protocol: str) -> None:
    _REGISTRY.pop(protocol, None)


class _LocalFS:
    """os/glob/shutil-backed stand-in exposing the fsspec surface we
    use, so local paths never require fsspec."""

    @staticmethod
    def open(path: str, mode: str = "r", encoding: str | None = None):
        if "w" in mode or "a" in mode:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if "b" in mode:
            return open(path, mode)  # noqa: SIM115
        return open(path, mode, encoding=encoding)  # noqa: SIM115

    @staticmethod
    def makedirs(path: str, exist_ok: bool = True) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    @staticmethod
    def glob(pattern: str) -> list[str]:
        return _glob.glob(pattern)

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path)

    @staticmethod
    def isdir(path: str) -> bool:
        return os.path.isdir(path)

    @staticmethod
    def ls(path: str) -> list[str]:
        return [os.path.join(path, f) for f in os.listdir(path)]

    @staticmethod
    def mv(src: str, dst: str) -> None:
        os.replace(src, dst)

    @staticmethod
    def rm_file(path: str) -> None:
        os.remove(path)

    @staticmethod
    def rm(path: str, recursive: bool = False) -> None:
        if recursive and os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


def _strip_protocol(path: str) -> str:
    """MemoryFileSystem-style strip for registered fakes: drop the
    scheme, keep a leading slash (``memory://a/b`` -> ``/a/b``)."""
    rest = path.split("://", 1)[1]
    return rest if rest.startswith("/") else "/" + rest


def fs_for(path: str):
    """(filesystem, protocol-stripped path) for any supported path."""
    # Spark's s3a:// scheme is fsspec's s3://; same object store.
    if path.startswith("s3a://"):
        path = "s3://" + path[len("s3a://") :]
    if "://" in path:
        proto = path.split("://", 1)[0]
        if proto in _REGISTRY:
            fs = _REGISTRY[proto]
            strip = getattr(fs, "_strip_protocol", None)
            return fs, (strip(path) if strip else _strip_protocol(path))
    if _HAVE_FSSPEC:
        return fsspec.core.url_to_fs(path)
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"remote output path {path!r} requires fsspec, which is not "
            "installed; pip install fsspec (plus the scheme's driver, "
            "e.g. s3fs/gcsfs), register a filesystem for the scheme, "
            "or use a local path"
        )
    return _LocalFS(), path.removeprefix("file://")


def join(base: str, *parts: str) -> str:
    return posixpath.join(base, *parts)
