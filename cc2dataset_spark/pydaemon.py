"""Python worker daemon with the heavy per-worker stack pre-imported.

Drop-in replacement for ``pyspark.daemon`` (wired up via
``spark.python.daemon.module`` in :func:`session.build_spark_session`
for local masters): imports numpy/pandas/pyarrow and the PySpark Arrow
serializers ONCE in the daemon process, BEFORE it starts forking
workers, so every forked worker inherits the imported modules through
copy-on-write pages instead of importing them itself.

Why (optimization guide §4.5 — heavyweight init once, hoisted one
level above "once per task": once per EXECUTOR): each fresh Python
worker otherwise pays the full import of the scientific stack
(~1-2 s CPU and ~100 MB of freshly committed pages per process) the
first time an Arrow/pandas UDF runs in it. A stage that needs N
concurrent workers multiplies that by N — measured r13-opt: the first
query whose plan runs two concurrent Python stages spawned 33 extra
workers mid-query and paid 20+ s on a host whose kernel zeroes fresh
pages at 0.07-0.43 GB/s. With the preload, forked workers share the
daemon's already-resident module pages: no per-worker import CPU, and
almost no new page commits.

Failures are deliberately non-fatal: a missing optional package only
loses its preload benefit — the worker will import it on demand
exactly as before. The modules chosen are import-time thread-free
(numpy/BLAS and pyarrow spin their thread pools lazily on first use,
not at import), so pre-importing before fork is safe.
"""

from __future__ import annotations

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    # the Arrow<->pandas UDF serializers pull in the heavy pyarrow
    # submodules the workers actually touch first
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
):
    try:
        __import__(_mod)
    except Exception:  # pragma: no cover - absence just skips preload
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
