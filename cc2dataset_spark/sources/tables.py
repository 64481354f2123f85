"""Relational table sources over the driver fixture parquet.

Tables and schemas per /root/repo/FIXTURES.md §B. Scans stay fully
declarative (``spark.read.parquet``) so Catalyst keeps predicate pushdown,
column pruning, and partition sizing; never collect or infer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast when joined
# against fact tables — at 100 TB these stay KB-to-MB sized.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Session-scoped cache of the RESOLVED scan relation per
# (applicationId, sf_dir, table) — r14, VERDICT ask #4 (the per-query
# fixed floor): every `spark.read.parquet` call re-lists the path and
# re-reads the parquet footer ON THE DRIVER, measured at 200-370 ms
# per load_table call in a warm session — multiplied by ~2-4 table
# loads per query across a 209-query sweep, that re-listing alone was
# tens of seconds of pure driver time. The cached object is a LAZY
# DataFrame (an analyzed read plan) — NO result, NO rows, NOTHING
# derived from the data is cached; every action still scans the
# parquet. Keyed by applicationId so a stopped session can never
# serve a live caller (same invalidation contract as the PSL rules
# frame in functions/links.py); entries from other applications are
# pruned on insert so long-lived multi-session processes don't
# accumulate dead handles. Correctness note: the fixtures are
# immutable inputs by the driver contract — a mutated-in-place
# parquet path would serve a stale FileIndex until the session ends,
# the standard Spark cached-relation trade (same behavior as
# spark.catalog temp views).
_SCAN_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Parquet carries the schema; no inference.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot read
    natively; with ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces
    as a nanosecond BIGINT that we floor-truncate to microseconds —
    byte-identical to DuckDB's ns->us truncation.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # These two confs must hold even on sessions we didn't build (the
    # driver passes its own SparkSession) because RESULTS depend on
    # them; both are runtime-settable. UTC pins LTZ rendering and
    # timestamp-literal parsing so results are host-timezone-
    # independent (the fixtures and the DuckDB oracle are timezone-
    # naive); nanosAsLong is the only way to read the events fixture
    # at all. Purely plan-shaping confs (subset co-partitioning for
    # the neardup grid joins) are NOT set here — library code must not
    # silently retune a caller's session (r9); they live in the
    # session.py builders, and foreign sessions get correct plans with
    # at most one extra exchange unless they opt in themselves.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _SCAN_RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # TIMESTAMP_NTZ, like every other fixture timestamp: collect()
        # renders LTZ in the PYTHON PROCESS's timezone (not the session
        # tz), so an LTZ ts breaks value comparison on non-UTC hosts.
        # The LTZ->NTZ cast uses the session tz, pinned UTC above.
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"),
        )
    for stale in [k for k in _SCAN_RELATION_CACHE if k[0] != key[0]]:
        del _SCAN_RELATION_CACHE[stale]
    _SCAN_RELATION_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_small_scan(
    df: DataFrame, *key_cols: str, ref: DataFrame | None = None
) -> DataFrame:
    """Scan-parallelism floor for CPU-heavy narrow stages (guide §2.5:
    unsplittable input -> repartition right after the read).

    The fixture tables are SINGLE-row-group parquet files, and parquet
    cannot split below row-group boundaries, so a scan of e.g.
    documents (0.6 MB at sf0.1) plans exactly ONE partition — every
    narrow per-row stage built on it (tokenize+explode suffix streams,
    the O(n*d^2) covariance explode, interpreted HOF folds) serializes
    onto one core of local[32]. Measured r13-opt:
    quantized_second_moments over the 1-partition embeddings scan runs
    2.8-3.6 s; after spreading, 0.5-0.9 s.

    SCALE-ADAPTIVE, not a local[32] constant: the repartition happens
    only when the planned scan has fewer partitions than the session's
    defaultParallelism. At production scale the source is thousands of
    files/row groups, the condition is false, and the input DataFrame
    is returned untouched (no exchange in the plan). When it does
    fire, the exchange carries a table that is by construction smaller
    than one row group (KBs-to-MBs).

    Pass ``key_cols`` to hash-partition (deterministic, no local sort);
    without keys, round-robin ``repartition(n)`` (which pays the
    sort-before-repartition pass on its tiny input). Never use on
    plans that depend on partition placement (spark_partition_id,
    monotonically_increasing_id, per-partition sampling).

    ``ref``: optional NARROW ancestor of ``df`` (e.g. the base table a
    caller just projected) whose planned partition count equals
    ``df``'s; probing the ancestor lets the per-object memo absorb the
    driver-side planning pass across query builds.
    """
    from cc2dataset_spark.operators.partitioning import planned_partitions

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # planned_partitions memoizes the 175-280 ms driver-side planning
    # pass per DataFrame object (r13 VERDICT note #5); the session-
    # cached scan relations above make repeat query builds hit it.
    try:
        n_parts = planned_partitions(ref if ref is not None else df)
    except Exception:
        return df
    if n_parts >= target:
        return df
    if key_cols:
        from pyspark.sql import functions as F

        out = df.repartition(target, *[F.col(c) for c in key_cols])
    else:
        out = df.repartition(target)
    try:
        out._sg_scan_parts = target  # the spread output's count is known
    except Exception:
        pass
    return out
