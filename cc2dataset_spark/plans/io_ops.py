"""Storage-housekeeping planning queries.

At 100 TB the table-maintenance layer (small-file compaction, manifest
pruning) is itself a distributed query over the FILE MANIFEST — a
rows-per-file table that is millions of rows where the data is
billions, so the planner must be a Spark plan, not a driver loop. The
fixture manifest is derived deterministically from `documents` (one
"file" per (source, doc_id div 20) slice, footer overhead included) so
DuckDB can check the plan end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table

_TARGET_BYTES = 16_384
_FOOTER_BYTES = 512


@query(
    "io_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT source,
             doc_id // 20 AS file_id,
             CAST(SUM(n_chars) AS BIGINT) + {_FOOTER_BYTES} AS n_bytes
      FROM documents GROUP BY source, doc_id // 20
    ), planned AS (
      SELECT source, file_id, n_bytes,
             COALESCE(SUM(n_bytes) OVER (
               PARTITION BY source ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_TARGET_BYTES} AS bin_id
      FROM files
    )
    SELECT source,
           -- the windowed SUM is HUGEINT in DuckDB, so its // quotient
           -- is too; Spark emits BIGINT
           CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_files,
           CAST(SUM(n_bytes) AS BIGINT) AS bin_bytes,
           MIN(file_id) AS first_file,
           MAX(file_id) AS last_file
    FROM planned GROUP BY source, bin_id
    """,
    tags=("io", "compaction", "maintenance"),
)
def io_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: within each table partition
    (source), pack files in FILE-ID ORDER into target-sized output
    bins via the running-sum rule bin = floor(bytes_before / target).
    Order-preserving on purpose — compacting a sorted or Z-ordered
    layout (sources/files.py) must merge CONTIGUOUS key ranges or it
    destroys the clustering the layout exists for; first-fit-decreasing
    packs ~3% tighter but shuffles ranges and needs a sequential bin
    state. The running-sum rule is one window pass, integer-exact, and
    embarrassingly partition-parallel.

    Output is the merge manifest a compaction job executes: one row
    per output bin with its input-file span and byte total. Bins can
    overshoot target by at most one file (a file larger than target
    gets its own bin) — the standard bound for order-preserving
    packing.

    Scale: the manifest is FILE-count-sized (a 100 TB table at 128 MB
    files is ~800k rows), the window partitions by table partition
    (bounded, parallel; no global sort), and the plan never touches
    the data files — the execute step does, reading each input file
    exactly once."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    files = docs.groupBy(
        "source", F.expr("doc_id div 20").alias("file_id")
    ).agg(
        (F.sum("n_chars").cast("bigint") + F.lit(_FOOTER_BYTES)).alias(
            "n_bytes"
        )
    )
    # SQL-expr window (not the Window builder): `div` keeps the bin
    # arithmetic in BIGINT floor division, byte-identical to DuckDB //
    planned = files.select(
        "source",
        "file_id",
        "n_bytes",
        F.expr(
            f"coalesce(sum(n_bytes) over (partition by source "
            f"order by file_id rows between unbounded preceding "
            f"and 1 preceding), 0) div {_TARGET_BYTES}"
        ).alias("bin_id"),
    )
    return planned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum("n_bytes").cast("bigint").alias("bin_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )
