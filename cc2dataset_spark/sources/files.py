"""General file sources/sinks beyond parquet (SURVEY.md §2.1 S15):
CSV and JSON with explicit schemas (schema inference is a full extra
pass over the data — never acceptable at 100 TB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with mandatory schema; malformed rows are PERMISSIVE-
    nulled by default (pass mode='FAILFAST' to reject)."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """JSON-lines scan with mandatory schema (no inference pass)."""
    return spark.read.schema(schema).options(**options).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, **options: str) -> None:
    df.write.mode("overwrite").options(header=str(header).lower(), **options).csv(path)


def write_json(df: DataFrame, path: str, **options: str) -> None:
    df.write.mode("overwrite").options(**options).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options: str
) -> DataFrame:
    """ORC scan (built into Spark core; same pushdown/pruning surface
    as parquet). Schema optional — ORC files self-describe, so there
    is no inference pass to avoid — but passing one pins the contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, **options: str) -> None:
    df.write.mode("overwrite").options(**options).orc(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str], **options: str
) -> None:
    """Hive-style partitioned parquet layout (one directory level per
    partition column). Scans filtered on a partition column prune at
    PLANNING time — the pruned directories are never listed or read —
    which is the cheapest predicate pushdown there is at 100 TB; keep
    partition columns low-cardinality (date, lang, source bucket) so
    file counts stay sane."""
    df.write.mode("overwrite").partitionBy(*partition_by).options(**options).parquet(
        path
    )


def read_binary_files(
    spark: SparkSession, path: str, path_glob: str | None = None
) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    (path, modificationTime, length, content binary). This is the
    entry point of the multimodal column model
    (operators/multimodal.py) — images/audio/video come in as opaque
    bytes plus typed metadata, and every downstream decode/resize/
    feature step is an Arrow-batched mapInPandas over ``content``.

    Scale notes: one task per file by default — fine for media blobs
    (MBs each); for millions of tiny files prefer an upstream
    tar/parquet packing step, since file listing itself becomes the
    bottleneck. ``pathGlobFilter`` prunes extensions at listing time,
    before any bytes are read."""
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    n_files: int,
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Range-partitioned, sorted-within-file parquet layout for
    data-skipping: rows are range-repartitioned on ``sort_by`` into
    ``n_files`` non-overlapping key ranges and sorted within each, so
    every file's parquet min/max statistics are DISJOINT on the sort
    key. A later scan with a sort-key predicate then skips whole files
    (footer stats) and whole row groups — the poor-man's clustered
    index, no table format required. The range exchange samples the
    key distribution, so skewed keys still split evenly.

    Use for the final corpus write when downstream readers filter on a
    known column (date, domain, quality score). Not worth it for
    columns nobody filters on — the range shuffle is a full extra
    exchange over the sink data.

    With ``partition_by``, the partition columns lead the
    within-partition sort: FileFormatWriter re-sorts any task whose
    rows are not ordered by the partition columns (a NON-stable sort
    that would silently destroy the ``sort_by`` order inside each
    file); pre-sorting (partition_by, *sort_by) satisfies the writer's
    requirement so the secondary order survives into every file."""
    sort_cols = [*(partition_by or []), *sort_by]
    # Range keys LEAD with partition_by: ranging on sort_by alone
    # would hand every task rows of many partition values, and
    # FileFormatWriter opens one file per (task, partition value) —
    # up to n_files x n_partitions small files. Leading with the
    # partition columns keeps each task to one or two partition
    # values (~n_files total files) while sort_by still forms
    # disjoint within-partition ranges.
    out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).parquet(path)


def zorder_value(cols, mins, maxs, bits: int = 16):
    """Morton (Z-order) interleave of ``cols`` scaled into
    ``bits``-bit buckets via the supplied global (min, max) per
    column. Pure integer codegen: bucket = floor((x-min)/(max-min) *
    (2^bits-1)), then the buckets' bits interleave round-robin so
    nearby (x, y) pairs get nearby z values in BOTH dimensions."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        # Interleaved bit positions beyond 62 reach the bigint sign
        # bit: high-bucket rows would get NEGATIVE z and the range sort
        # would silently destroy the clustering instead of failing.
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits > 63 "
            f"(bigint sign bit); lower bits to <= {63 // n}"
        )
    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        c = F.col(c) if isinstance(c, str) else c
        span = F.when(hi - lo > 0, hi - lo).otherwise(F.lit(1.0))
        b = F.floor(
            (c.cast("double") - lo) / span * ((1 << bits) - 1)
        ).cast("bigint")
        buckets.append(F.greatest(F.least(b, F.lit((1 << bits) - 1)), F.lit(0)))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int,
    bits: int = 16,
    **options: str,
) -> None:
    """Multi-column data-skipping layout: rows sort by the Morton
    interleave of the ``zorder_by`` columns, so EVERY listed column's
    per-file min/max stats are compact — a single-column sort makes
    one column skippable and leaves the others full-range per file,
    Z-order makes each of d columns cover ~(1/n_files)^(1/d) of its
    range per file. The standard lakehouse technique (Delta/Iceberg
    OPTIMIZE ZORDER), here as a plain write: one 2-scalar-per-column
    global aggregate (broadcast back), a pure-integer z value, and
    the same range-repartition + sort as write_sorted_parquet.

    Deterministic: bucket boundaries come from exact global min/max,
    not sampling, so the same data always yields the same layout."""
    from pyspark.sql import functions as F

    aggs = []
    for c in zorder_by:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    row = df.agg(*aggs).collect()[0]
    if any(
        row[f"_min_{c}"] is None or row[f"_max_{c}"] is None
        for c in zorder_by
    ):
        # empty frame or an all-NULL / non-castable z column: there is
        # nothing to cluster — write the data (possibly zero rows)
        # unclustered rather than crashing on float(None); a pipeline
        # stage that filtered everything out is a legitimate producer
        df.write.mode("overwrite").options(**options).parquet(path)
        return
    mins = [F.lit(float(row[f"_min_{c}"])) for c in zorder_by]
    maxs = [F.lit(float(row[f"_max_{c}"])) for c in zorder_by]
    z = zorder_value(list(zorder_by), mins, maxs, bits=bits)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode("overwrite").options(**options).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files. Streaming sinks
    and per-part pipeline outputs (pipeline.py) accrete thousands of
    small files whose per-file open/footer cost eventually dominates
    scan time; compaction restores ~target-sized files. Returns the
    output file count.

    Uses coalesce (narrow — no shuffle: output files concatenate
    existing partitions) sized from the SOURCE byte size (a metadata
    listing, never a data scan), the same heuristic as
    pipeline.output_file_count. Run it per partition directory at
    scale so one compaction never rewrites the whole table. Returns
    the number of parquet files actually written — coalesce cannot
    INCREASE partition count, so the target may overshoot what the
    packed read yields."""
    import glob as _glob
    import math

    if "://" in src_path and not src_path.startswith("file://"):
        # glob.glob on a remote URI silently returns [] -> fs_bytes=0
        # -> coalesce(1) funnels the whole table through ONE task and
        # the return value lies. Remote compaction needs the store's
        # own listing; fail loudly instead of quietly mis-sizing.
        raise NotImplementedError(
            f"compact_parquet sizes from local listings; {src_path!r} "
            "is remote — run it against a local/file:// mirror or size "
            "n explicitly via coalesce"
        )
    files = _glob.glob(
        f"{src_path.removeprefix('file://')}/**/*.parquet", recursive=True
    )
    fs_bytes = _local_total_bytes(files)
    n = max(1, math.ceil(fs_bytes / target_file_bytes))
    spark.read.parquet(src_path).coalesce(n).write.mode("overwrite").parquet(
        dst_path
    )
    return len(_glob.glob(f"{dst_path}/**/*.parquet", recursive=True))


def _local_total_bytes(file_uris: list[str]) -> int:
    """Total size of the source files (local paths / file: URIs; at
    scale swap in the Hadoop FileSystem listing — the heuristic is the
    same)."""
    import os
    from urllib.parse import urlparse

    total = 0
    for uri in file_uris:
        p = urlparse(uri).path if "://" in uri else uri
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total
