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
