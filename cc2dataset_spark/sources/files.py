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
