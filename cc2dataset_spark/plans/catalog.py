"""Query catalog: the registry behind ``__spark_entry__.queries()``.

Every implemented operator from SURVEY.md §2 registers here as a named
(spark_fn, oracle_sql) pair. The driver runs the Spark side on
local[32] and the SQL side on DuckDB over the same parquet, comparing
row-count + schema + order-insensitive value-hash, so:

- alias every computed column identically in both;
- make results deterministic (explicit tie-breaks; no arbitrary-survivor
  dedup in oracle-checked queries);
- keep fractional aggregates exact: sum over DECIMAL then CAST to DOUBLE,
  so Spark's partial-agg ordering can't drift from DuckDB's.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclasses.dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


QUERIES: dict[str, Query] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports for side effect of @query registration
    from cc2dataset_spark.plans import (  # noqa: F401
        relational,
        relational2,
        relational3,
    )

    try:
        from cc2dataset_spark.plans import llm_ops  # noqa: F401
    except ImportError:
        pass
    try:
        from cc2dataset_spark.plans import windows_streaming  # noqa: F401
    except ImportError:
        pass
    try:
        from cc2dataset_spark.plans import reference_pipeline  # noqa: F401
    except ImportError:
        pass
    _LOADED = True
