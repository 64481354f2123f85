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
import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cc2dataset_spark import caching

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

        # Building a query first releases the PREVIOUS query's tracked
        # caches (see cc2dataset_spark/caching.py): every production
        # path builds-then-collects one query at a time, so this is
        # the earliest point the previous caches are provably dead.
        # The registry holds the wrapped fn; the module-level name
        # stays the raw fn so intra-module composition doesn't
        # double-release.
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            caching.release_all()
            return fn(spark, sf_dir)

        QUERIES[name] = Query(
            name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "",
            tags=tags,
        )
        return fn

    return deco


# The external driver's correctness harness checks the FIRST 50 entries
# of queries() (CORRECTNESS_r01.json keys == registration order [:50]),
# so ordering is part of the contract. This list pins the window
# explicitly. Rotation policy, per-round slot maps, and the full green
# history live in ROTATION.md (repo root) — keep that file and this
# tuple in sync; the invariant is "every catalog query gets a green
# driver row in some round, and re-confirmation at least every ~3
# rounds via the local oracle suite + window rotation". Queries not
# listed here follow in registration order; everything rotated out
# stays covered by the local oracle suite (tests/test_oracle.py), which
# runs ALL oracle-backed queries every CI pass.
#
# Round-6 window: the 20 r5 debuts that had never received a driver row
# rotate IN (13 LLM-ops/events/as-of operators + the 7 remaining TPC-H
# fill-ins q7/q9/q11/q12/q15/q16/q20); ceded are 12 slots green in 4-5
# consecutive rounds and 8 once-green r5 slots whose family stays
# represented. events_sessionize stays — its r5 red was an oracle
# HUGEINT cast bug (fixed; see events_analytics.py) and it needs its
# first green.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r7 debut queue (ROTATION.md policy rule 5 — the seven r6
    # registrations that queued when the r6 window had no cedable
    # slots; each must earn its first driver green this round)
    "cc_dedup_normalized_url",
    "text_bigram_perplexity",
    "dedup_winnow_overlap",
    "dedup_bloom_prefilter",
    "profile_lineitem_columns",
    "events_value_quantiles",
    "dedup_sorted_neighborhood",
    # re-confirmation, oldest-green first (policy rule 3): the 24
    # queries whose only driver green is round 1
    "agg_distinct_counts",
    "agg_minmax_by",
    "rollup_order_status",
    "cube_returns",
    "q5_local_supplier_volume",
    "join_outer_order_counts",
    "subquery_in_negative_balance",
    "window_running_value",
    "window_lag_gap",
    "window_rank_dense_ntile",
    "window_first_last_nth",
    "setop_union_distinct_keys",
    "scalar_json_dates",
    "scalar_math_lineitem",
    "scalar_regex_extract",
    "filter_pushdown_orders",
    "agg_percentiles_price",
    "histogram_totalprice",
    "agg_filtered_conditional",
    "sample_deterministic",
    "q13_customer_distribution",
    "q18_large_orders",
    "explode_outer_long_words",
    "q2_min_cost_supplier",
    # re-confirmation: 19 of the last-green-r4 cohort, chosen so every
    # operator family keeps a live row (text, dedup, curation, ANN,
    # multimodal, events, TPC-H core, join variants, top-k, set ops)
    "text_token_stats",
    "text_quality_scores",
    "dedup_fingerprint_documents",
    "dedup_embedding_cosine",
    "curate_quality_filter",
    "ann_bruteforce_topk",
    "multimodal_binary_stats",
    "events_tumbling_10m",
    "events_session_30m",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_broadcast_geo",
    "join_semi_big_spenders",
    "join_anti_no_orders",
    "join_range_shipments",
    "join_asof_last_order",
    "window_topk_orders_per_cust",
    "sort_topk_orders",
    "setop_nation_coverage",
)


def _ordered() -> dict[str, Query]:
    _load_all()
    # The first 50 entries ARE the driver's correctness window, so a
    # typo in DRIVER_PRIORITY must fail loudly — silently skipping it
    # would let registration order fill the slot with an unintended
    # query and the rotation bookkeeping above would be fiction.
    unknown = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if unknown:
        raise KeyError(f"DRIVER_PRIORITY names not in registry: {unknown}")
    out: dict[str, Query] = {}
    for name in DRIVER_PRIORITY:
        out[name] = QUERIES[name]
    for name, q in QUERIES.items():
        if name not in out:
            out[name] = q
    return out


def queries() -> dict[str, SparkQuery]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports for side effect of @query registration; priority families
    # first so even raw registration order puts them up front
    try:
        from cc2dataset_spark.plans import reference_pipeline  # noqa: F401
    except ImportError:
        pass
    try:
        from cc2dataset_spark.plans import llm_ops  # noqa: F401
    except ImportError:
        pass
    try:
        from cc2dataset_spark.plans import windows_streaming  # noqa: F401
    except ImportError:
        pass
    from cc2dataset_spark.plans import (  # noqa: F401
        curation,
        events_analytics,
        graph_ops,
        io_ops,
        multimodal_ops,
        relational,
        relational2,
        relational3,
        relational4,
    )

    _LOADED = True
