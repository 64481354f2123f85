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

        # Building a query advances the cache generation (see
        # cc2dataset_spark/caching.py): tracked persists are released
        # only when they fall RELEASE_DEPTH (default 2) builds behind,
        # so build-then-collect AND build-two-then-join/compare both
        # compute against live pins. The registry holds the wrapped
        # fn; the module-level name stays the raw fn so intra-module
        # composition doesn't advance the generation mid-query.
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            caching.advance_generation()
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
# Round-11 window: 4 debuts + 1 red re-queue + 45 re-confirmation
# slots. CORRECTNESS_r10 landed 49 green / 1 red
# (embed_covariance_exact, hash-only), so the red keeps its slot
# (rule 4, re-queued with the all-integer output fix); debuts are
# the r10 registration wave in queue order (rule 5);
# re-confirmations are the stalest greens oldest-first: the FULL
# 41-query last-green-r7 cohort (r7-window order), then the 4
# oldest last-green-r8. After this window no query's latest
# driver green is older than r8.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r11 debuts — the r10 registration wave (queue order)
    "dedup_substring_spans_fp",
    "multimodal_png_pixel_stats",
    "dedup_substring_cut_text",
    "multimodal_png_ahash_groups",
    # red re-queue (rule 4): r10 hash-only red, output re-typed
    # all-integer this round (see operators/linalg.py)
    "embed_covariance_exact",
    # re-confirmation: the full last-green-r7 cohort (41)
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
    # re-confirmation: 4 oldest last-green-r8 (r8-window order)
    "events_value_quantiles_heavy",
    "dedup_prefix_jaccard",
    "curate_gopher_rules",
    "dedup_edit_distance_sources",
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
    # imports for side effect of @query registration. These
    # modules have no optional deps, so an ImportError here is a broken
    # registration module — let it propagate (a swallowed failure would
    # silently shrink the catalog; only DRIVER_PRIORITY names would
    # fail loudly via _ordered()'s KeyError).
    from cc2dataset_spark.plans import (  # noqa: F401
        curation,
        events_analytics,
        graph_ops,
        io_ops,
        llm_ops,
        multimodal_ops,
        reference_pipeline,
        relational,
        relational2,
        relational3,
        relational4,
        windows_streaming,
    )

    _LOADED = True
    # Backstop against a partial registration sneaking through (e.g. a
    # module that imports fine but whose decorators were edited out):
    # the catalog must never silently shrink below the driver window
    # plus the established layer-B families.
    if len(QUERIES) < len(DRIVER_PRIORITY):
        raise RuntimeError(
            f"catalog shrank: {len(QUERIES)} registered queries < "
            f"{len(DRIVER_PRIORITY)} driver-window slots"
        )
