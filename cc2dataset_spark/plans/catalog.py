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
# Round-13 window: 5 debuts + 45 re-confirmation slots.
# CORRECTNESS_r12 landed 50 green / 0 red, so every r12 slot is
# cedable (rule 2); debuts are the r12 registration wave in queue
# order (rule 5 — error containment, resize chain, G.711,
# progressive JPEG, GIF animation compositing); re-confirmations
# are the stalest greens oldest-first: `events_lateness_profile`
# (the last r8 green) then 44 of the 50-query last-green-r9 cohort
# in r9-window order (`cc_url_param_stats` onward). The 6 leftover
# r9 rows (`sketch_countmin_event_types`, `curate_full_recipe`,
# `events_sessionize`, `graph_pagerank_brands`, `agg_corr_lineitem`,
# `q8_market_share`) are queued FIRST for r14. After this window no
# query's latest driver green is older than r9.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r13 debuts — the r12 registration wave (queue order)
    "multimodal_decode_errors",
    "multimodal_resize_pixel_stats",
    "multimodal_wav_g711_stats",
    "multimodal_jpeg_progressive_stats",
    "multimodal_gif_animation_stats",
    # re-confirmation: the last r8 green, then 44 oldest
    # last-green-r9 (r9-window order)
    "events_lateness_profile",
    "cc_url_param_stats",
    "multimodal_caption_stats",
    "events_user_concentration",
    "text_ngram_novelty",
    "curate_blocklist_filter",
    "scalar_string_part",
    "grouping_sets_geo",
    "pivot_status_by_priority",
    "join_full_outer_nation_roles",
    "cross_join_region_matrix",
    "agg_approx_distinct",
    "scalar_date_arithmetic",
    "array_ops_embeddings",
    "subquery_correlated_scalar",
    "scalar_struct_map_ops",
    "unpivot_customer_metrics",
    "udaf_user_trend",
    "text_lang_id",
    "dedup_ngram_jaccard",
    "top_tokens_per_lang",
    "knn_label_vote",
    "text_tokenize_udtf",
    "dedup_exact_min_survivor",
    "dedup_cluster_survivors",
    "events_sliding_10m_5m",
    "events_followup_pairs_10m",
    "join_asof_union_last_order",
    "window_range_frame_1h",
    "setop_multiset_suppliers",
    "q4_order_priority_exists",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q19_discounted_revenue",
    "q22_dormant_rich_customers",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "cc_extract_image_wat",
    "cc_extract_dedup_links",
    "dedup_minhash_neardup",
    "dedup_simhash_embeddings",
    "dedup_incremental_index",
    "ann_ivf_topk",
    "multimodal_decode_stub",
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
