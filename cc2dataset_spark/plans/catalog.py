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
# Round-14 window: 4 debuts + 46 re-confirmation slots.
# CORRECTNESS_r13 landed 50 green / 0 red, so every r13 slot is
# cedable (rule 2); debuts are the r13-build registration wave in
# queue order (rule 5 — WebP pixel stats, EXIF dims, WebP animation,
# integer audio resample), never driver-checked before.
# Re-confirmations are the stalest greens oldest-first: the 6
# remaining last-green-r9 rows, then 40 of the 49-query
# last-green-r10 cohort in r10-window order (`dedup_substring_spans`
# through `q20_dominant_suppliers`). The 9 leftover r10 rows
# (`cc_dedup_normalized_url`, `text_bigram_perplexity`,
# `dedup_winnow_overlap`, `dedup_bloom_prefilter`,
# `profile_lineitem_columns`, `events_value_quantiles`,
# `dedup_sorted_neighborhood`, `agg_distinct_counts`,
# `agg_minmax_by`) queue FIRST for r15. After this window no query's
# latest driver green is older than r10.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r14 debuts — the r13-build registration wave (queue order)
    "multimodal_webp_pixel_stats",
    "multimodal_exif_dims",
    "multimodal_webp_animation_stats",
    "multimodal_wav_resample_stats",
    # re-confirmation: the 6 remaining last-green-r9 rows
    "sketch_countmin_event_types",
    "curate_full_recipe",
    "events_sessionize",
    "graph_pagerank_brands",
    "agg_corr_lineitem",
    "q8_market_share",
    # re-confirmation: 40 oldest last-green-r10 (r10-window order)
    "dedup_substring_spans",
    "dedup_substring_apply",
    "text_bpe_pair_counts",
    "ann_simhash_topk",
    "text_winnow_fingerprints",
    "multimodal_frame_features",
    "text_bpe_token_stats",
    "curate_cap_per_source",
    "dedup_cluster_survivors_lsh",
    "dedup_cluster_twophase",
    "dedup_semantic_clusters",
    "curate_pii_scrub",
    "curate_decontaminate",
    "curate_train_val_split",
    "dedup_index_upsert",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "text_tfidf_topterms",
    "curate_repetition_flags",
    "curate_mix_languages",
    "text_char_entropy",
    "text_unigram_perplexity",
    "curate_quality_tiers",
    "text_chunk_documents",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_value_outliers",
    "events_rolling_wau",
    "graph_pagerank_trade",
    "join_asof_forward_next_order",
    "join_asof_nearest_order",
    "agg_regr_trend",
    "window_percent_cume",
    "q7_nation_volume",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_latency",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
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
