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
    # reference-parity core (layer A)
    "cc_extract_dedup_links",
    "cc_extract_image_wat",
    # LLM-ops: text analysis
    "text_unigram_perplexity",
    "text_winnow_fingerprints",
    "text_bpe_token_stats",
    "text_tfidf_topterms",
    "text_char_entropy",
    "text_chunk_documents",
    # LLM-ops: curation
    "curate_quality_tiers",
    "curate_cap_per_source",
    "curate_pii_scrub",
    "curate_decontaminate",
    "curate_train_val_split",
    "curate_repetition_flags",
    "curate_mix_languages",
    "curate_full_recipe",
    # LLM-ops: dedup family
    "dedup_incremental_index",
    "dedup_index_upsert",
    "dedup_minhash_neardup",
    "dedup_simhash_embeddings",
    "dedup_cluster_survivors_lsh",
    "dedup_cluster_twophase",
    "dedup_semantic_clusters",
    # LLM-ops: similarity search
    "ann_pq_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_simhash_topk",
    # LLM-ops: multimodal
    "multimodal_frame_features",
    "multimodal_decode_stub",
    # graph analytics
    "graph_pagerank_brands",
    "graph_pagerank_trade",
    # events / streaming-twin surface
    "events_sessionize",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_value_outliers",
    "events_rolling_wau",
    # sketches / statistics
    "sketch_countmin_event_types",
    "agg_regr_trend",
    "agg_corr_lineitem",
    # as-of joins: forward/nearest debut completes merge_asof parity
    "join_asof_forward_next_order",
    "join_asof_nearest_order",
    # TPC-H representatives
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_latency",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
    # windows / distribution
    "window_percent_cume",
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
        relational,
        relational2,
        relational3,
        relational4,
    )

    _LOADED = True
