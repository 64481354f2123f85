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
# explicitly — one representative per SURVEY §2 row. Round-5 rotation:
# the 7 queries that had never received a driver row
# (text_winnow/text_bpe/sketch_countmin/curate_cap/q4/window_percent_
# cume/multimodal_decode_stub) plus the new agg_regr_trend swap in over
# 8 slots that were driver-green in BOTH rounds 1 and 4
# (scalar_string_part, scalar_date_arithmetic, sort_topk_orders,
# cross_join_region_matrix, pivot_status_by_priority,
# unpivot_customer_metrics, setop_nation_coverage,
# join_full_outer_nation_roles). Queries not listed here follow in
# registration order; everything rotated out stays covered by the local
# oracle suite (tests/test_oracle.py), which runs ALL oracle-backed
# queries every CI pass. Second r5 rotation: the queries ADDED in r5
# (q6/q10/q14, curate_pii_scrub, curate_decontaminate) take 5 more
# twice-green slots (q1_pricing_summary, join_broadcast_geo,
# join_semi_big_spenders, join_anti_no_orders,
# subquery_correlated_scalar) so every operator family gets a driver
# row in its debut round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # reference-parity core (layer A)
    "cc_extract_dedup_links",
    "cc_extract_image_wat",
    # LLM-ops: text analysis / curation (text_token_stats — green in
    # r1 AND r4 — ceded its slot to the new-in-r5
    # text_unigram_perplexity so the LM-quality-prior op debuts with a
    # driver row; the text family keeps 4 other slots)
    "text_unigram_perplexity",
    "text_lang_id",
    # curate_quality_filter (green r1, r2, AND r4) ceded its slot to
    # the new-in-r5 curate_quality_tiers — the rank-based CCNet
    # head/middle/tail split over the scalable global-rank operator —
    # so the op debuts with a driver row; the curation family keeps
    # 6 other slots
    "curate_quality_tiers",
    "top_tokens_per_lang",
    "text_tokenize_udtf",
    # rotated in r5: never driver-checked before
    "text_winnow_fingerprints",
    "text_bpe_token_stats",
    "sketch_countmin_event_types",
    "curate_cap_per_source",
    # new in r5: curation hygiene ops (+ deterministic split; took the
    # r1+r4-green scalar_struct_map_ops slot)
    "curate_pii_scrub",
    "curate_decontaminate",
    "curate_train_val_split",
    # LLM-ops: dedup family (minhash/simhash oracle-backed since r5;
    # dedup_incremental_index is new in r5 — the incremental-ingest
    # anti-join shape — and takes the slot of
    # dedup_fingerprint_documents, green in r1 AND r4 and sharing the
    # exact same fingerprint normalization)
    "dedup_exact_min_survivor",
    "dedup_incremental_index",
    "dedup_ngram_jaccard",
    "dedup_minhash_neardup",
    "dedup_simhash_embeddings",
    "dedup_cluster_survivors",
    # new in r5: the end-to-end LSH dedup decision (took the
    # r1+r4-green join_range_shipments slot) + the two-phase
    # contraction twin (took the r1+r4-green udaf_user_trend slot;
    # agg_regr_trend keeps the trend-agg family in-window)
    "dedup_cluster_survivors_lsh",
    "dedup_cluster_twophase",
    # LLM-ops: similarity search (ivf/simhash oracle-backed since r5;
    # late-r5: the PQ and IVF-PQ index debuts took the slots of
    # ann_bruteforce_topk and dedup_embedding_cosine — both green in
    # r1 AND r4, both exact quadratic baselines that stay covered by
    # the local oracle suite)
    "ann_pq_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_simhash_topk",
    "knn_label_vote",
    # LLM-ops: multimodal (stub chain fully oracle-backed late in r5 —
    # the deterministic fake decode is byte-arithmetic SQL can replay)
    # multimodal_binary_stats (green r1 AND r4) ceded its slot to the
    # new-in-r5 graph_pagerank_brands (the sum-preserving dangling
    # variant's debut); frame_features + decode_stub keep the
    # multimodal family in-window
    "graph_pagerank_brands",
    "multimodal_frame_features",
    "multimodal_decode_stub",
    # streaming surface (batch-checkable twins; events_tumbling_10m —
    # green r1, r2, AND r4 — ceded its slot to the new-in-r5
    # graph_pagerank_trade so the graph-analytics family debuts with a
    # driver row; sliding/session/followup keep the family in-window)
    "graph_pagerank_trade",
    "events_sliding_10m_5m",
    # events_session_30m (green r2 AND r4) ceded its slot to the
    # new-in-r5 events_sessionize — the per-event lag-flag-cumsum
    # formulation of the same 30-minute-gap concept, debuting with a
    # driver row
    "events_sessionize",
    "events_followup_pairs_10m",
    # late-r5 rotation: SemDeDup (embedding-cluster dedup) takes the
    # slot of array_ops_embeddings, green in both r2 and r4
    "dedup_semantic_clusters",
    # late-r5 rotation: the end-to-end curation recipe takes the slot
    # of agg_approx_distinct, green in both r2 and r4
    "curate_full_recipe",
    # new in r5: JVM regr_slope twin of the pandas UDAF
    "agg_regr_trend",
    # as-of joins: linear scale path (the candidate+max_by twin
    # join_asof_last_order was green in r1+r4; rotated out late in r5
    # for q8_market_share)
    "join_asof_union_last_order",
    "q8_market_share",
    # new in r5: TPC-H widening (pushdown probe, fact-fact top-k,
    # broadcast-dim ratio, OR-of-ANDs join, scalar-threshold + anti —
    # the last two took the r1+r4-green q3_shipping_priority and
    # text_quality_scores slots)
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q19_discounted_revenue",
    "q22_dormant_rich_customers",
    # one representative per remaining §2 family (late-r5 rotation:
    # grouping_sets_geo and window_topk_orders_per_cust, both green in
    # r1 AND r4, ceded their slots to the never-driver-checked
    # q17_small_quantity_revenue and q21_waiting_suppliers)
    "q17_small_quantity_revenue",
    "q4_order_priority_exists",
    "q21_waiting_suppliers",
    "window_range_frame_1h",
    "window_percent_cume",
    "setop_multiset_suppliers",
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
