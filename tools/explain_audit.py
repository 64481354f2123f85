#!/usr/bin/env python
"""Generate PLANS.md: physical-plan audit of the headline queries —
evidence that filters/projections push to the scan, dims broadcast,
top-k avoids global sorts, and rank filters limit window state.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "agg_regr_trend",
    "join_range_shipments",
    "join_asof_last_order",
    "join_asof_union_last_order",
    "window_topk_orders_per_cust",
    "sort_topk_orders",
    "dedup_fingerprint_documents",
    # the LSH stages of the end-to-end clustering query are audited via
    # dedup_minhash_neardup; the clustering loop itself checkpoints
    # eagerly, so explaining its result would both RUN the job and show
    # only the post-checkpoint tail plan — nothing worth pinning
    "dedup_minhash_neardup",
    "dedup_ngram_jaccard",
    "curate_pii_scrub",
    "curate_decontaminate",
    "curate_train_val_split",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "events_tumbling_10m",
    "events_followup_pairs_10m",
    "sketch_countmin_event_types",
    "text_winnow_fingerprints",
    # late-r5 TPC-H widening + curation ops
    "q8_market_share",
    "q12_priority_latency",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "text_tfidf_topterms",
    "curate_repetition_flags",
    "curate_mix_languages",
    "text_char_entropy",
    "events_funnel_conversion",
    "events_retention_cohorts",
    # dedup_semantic_clusters / curate_full_recipe are excluded for the
    # same reason as the clustering queries above: constructing their
    # DataFrame runs the centroid collect / propagation loop, so the
    # explain would execute the job and show only the tail plan
    # (graph_pagerank_trade likewise: pagerank() counts nodes and
    # persists edges at construction time)
    # new-in-r5 incremental/quality ops
    "dedup_incremental_index",
    "text_unigram_perplexity",
    "events_sessionize",
    "dedup_index_upsert",
    "text_chunk_documents",
    "events_value_outliers",
    "agg_corr_lineitem",
    # graph_pagerank_* / curate_quality_tiers / ann_pq* construct with
    # driver actions (edge persist+count, codebook collect, range
    # sampling), so explaining them would run jobs — same exclusion
    # class as the clustering queries
    # new-in-r6 ops (dedup_sorted_neighborhood is excluded: its global
    # rank constructs with driver actions, same class as quality_tiers)
    "text_bigram_perplexity",
    "dedup_winnow_overlap",
    "dedup_bloom_prefilter",
    "profile_lineitem_columns",
    "events_value_quantiles",
    "cc_dedup_normalized_url",
    # new-in-r7 ops (events_value_quantiles_heavy is excluded: its
    # keyed rank constructs with driver actions — counts + offset
    # collect — same class as quality_tiers; dedup_embedding_cosine's
    # blocked kernel likewise counts the corpus to size its blocks)
    "dedup_prefix_jaccard",
    "curate_gopher_rules",
    "dedup_edit_distance_sources",
    # second-wave r7 ops
    "events_scd2_event_type",
    "curate_dsir_weights",
    "dedup_ngram_span_coverage",
    "events_markov_transitions",
    "text_collocation_lift",
    "sample_weighted_tickets",
    "multimodal_cdc_chunks",
    "join_interval_busy_hours",
    "sketch_kmv_distinct_users",
    "events_quantile_sketch_bottomk",
    # third-wave r7 ops
    "text_heavy_hitter_words",
    "curate_pack_sequences",
    "sample_stratified_per_lang",
    # fourth-wave r7 ops
    "text_bm25_topk",
    "events_time_weighted_avg",
    "sketch_kmv_setops",
    "join_salted_skew",
    "multimodal_image_dims",
    "dedup_cluster_best_quality",
    "curate_boilerplate_prefix",
    "text_unicode_nfc",
    "events_m4_downsample",
    "profile_cross_source_overlap",
    # fifth-wave r7 ops
    "curate_dedup_paragraphs",
    "cc_domain_stats",
    "dedup_truncated_docs",
    "text_vocab_stats",
    # sixth-wave r7 ops
    "cc_anchor_text_corpus",
    "graph_triangle_counts",
    "multimodal_phash_neardup",
    "io_compaction_plan",
    "text_readability",
    "curate_unimax_budget",
    "text_kneser_ney_counts",
    "events_anomaly_mad",
    "cc_image_text_manifest",
    "search_hybrid_rrf",
    "profile_key_skew",
    "multimodal_audio_frames",
    "curate_score_calibration",
    "graph_degree_distribution",
    "text_zipf_fit",
]


def main() -> None:
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all
    from cc2dataset_spark.session import build_spark_session

    _load_all()
    spark = build_spark_session(
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    lines = [
        "# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
        "",
        "Per headline query: the plan properties that matter at 100 TB,",
        "read from `.explain('formatted')` at sf0.1.",
        "",
        "| query | pushed filters | broadcast joins | sort-merge joins |"
        " exchanges | TakeOrdered | WindowGroupLimit |",
        "|---|---|---|---|---|---|---|",
    ]
    details = []
    for name in AUDITED:
        df = QUERIES[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        pushed = bool(
            re.search(r"PushedFilters: \[[^\]]", p)
        )

        # Count DISTINCT plan-node ids, not raw string occurrences:
        # formatted explain re-prints a persisted InMemoryRelation's
        # stored subtree at every reference (same node numbers), so a
        # query with nested caches would otherwise report each cached
        # exchange once per consumer — 46 "Exchanges" where the
        # executed plan has 12 (measured on graph_triangle_counts).
        def n_nodes(op: str) -> int:
            # tree lines look like "BroadcastHashJoin Inner BuildRight
            # (12)" / "Exchange (31)" — id is after optional modifiers
            return len(
                set(re.findall(rf"(?<![A-Za-z]){op}[^\n(]*\((\d+)\)", p))
            )

        row = (
            f"| {name} | {'yes' if pushed else '-'} "
            f"| {n_nodes('BroadcastHashJoin')} | {n_nodes('SortMergeJoin')} "
            f"| {n_nodes('Exchange') + n_nodes('BroadcastExchange')} "
            f"| {'yes' if 'TakeOrderedAndProject' in p else '-'} "
            f"| {'yes' if 'WindowGroupLimit' in p else '-'} |"
        )
        lines.append(row)
        schema = re.search(r"ReadSchema: (.*)", p)
        if schema:
            details.append(f"- **{name}** ReadSchema: `{schema.group(1)[:160]}`")
    lines += ["", "## Scan column pruning (first scan per query)", ""] + details
    lines += [
        "",
        "Notes:",
        "- Counts are DISTINCT plan-node ids (a persisted relation's",
        "  subtree reprints per consumer but executes once); every",
        "  aggregation pays exactly one partial+final exchange pair.",
        "- At sf0.1 all dimension joins broadcast (64 MB threshold); at",
        "  cluster scale AQE re-plans lineitem<->orders to sort-merge,",
        "  which is the intended strategy.",
        "- `dedup_minhash_neardup`'s only wide ops are the (band_idx,",
        "  band_hash) equi-join and the candidate-pair verify join —",
        "  both uniform-hash keyed, no skew.",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
