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
# Round-12 window: 5 debuts + 45 re-confirmation slots.
# CORRECTNESS_r11 landed 50 green / 0 red, so every r11 slot is
# cedable (rule 2); debuts are the r11 registration wave in queue
# order (rule 5 — the five media-codec rows); re-confirmations are
# the stalest greens oldest-first: 45 of the 46-query
# last-green-r8 cohort in r8-window order (`events_scd2_event_type`
# onward). The one leftover r8 row (`events_lateness_profile`)
# is queued FIRST for r13. After this window no query's latest
# driver green is older than r8, and only that single row is r8.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r12 debuts — the r11 registration wave (queue order)
    "multimodal_jpeg_pixel_stats",
    "multimodal_wav_sample_stats",
    "multimodal_gif_pixel_stats",
    "multimodal_decode_real_mixed",
    "multimodal_wav_frame_energy",
    # re-confirmation: 45 oldest last-green-r8 (r8-window order)
    "events_scd2_event_type",
    "dedup_ngram_span_coverage",
    "curate_dsir_weights",
    "events_markov_transitions",
    "text_collocation_lift",
    "sample_weighted_tickets",
    "multimodal_cdc_chunks",
    "join_interval_busy_hours",
    "sketch_kmv_distinct_users",
    "events_quantile_sketch_bottomk",
    "er_snm_cluster_survivors",
    "text_heavy_hitter_words",
    "curate_pack_sequences",
    "sample_stratified_per_lang",
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
    "curate_dedup_paragraphs",
    "cc_domain_stats",
    "dedup_truncated_docs",
    "text_vocab_stats",
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
    "curate_dedup_report",
    "curate_langid_confusion",
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
