"""Scale-pattern joins: salted-join equivalence, bucketed co-located
join exchange elimination, IVF ANN recall."""

import io
import contextlib

from pyspark.sql import functions as F

from cc2dataset_spark.operators import similarity as SIM
from cc2dataset_spark.operators.joins import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from cc2dataset_spark.sources.tables import load_table


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").groupBy("l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey", salt_buckets=4).groupBy(
        "l_orderkey"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", num_buckets=8)
    write_bucketed(o, "o_b", "l_orderkey", num_buckets=8)
    # bucketed scans ignore the broadcast fast path only above the
    # threshold; force SMJ so the exchange elimination is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        plan = _formatted_plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == li.join(o, "l_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_incremental_dedup_bucketed_index_shuffles_only_batch(spark, sf_dir):
    """The dedup_incremental docstring claims that with the historical
    fingerprint index stored bucketed, only the small new batch
    shuffles. Prove it: the anti-join plan has exactly ONE Exchange
    (the batch side), the index comes in through a bucketed scan, and
    the downstream min-window reuses the join's fingerprint
    partitioning (ClusteredDistribution is count-agnostic) instead of
    re-exchanging."""
    from cc2dataset_spark.functions.hashes import md5_mod
    from cc2dataset_spark.operators.dedup import dedup_incremental

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    b = md5_mod(F.concat(F.lit("ix:"), F.col("doc_id").cast("string")), 100)
    index = docs.where(b < 80).select(fp.alias("fingerprint")).distinct()
    write_bucketed(index, "fp_index_b", "fingerprint", num_buckets=8)
    batch = docs.where(b >= 80).select("doc_id", "source", "text")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dedup_incremental(batch, spark.table("fp_index_b"), fp)
        plan = _formatted_plan(out)
        assert plan.count("Exchange (") == 1, plan
        assert "Bucketed: true" in plan, plan
        assert "LeftAnti" in plan, plan
        # and the result equals the unbucketed path
        want = dedup_incremental(batch, index, fp)
        assert {tuple(r) for r in out.collect()} == {
            tuple(r) for r in want.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS fp_index_b")


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(q, emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in SIM.ivf_topk(q, emb, k=3).collect()
    }
    assert approx  # produces results for every query
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2, f"IVF recall suspiciously low: {recall:.2f}"


def test_ivf_default_path_deterministic(spark, sf_dir):
    """Hash-sampled centroids + stable-tie argmax: identical output
    across runs (the kmeans-refined path explicitly is not)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    a = {tuple(r) for r in SIM.ivf_topk(q, emb, k=3).collect()}
    b = {tuple(r) for r in SIM.ivf_topk(q, emb, k=3).collect()}
    assert a == b


def test_ivf_kmeans_refined_runs_with_recall(spark, sf_dir):
    """Lloyd-refined centroids (the production path) keep recall at
    least as usable as the seed sample."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(q, emb, k=3).collect()
    }
    refined = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(q, emb, k=3, kmeans_iters=2).collect()
    }
    assert refined
    recall = len(refined & exact) / len(exact)
    assert recall >= 0.2, f"refined IVF recall suspiciously low: {recall:.2f}"


def test_ivf_plan_never_shuffles_corpus(spark, sf_dir):
    """The 100 TB contract: corpus list-assignment is narrow, the probe
    join broadcasts the query side — the only exchanges are the final
    per-query window partitioning and broadcasts. In particular no
    single-partition exchange may appear anywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    df = SIM.ivf_topk(q, emb, k=3)
    plan = _formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(corpus_id" not in plan, plan
    assert "hashpartitioning(list_id" not in plan, plan


def test_tpch_additions_plan_shapes(spark, sf_dir):
    """The plan contracts that make q6/q10/q14 100 TB-safe: q6 pushes
    every predicate to the parquet scan and reads only the 4 needed
    columns; q10's top-20 plans as TakeOrderedAndProject (no global
    sort) with nation broadcast; q14 broadcasts the part dimension
    (the filtered fact side never shuffles for the join)."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    p6 = _formatted_plan(QUERIES["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p6 or "GreaterThanOrEqual(l_shipdate" in p6, p6
    schema = p6.split("ReadSchema:")[1].splitlines()[0].strip()
    # each top-level column contributes exactly one "name:" marker
    # (type parameters like decimal(15,2) carry no colon), so this
    # holds for any scalar column types the fixture may use
    expected = {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}
    assert all(f"{c}:" in schema for c in expected), schema
    assert schema.count(":") == len(expected), schema

    p10 = _formatted_plan(QUERIES["q10_returned_items"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p10, p10
    assert "BroadcastHashJoin" in p10, p10
    assert "Sort" not in p10.split("TakeOrderedAndProject")[0], p10

    p14 = _formatted_plan(QUERIES["q14_promo_effect"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p14, p14
    assert "SortMergeJoin" not in p14, p14


def test_late_r5_tpch_plan_shapes(spark, sf_dir):
    """Plan contracts for the late-r5 TPC-H widening: every dimension
    join broadcasts (no SortMergeJoin anywhere in the star queries),
    selective predicates reach the scans, and both top-k queries plan
    as TakeOrderedAndProject rather than a global sort."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    p8 = _formatted_plan(QUERIES["q8_market_share"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in p8, p8
    assert "EqualTo(p_type,STANDARD)" in p8, p8

    p16 = _formatted_plan(QUERIES["q16_supplier_part_counts"].fn(spark, sf_dir))
    # the NOT-IN blacklist must be a broadcast ANTI join, and the
    # IN-list size predicate must push to the part scan
    assert "LeftAnti" in p16 and "BroadcastHashJoin" in p16, p16
    assert "In(p_size, [" in p16, p16  # IN-list pushed (order lexicographic)

    p17 = _formatted_plan(
        QUERIES["q17_small_quantity_revenue"].fn(spark, sf_dir)
    )
    # brand restriction rides a broadcast semi-join; the per-part
    # average and the rejoin share the l_partkey shuffle key
    assert "LeftSemi" in p17 and "BroadcastHashJoin" in p17, p17

    p21 = _formatted_plan(QUERIES["q21_waiting_suppliers"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p21, p21
    assert "SortMergeJoin" not in p21, p21


def test_curation_ops_plan_shapes(spark, sf_dir):
    """Scale contracts for plans/curation.py: the TF-IDF top-k is a
    WindowGroupLimit (per-group early pruning, no global sort); the
    mix sampler never shuffles the corpus — its only exchanges are the
    tiny per-lang aggregate and broadcasts back onto a map-side gate."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    ptf = _formatted_plan(QUERIES["text_tfidf_topterms"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in ptf, ptf
    # document frequency is a window over the SAME tf frame: the corpus
    # must be tokenized exactly once (one Generate/explode node) and
    # there is no term-keyed join at all
    assert ptf.count("Generate (") == 1, ptf
    assert "SortMergeJoin" not in ptf and "BroadcastHashJoin" not in ptf, ptf

    pmix = _formatted_plan(QUERIES["curate_mix_languages"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in pmix, pmix
    # corpus rows are gated map-side: no repartitioning keyed on doc_id
    assert "hashpartitioning(doc_id" not in pmix, pmix


def test_r6_ops_plan_shapes(spark, sf_dir):
    """Round-6 operators keep the plan shapes their docstrings claim."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    # winnow overlap: the explicit fp repartition must survive into
    # the plan (REPARTITION_BY_COL exchange) — it is what lets AQE
    # reuse one shuffle of the md5-shingle chain across the self-join
    # sides and the size count at runtime (measured ~30% at sf0.1;
    # static explain can't show runtime reuse under AQE). The stop-fp
    # cap must join as a broadcast anti.
    p = _formatted_plan(QUERIES["dedup_winnow_overlap"].fn(spark, sf_dir))
    assert "REPARTITION_BY_COL" in p, p
    assert "BroadcastHashJoin LeftAnti" in p, p

    # bloom prefilter: the bitmap words join the probes as a BROADCAST
    # (the bitmap is KBs); the batch must never sort-merge against it.
    p = _formatted_plan(QUERIES["dedup_bloom_prefilter"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p

    # quantiles: rank + count windows AND the final aggregate ride ONE
    # event_type exchange — exactly one shuffle below the agg (plus
    # AQE reads); no second exchange between Window and HashAggregate.
    p = _formatted_plan(QUERIES["events_value_quantiles"].fn(spark, sf_dir))
    n_exchanges = p.count("Exchange") - p.count("ReusedExchange")
    assert n_exchanges <= 2, p  # type exchange + final 1-row gather

    # bigram perplexity: the unigram join must stay a real shuffle join
    # at scale is fine, but the 1-row total must broadcast.
    p = _formatted_plan(QUERIES["text_bigram_perplexity"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Catalyst's runtime bloom-filter join pruning (the engine-native
    complement of operators/dedup.bloom_prefilter) fires on a
    selective-dim fact join once the scan crosses the size thresholds.
    Enabled by default in the session profile (Spark 4 default); the
    thresholds are lowered here only because the fixture scan is far
    below the 10 GB application-side default that gates it in
    production — the point is that the default profile needs NO code
    changes to benefit at 100 TB."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ) == "true"  # session-profile default, not set by this test
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        p = _formatted_plan(j)
        assert "bloom_filter_agg" in p, p
        # and pruning cannot change results
        n_filtered = j.agg(F.sum("count")).collect()[0][0]
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        j2 = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        assert j2.agg(F.sum("count")).collect()[0][0] == n_filtered
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        for k, v in old.items():
            spark.conf.set(k, v)


def test_r7_ops_plan_shapes(spark, sf_dir):
    """Round-7 operators keep the plan shapes their docstrings claim."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    # prefix-filtered jaccard: everything is keyed equi-work — no
    # cartesian/nested-loop anywhere despite being an all-pairs join
    p = _formatted_plan(QUERIES["dedup_prefix_jaccard"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p

    # gopher rules: one explode + ONE doc_id-keyed aggregate — a
    # single exchange below the scan. Count tree nodes ("Exchange (n)")
    # not raw mentions: formatted explain prints each node twice.
    p = _formatted_plan(QUERIES["curate_gopher_rules"].fn(spark, sf_dir))
    n_exchanges = p.count("Exchange (") - p.count("ReusedExchange (")
    assert n_exchanges == 1, p

    # edit-distance join: deletion-neighborhood equi-join, never a
    # cartesian product of the string domain
    p = _formatted_plan(
        QUERIES["dedup_edit_distance_sources"].fn(spark, sf_dir)
    )
    assert "CartesianProduct" not in p, p

    # heavy quantiles: the range exchange (RangePartitioning) must be
    # the rank's only corpus-scale shuffle; the offset table joins as
    # a broadcast
    df = QUERIES["events_value_quantiles_heavy"].fn(spark, sf_dir)
    p = _formatted_plan(df)
    assert "BroadcastHashJoin" in p, p


def test_prefix_jaccard_grid_verification_shape(spark, sf_dir):
    """The fragment-replicate grid verifier must not re-shuffle the
    pair+fingerprint-array intermediate: in the FINAL adaptive plan the
    two grid joins run on the single cell-keyed exchange (subset
    co-partitioning), so no executed Exchange is hash-partitioned on
    the full (cell, id) key pair. The conservative pre-AQE initial
    plan DOES contain such exchanges — runtime stage planning elides
    them — hence the assertion runs on the post-collect executed plan,
    final section only."""
    import re

    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    df = QUERIES["dedup_prefix_jaccard"].fn(spark, sf_dir)
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    final = full.split("== Initial Plan ==")[0]
    stripped = re.sub(r"#\d+L?", "", final)
    assert "ShuffledHashJoin [cell, id_x]" in stripped, stripped[:4000]
    assert "ShuffledHashJoin [cell, id_y]" in stripped, stripped[:4000]
    assert "Exchange hashpartitioning(cell, id_x" not in stripped, stripped
    assert "Exchange hashpartitioning(cell, id_y" not in stripped, stripped


def test_r7b_ops_plan_shapes(spark, sf_dir):
    import re

    """The second r7 cohort keeps the plan shapes its docstrings claim."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    # SCD2: the whole query rides ONE user_id-keyed exchange — the lag
    # window, the running-sum window, the (user, version) collapse and
    # the lead stitch all accept HashPartitioning(user_id).
    p = _formatted_plan(QUERIES["events_scd2_event_type"].fn(spark, sf_dir))
    n_exchanges = p.count("Exchange (") - p.count("ReusedExchange (")
    assert n_exchanges == 1, p
    assert p.count("Scan parquet") == 2, p  # formatted prints tree+detail

    # DSIR: the bucket table (<= 4096 rows) broadcasts back onto the
    # per-doc-bucket stream — the scoring join must never shuffle; the
    # corpus-side frame is pinned so the scan/explode runs once.
    p = _formatted_plan(QUERIES["curate_dsir_weights"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    # one parquet scan node (detail-section header), however many
    # times the shared InMemoryRelation subtree gets re-printed
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "InMemoryTableScan" in p, p

    # span coverage: both gram consumers (df count + annotation join)
    # read the SAME pinned gram exchange — subtrees are canonically
    # identical (explicit isnotnull matches the join's null filter),
    # so reuse is available statically and AQE merges the stages at
    # runtime. No cartesian anywhere.
    df = QUERIES["dedup_ngram_span_coverage"].fn(spark, sf_dir)
    p = _formatted_plan(df)
    assert "CartesianProduct" not in p, p
    df.collect()
    rt = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in rt, rt


def test_r7c_ops_plan_shapes(spark, sf_dir):
    """Third r7 cohort: plan shapes per docstring."""
    import re

    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    # weighted ticket sampling: NO exchange at all — narrow map +
    # TakeOrderedAndProject (per-partition top-k, driver merge)
    p = _formatted_plan(QUERIES["sample_weighted_tickets"].fn(spark, sf_dir))
    assert p.count("Exchange (") == 0, p
    assert "TakeOrderedAndProject" in p, p

    # markov transitions: one user-keyed window exchange + the k x k
    # count agg + the marginal window — 3 exchanges, ONE corpus scan
    # (the marginal is a window over the count frame, not a re-agg)
    p = _formatted_plan(
        QUERIES["events_markov_transitions"].fn(spark, sf_dir)
    )
    assert p.count("Exchange (") - p.count("ReusedExchange (") == 3, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p

    # collocation lift: top-k must be TakeOrderedAndProject (no global
    # sort), marginals join by shuffle (vocabulary-scale — never
    # broadcast), corpus scanned once through the pinned count frame
    p = _formatted_plan(QUERIES["text_collocation_lift"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p

    # CDC chunking: no cartesian; chunk stream reuses one pinned
    # fp exchange at runtime (same shape as span coverage)
    df = QUERIES["multimodal_cdc_chunks"].fn(spark, sf_dir)
    p = _formatted_plan(df)
    assert "CartesianProduct" not in p, p
    df.collect()
    rt = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in rt, rt


def test_r7d_ops_plan_shapes(spark, sf_dir):
    """Fourth r7 cohort: plan shapes per docstring."""
    import re

    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    # bottom-k quantile sketch: the sample selection must be a
    # TakeOrderedAndProject with ZERO exchanges — the corpus is never
    # shuffled; only the 512-row sample ranks in a bounded window
    p = _formatted_plan(
        QUERIES["events_quantile_sketch_bottomk"].fn(spark, sf_dir)
    )
    assert p.count("Exchange (") == 0, p
    assert "TakeOrderedAndProject" in p, p

    # KMV: one distinct exchange + the k-truncation TakeOrdered
    p = _formatted_plan(QUERIES["sketch_kmv_distinct_users"].fn(spark, sf_dir))
    assert p.count("Exchange (") - p.count("ReusedExchange (") == 1, p
    assert "TakeOrderedAndProject" in p, p

    # interval-overlap join: the busy-hour side broadcasts (calendar-
    # bounded), the session side explodes to hour buckets — never a
    # cartesian or theta join; events scanned once per interval side
    p = _formatted_plan(QUERIES["join_interval_busy_hours"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p


def test_r7e_ops_plan_shapes(spark, sf_dir):
    """Fifth r7 cohort: plan shapes per docstring."""
    import re

    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()

    # BM25: top-10 must be TakeOrderedAndProject (never a global
    # window over the scored corpus); df/stats ride broadcasts; no
    # cartesian-shaped fallback
    p = _formatted_plan(QUERIES["text_bm25_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastExchange" in p, p

    # TWAP: ONE user-keyed exchange carries window + aggregate
    p = _formatted_plan(
        QUERIES["events_time_weighted_avg"].fn(spark, sf_dir)
    )
    assert p.count("Exchange (") - p.count("ReusedExchange (") == 1, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p

    # KMV setops: both sketches are distinct + TakeOrdered; all
    # post-sketch work is broadcast-sized — no corpus-scale sort
    p = _formatted_plan(QUERIES["sketch_kmv_setops"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p

    # salted skew join: the equi-join must carry BOTH keys (user and
    # salt) so hot keys split across tasks, and must stay a hash join
    p = _formatted_plan(QUERIES["join_salted_skew"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    m = re.search(r"Left keys \[2\]: \[([^\]]*)\]", p)
    assert m and "salt" in m.group(1) and "user_id" in m.group(1), p


def test_salted_skew_query_equals_plain_join(spark, sf_dir):
    """The salted CATALOG query's per-segment rollup must equal the
    unsalted join's — salting redistributes work, never changes the
    result. (r8 rename: this previously shadowed the line-25 operator
    test of the same name, leaving salted_join's lineitem/orders
    equivalence check silently dead.)"""
    from pyspark.sql import functions as F

    from cc2dataset_spark.plans.catalog import QUERIES, _load_all
    from cc2dataset_spark.sources.tables import load_table

    _load_all()
    got = {
        (r.segment, r.n_events, r.n_users)
        for r in QUERIES["join_salted_skew"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    plain = (
        e.join(c, e["user_id"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    want = {(r.segment, r.n_events, r.n_users) for r in plain.collect()}
    assert got == want and got


def test_salted_join_rejects_right_and_full(spark):
    """right/full outer would emit unmatched right rows S times."""
    import pytest as _pytest

    from cc2dataset_spark.operators.joins import salted_join

    l = spark.createDataFrame([(1, "x")], ["k", "a"])
    r = spark.createDataFrame([(2, "y")], ["k", "b"])
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError, match="duplicate"):
            salted_join(l, r, "k", how=how)
    # supported hows still produce plain-join results
    got = salted_join(l, r, "k", how="left").collect()
    assert len(got) == 1 and got[0].b is None


def test_paragraph_dedup_plan_shape(spark, sf_dir):
    """curate_dedup_paragraphs: first-occurrence is a partial-
    aggregating groupBy (skew-safe on hot boilerplate paragraphs —
    never a ROW_NUMBER window over para, which would funnel every
    copy of a hot paragraph through one reducer), and the join back
    is PINNED shuffle-hash (both sides corpus-scale; an AQE broadcast
    of the distinct-paragraph frame is the measured default-heap OOM
    hazard). No window operator in the plan at all."""
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    p = _formatted_plan(QUERIES["curate_dedup_paragraphs"].fn(spark, sf_dir))
    assert "Window" not in p, p
    assert "ShuffledHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
