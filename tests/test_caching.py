"""Cache bookkeeping: tracked persists drain between catalog queries.

The r6 ADVICE finding: rank/minhash/tier intermediates stayed
MEMORY_AND_DISK for the life of a bench or driver session because the
release protocol was an ad-hoc DataFrame attribute nobody called.
These tests pin the replacement (cc2dataset_spark/caching.py): every
persist-site registers centrally, and building the NEXT catalog query
releases the previous query's caches.
"""

from pyspark.sql import functions as F

from cc2dataset_spark import caching


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_track_and_release_all(spark):
    df = spark.range(100).persist()
    caching.track(df)
    df.count()
    assert caching.tracked_count() == 1
    caching.release_all()
    assert caching.tracked_count() == 0
    assert df.storageLevel.useMemory is False


def test_query_build_releases_previous_caches(spark, sf_dir):
    """Two ranked queries back-to-back: building the second must
    release the first's pinned range/score caches, and the session
    must not accumulate entries across the pair."""
    from cc2dataset_spark.plans.catalog import queries

    caching.release_all()
    q = queries()
    base = _n_cached(spark)
    q["curate_quality_tiers"](spark, sf_dir).count()
    assert caching.tracked_count() > 0  # pins registered
    q["dedup_sorted_neighborhood"](spark, sf_dir).count()
    caching.release_all()
    assert _n_cached(spark) == base


def test_minhash_shingle_cache_released_between_queries(spark, sf_dir):
    from cc2dataset_spark.plans.catalog import queries

    caching.release_all()
    q = queries()
    base = _n_cached(spark)
    q["dedup_minhash_neardup"](spark, sf_dir).count()
    assert caching.tracked_count() == 1
    # next build drains it via the @query wrapper
    q["text_token_stats"](spark, sf_dir).count()
    assert _n_cached(spark) == base


def test_spread_small_input_is_noop_on_wide_input(spark):
    from cc2dataset_spark.operators.partitioning import spread_small_input

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 4)
    assert spread_small_input(wide) is wide
    narrow = spark.range(1000).coalesce(1)
    spread = spread_small_input(narrow)
    assert spread.rdd.getNumPartitions() == target
    # row-preserving
    assert spread.count() == 1000
    assert set(r.id for r in spread.collect()) == set(range(1000))
