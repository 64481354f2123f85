"""Contracts for the approximate/probabilistic queries that the oracle
can't check."""

from pyspark.sql import functions as F

from cc2dataset_spark.plans.catalog import QUERIES, _load_all

_load_all()


def test_approx_distinct_error_bound(spark, sf_dir):
    """The tight HLL contract (the registered query only asserts a 10%
    band the oracle can check): the 2%-rsd sketch stays within 10% of
    exact, and the registered query's boolean is True everywhere."""
    rows = QUERIES["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.hll_within_10pct for r in rows)

    from cc2dataset_spark.sources.tables import load_table

    raw = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .collect()
    )
    for r in raw:
        rel_err = abs(r.approx_parts - r.exact_parts) / r.exact_parts
        assert rel_err < 0.1, f"{r.l_returnflag}: rel err {rel_err:.3f}"


def test_udaf_trend_matches_sql_regr(spark, sf_dir):
    """applyInPandas slope agrees with Spark's own regr_slope to 1e-6
    (independent of the DuckDB oracle)."""
    got = {
        r.user_id: r.daily_trend
        for r in QUERIES["udaf_user_trend"].fn(spark, sf_dir).collect()
    }
    from cc2dataset_spark.sources.tables import load_table

    want = {
        r.user_id: r.s
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "round(regr_slope(value, unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000.0), 4)"
            ).alias("s")
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid in got:
        assert abs(got[uid] - want[uid]) <= 1e-6, uid
