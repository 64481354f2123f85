"""The linear-state as-of join must agree exactly with the
candidate-join + max_by formulation (same semantics, different scale
envelope)."""

from pyspark.sql import functions as F

from cc2dataset_spark.operators.asof import asof_join_union
from cc2dataset_spark.plans.catalog import QUERIES, _load_all
from cc2dataset_spark.sources.tables import load_table

_load_all()


def test_asof_union_equals_maxby(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    got = asof_join_union(
        events.select("event_id", "user_id", "ts"),
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_orderdate"],
        right_tiebreak="o_orderkey",
        how="inner",
    ).select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )
    want = QUERIES["join_asof_last_order"].fn(spark, sf_dir)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_asof_left_keeps_unmatched(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # restrict right side so some users have no orders at all
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    out = asof_join_union(
        events.select("event_id", "user_id", "ts"),
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey"],
        right_tiebreak="o_orderkey",
        how="left",
    )
    assert out.count() == events.count()
    assert out.where(F.col("o_orderkey").isNull()).count() > 0


def test_stream_static_enrichment(spark, sf_dir):
    """Stream-static join: streaming events enriched with the customer
    dimension (the standard streaming lookup-join)."""
    from cc2dataset_spark.streaming.windows import read_events_stream

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = read_events_stream(spark, sf_dir).join(F.broadcast(cust), "user_id")
    q = (
        stream.select("event_id", "user_id", "c_mktsegment")
        .writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n FROM t_enriched").first().n
    want = (
        load_table(spark, sf_dir, "events").join(cust, "user_id").count()
    )
    assert got == want
