"""global_row_number: the two-pass range-partitioned global rank must
equal the single-partition window it replaces, across partition counts
and under skew."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from cc2dataset_spark.operators.rank import global_row_number


def _reference(rows):
    # total order: (value, id)
    return {
        rid: i + 1
        for i, (v, rid) in enumerate(
            sorted((v, rid) for rid, v in rows)
        )
    }


def test_matches_unpartitioned_window(spark, sf_dir):
    from cc2dataset_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    got = global_row_number(
        o, ["o_totalprice", "o_orderkey"], num_partitions=7
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = o.withColumn("global_rn", F.row_number().over(w).cast("bigint"))
    assert {(r.o_orderkey, r.global_rn) for r in got.collect()} == {
        (r.o_orderkey, r.global_rn) for r in want.collect()
    }


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    parts=st.integers(1, 9),
)
@pytest.mark.slow
def test_matches_python_reference(spark, rows, parts):
    df = spark.createDataFrame(rows, ["rid", "v"])
    got = {
        r.rid: r.global_rn
        for r in global_row_number(
            df, ["v", "rid"], num_partitions=parts
        ).collect()
    }
    assert got == _reference(rows)


def test_skewed_keys_stay_correct(spark):
    # 90% identical sort keys; the unique tiebreak keeps the order total
    rows = [(i, 1 if i < 90 else i) for i in range(100)]
    df = spark.createDataFrame(rows, ["rid", "v"])
    got = {
        r.rid: r.global_rn
        for r in global_row_number(df, ["v", "rid"], num_partitions=5).collect()
    }
    assert got == _reference(rows)
    assert sorted(got.values()) == list(range(1, 101))


def test_release_unpins_internal_cache(spark):
    """.unpersist() on the returned frame is a no-op on the internal
    range-pinned intermediate; rank.release() must actually free it."""
    from cc2dataset_spark.operators.rank import release

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([(i, i % 7) for i in range(50)], ["rid", "v"])
    out = global_row_number(df, ["v", "rid"], num_partitions=4)
    out.collect()
    assert jsc.getPersistentRDDs().size() == base + 1
    release(out)
    assert jsc.getPersistentRDDs().size() == base


def _keyed_reference(rows):
    """(rid, key, v) -> rid: (rn within key by (v, rid), key total)."""
    out = {}
    keys = {k for _, k, _ in rows}
    for k in keys:
        grp = sorted(
            [(v, rid) for rid, kk, v in rows if kk == k]
        )
        for i, (_, rid) in enumerate(grp, 1):
            out[rid] = (i, len(grp))
    return out


def test_keyed_row_number_matches_python_reference(spark):
    from cc2dataset_spark.operators.rank import keyed_row_number

    rows = [(i, f"k{i % 3}", (i * 37) % 50) for i in range(120)]
    df = spark.createDataFrame(rows, ["rid", "key", "v"])
    got = {
        r.rid: (r.rn, r.n)
        for r in keyed_row_number(
            df, ["key"], ["v", "rid"], count_col="n", num_partitions=7
        ).collect()
    }
    assert got == _keyed_reference(rows)


def test_keyed_row_number_hot_key_spans_partitions(spark):
    """One key holds 95% of the rows: the range partitioner must split
    it across partitions (no single-task funnel) and the prefix-sum
    must still assemble exact per-key ranks."""
    from cc2dataset_spark.operators.rank import keyed_row_number

    rows = [(i, "hot" if i < 950 else f"c{i % 13}", (i * 17) % 200)
            for i in range(1000)]
    df = spark.createDataFrame(rows, ["rid", "key", "v"])
    ranked = keyed_row_number(
        df, ["key"], ["v", "rid"], count_col="n", num_partitions=8
    )
    got = {r.rid: (r.rn, r.n) for r in ranked.collect()}
    assert got == _keyed_reference(rows)
    # the hot key must actually occupy >1 range partition
    spread = (
        df.repartitionByRange(8, "key", "v", "rid")
        .where(F.col("key") == "hot")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert spread > 1


def test_quantile_twins_agree(spark, sf_dir):
    """events_value_quantiles (window plan) and _heavy (keyed-rank
    plan) must be row-identical — same oracle, different physical
    strategy."""
    from cc2dataset_spark.plans.catalog import queries

    q = queries()
    a = sorted(
        tuple(r) for r in q["events_value_quantiles"](spark, sf_dir).collect()
    )
    b = sorted(
        tuple(r)
        for r in q["events_value_quantiles_heavy"](spark, sf_dir).collect()
    )
    assert a == b


def test_global_running_sum_matches_window(spark, sf_dir):
    from cc2dataset_spark.operators.rank import global_running_sum
    from cc2dataset_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("v")
    )
    got = global_running_sum(
        o, ["v", "o_orderkey"], "v", "cum", num_partitions=7
    )
    w = Window.orderBy("v", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = o.withColumn("cum", F.sum("v").over(w).cast("bigint"))
    assert {(r.o_orderkey, r.cum) for r in got.collect()} == {
        (r.o_orderkey, r.cum) for r in want.collect()
    }


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    parts=st.integers(1, 9),
)
@pytest.mark.slow
def test_global_running_sum_matches_python(spark, rows, parts):
    from cc2dataset_spark.operators.rank import global_running_sum

    df = spark.createDataFrame(rows, ["rid", "v"])
    got = {
        r.rid: r.cum
        for r in global_running_sum(
            df, ["v", "rid"], "v", "cum", num_partitions=parts
        ).collect()
    }
    acc, want = 0, {}
    for v, rid in sorted((v, rid) for rid, v in rows):
        acc += v
        want[rid] = acc
    assert got == want


def test_keyed_row_number_keeps_null_keys(spark):
    from cc2dataset_spark.operators.rank import keyed_row_number

    rows = [(1, "a", 10), (2, "a", 5), (3, None, 7), (4, None, 2), (5, "b", 9)]
    df = spark.createDataFrame(rows, ["rid", "k", "v"])
    got = {
        r.rid: (r.rn, r.kt)
        for r in keyed_row_number(
            df, ["k"], ["v", "rid"], "rn", "kt", num_partitions=3
        ).collect()
    }
    assert len(got) == 5  # NULL-key rows must NOT vanish
    assert got[4] == (1, 2) and got[3] == (2, 2)  # NULL group ranks
    assert got[2] == (1, 2) and got[1] == (2, 2)
    assert got[5] == (1, 1)


def test_keyed_row_number_high_cardinality_no_driver_collect(spark):
    """Per-user-style keys: cardinality comparable to the row count.
    The r7 implementation collect()ed one driver row per (partition,
    key) — a driver OOM at 10^8+ keys; the windowed-offsets rewrite
    must stay correct with #keys ~ #rows and agree with the plain
    PARTITION BY window twin value-for-value."""
    from pyspark.sql import Window as W

    from cc2dataset_spark.operators.rank import keyed_row_number

    n = 20_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % 6_000).alias("user_id"),  # ~6k distinct keys
            (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("v"),
        )
    )
    got = keyed_row_number(
        df, ["user_id"], ["v", "rid"], "rn", "kt", num_partitions=16
    )
    twin = df.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("user_id").orderBy("v", "rid")),
    ).withColumn(
        "kt",
        F.count("*").over(
            W.partitionBy("user_id").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ),
    )
    a = {(r.rid, r.rn, r.kt) for r in got.collect()}
    b = {(r.rid, r.rn, r.kt) for r in twin.collect()}
    assert a == b
