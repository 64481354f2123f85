"""Relational operator surface (SURVEY.md §2.3-§2.8 EXT rows).

Each query is a (DataFrame plan, DuckDB oracle SQL) pair. Scale notes:

- Fact-side tables (lineitem, orders, events) are only ever filtered,
  aggregated with map-side partial aggregation, or joined on their keys;
  dimension tables are explicitly broadcast (`F.broadcast`) so no fact
  shuffle happens for dim joins at 100 TB.
- Fractional aggregates sum over DECIMAL (exact, associative) and only
  cast to DOUBLE at the end, so Spark's partial-agg ordering can never
  drift from the oracle's sequential sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cc2dataset_spark.functions.datetime_ntz import trunc_day_ntz
from cc2dataset_spark.operators.asof import asof_join_union
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col, scale: int = 6):
    """Exact sum: accumulate in DECIMAL(28,scale), emit DOUBLE."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


def _osum(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


# --------------------------------------------------------------------------
# Aggregations (A3) — grouped aggs with partial map-side combine
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity')} AS sum_qty,
           {_osum('l_extendedprice')} AS sum_base_price,
           {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_osum('l_quantity')} / COUNT(*) AS avg_qty,
           {_osum('l_extendedprice')} / COUNT(*) AS avg_price,
           {_osum('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan -> filter -> partial+final
    hash agg. The filter and the 7-column projection both reach the
    parquet scan (PushedFilters / ReadSchema)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count(distinct) in one agg (Catalyst plans an expand +
    two-phase agg)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "agg_minmax_by",
    oracle="""
    WITH agg AS (
      SELECT o_orderpriority,
             MAX(o_totalprice) AS max_price,
             MIN(o_totalprice) AS min_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT a.o_orderpriority, a.max_price, a.min_price,
           (SELECT MAX(o_orderkey) FROM orders o
             WHERE o.o_orderpriority = a.o_orderpriority
               AND o.o_totalprice = a.max_price) AS max_price_orderkey,
           (SELECT MAX(o_orderkey) FROM orders o
             WHERE o.o_orderpriority = a.o_orderpriority
               AND o.o_totalprice = a.min_price) AS min_price_orderkey
    FROM agg a
    """,
    tags=("agg",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a struct tie-break so survivors are
    deterministic under any partitioning."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("max_price_orderkey"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("min_price_orderkey"),
    )


@query(
    "rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-level aggregate (A4)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@query(
    "cube_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (A4)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Joins (§2.3)
# --------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS o_key,
           {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_key ASC
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter -> broadcast join into the
    fact table -> agg -> TakeOrderedAndProject top-k (no global sort)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    # customer is the broadcast DIM; the orders(x)customer result is
    # FACT-scale (the date filter keeps most orders) and must SHUFFLE
    # into the lineitem join — broadcasting it, as r1-r7 did, would
    # materialize ~20% of the orders table as a broadcast relation at
    # 100 TB (8 GB hard cap / driver OOM), violating the module
    # header's fact-never-broadcast contract.
    joined = li.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy(
            F.col("l_orderkey").alias("o_key"), "o_orderdate", "o_orderpriority"
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("o_key", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_key").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    tags=("join", "agg", "tpch"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table join. All dims broadcast; the only
    shuffle-heavy join is lineitem<->orders on orderkey."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    joined = (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == F.col("s_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "join_broadcast_geo",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "agg"),
)
def join_broadcast_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema broadcast-hash-join chain: zero shuffles on the fact
    side until the final agg."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
    tags=("join", "semi"),
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_no_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
    )
    """,
    tags=("join", "anti"),
)
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no large order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_outer_order_counts",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))), 0) AS DOUBLE)
             AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer", "agg"),
)
def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "join_range_shipments",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(*) AS n_quick_items
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
    tags=("join", "range"),
)
def join_range_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: the equi key carries the shuffle, the range
    predicate is evaluated post-probe (no nested-loop blowup)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(li, cond).groupBy("o_orderkey").agg(F.count("*").alias("n_quick_items"))
    )


@query(
    "join_asof_last_order",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           o_orderdate AS last_orderdate
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark primitive, SURVEY §2.3): for each
    event, the latest order of the same user at or before the event
    time. Composite: shuffle theta-join candidates then max_by per
    event. The candidate set is every earlier order of the user, so the
    cost is quadratic within hot keys — fine here, but the 100 TB shape
    is the linear union+window form (join_asof_union_last_order /
    operators/asof.py)."""
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    cand = e.join(
        o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts), "inner"
    )
    return (
        cand.groupBy("event_id", "user_id")
        .agg(
            F.expr(
                "max_by(o_orderkey, struct(o_orderdate, o_orderkey))"
            ).alias("last_orderkey"),
            F.max("o_orderdate").alias("last_orderdate"),
        )
        .select("event_id", "user_id", "last_orderkey", "last_orderdate")
    )


@query(
    "join_asof_union_last_order",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           o_orderdate AS last_orderdate
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof_union_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LINEAR as-of join (operators/asof.asof_join_union): tag +
    union + one partitioned window with last(ignorenulls). One shuffle
    on the key, one sort per partition, cost independent of per-key
    history length — the 100 TB registered shape, same oracle as the
    candidate+max_by variant. Deterministic ties via o_orderkey."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = asof_join_union(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_orderdate"],
        right_tiebreak="o_orderkey",
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


@query(
    "join_asof_forward_next_order",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey ASC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
           o_orderdate AS next_orderdate
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof", "forward"),
)
def join_asof_forward_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of (pandas merge_asof direction='forward' parity):
    for each event, the user's NEXT order at or after the event time.
    Same linear union+window machinery as the backward form — one
    shuffle on the key, first(ignorenulls) over the following frame —
    with the mirror-image tie rule (smallest o_orderkey)."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = asof_join_union(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_orderdate"],
        right_tiebreak="o_orderkey",
        how="inner",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"),
    )


@query(
    "join_asof_nearest_order",
    oracle="""
    WITH b AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY e.event_id
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
      ) = 1
    ), f AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate > e.ts
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY e.event_id
        ORDER BY o.o_orderdate ASC, o.o_orderkey ASC
      ) = 1
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN b.o_orderdate IS NOT NULL
                     AND (f.o_orderdate IS NULL
                          OR e.ts - b.o_orderdate <= f.o_orderdate - e.ts)
                THEN b.o_orderkey ELSE f.o_orderkey END AS near_orderkey,
           CASE WHEN b.o_orderdate IS NOT NULL
                     AND (f.o_orderdate IS NULL
                          OR e.ts - b.o_orderdate <= f.o_orderdate - e.ts)
                THEN b.o_orderdate ELSE f.o_orderdate END AS near_orderdate
    FROM events e
    LEFT JOIN b ON b.event_id = e.event_id
    LEFT JOIN f ON f.event_id = e.event_id
    WHERE b.o_orderdate IS NOT NULL OR f.o_orderdate IS NOT NULL
    """,
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (pandas merge_asof direction='nearest' parity):
    for each event, the user's closest order in time — exact matches
    win at distance zero and equidistant candidates resolve BACKWARD.
    Both candidate legs ride one exchange+sort (same partitioning and
    ordering, different frames), then a per-row interval comparison
    picks the closer side."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = asof_join_union(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_orderdate"],
        right_tiebreak="o_orderkey",
        how="inner",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("near_orderkey"),
        F.col("o_orderdate").alias("near_orderdate"),
    )


@query(
    "subquery_in_negative_balance",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
    tags=("join", "subquery"),
)
def subquery_in_negative_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as left-semi)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0)
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# --------------------------------------------------------------------------
# Windows (§2.5)
# --------------------------------------------------------------------------


@query(
    "window_topk_orders_per_cust",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rank_in_cust
      FROM orders
    )
    WHERE rank_in_cust <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via row_number with a full deterministic
    tie-break. Catalyst pushes the rank filter into the window sort
    (WindowGroupLimit) so each partition only keeps 3 rows."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rank_in_cust"),
        )
        .where(F.col("rank_in_cust") <= 3)
    )


@query(
    "window_running_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS seq_no
    FROM events
    """,
    tags=("window",),
)
def window_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user, exact decimal accumulation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("seq_no"),
    )


@query(
    "window_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_event_type
    FROM events
    """,
    tags=("window", "analytic"),
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: microsecond gap to the previous event and the
    next event type per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ->LTZ at UTC
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK() OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           NTILE(4) OVER w AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "rank"),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one shared window spec."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6)
# --------------------------------------------------------------------------


@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "topk"),
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (per-partition
    heap + driver merge) — never a full sort at scale."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------


@query(
    "setop_nation_coverage",
    oracle="""
    SELECT n_nationkey, 'both' AS side
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          INTERSECT
          SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT n_nationkey, 'customer_only' AS side
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          EXCEPT
          SELECT DISTINCT s_nationkey FROM supplier)
    """,
    tags=("setop",),
)
def setop_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union all in one plan."""
    c = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("n_nationkey"))
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = c.intersect(s).withColumn("side", F.lit("both"))
    cust_only = c.exceptAll(s).withColumn("side", F.lit("customer_only"))
    return both.unionByName(cust_only)


@query(
    "setop_union_distinct_keys",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    tags=("setop",),
)
def setop_union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + hash-distinct."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --------------------------------------------------------------------------
# Scalar functions (§2.8): string / date / math / json
# --------------------------------------------------------------------------


@query(
    "scalar_json_dates",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(hour(ts) AS INT) AS hr,
           upper(event_type) AS event_type_uc,
           CAST(round(value, 4) AS DOUBLE) AS value_r4,
           length(props) AS props_len
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    tags=("scalar", "json", "date"),
)
def scalar_json_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (events.props is a JSON string), date_trunc/hour,
    string and math scalars — all JVM built-ins, zero Python."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.where(k.isNotNull()).select(
        "event_id",
        k.cast("bigint").alias("prop_k"),
        trunc_day_ntz("ts").alias("day"),
        F.hour("ts").cast("int").alias("hr"),
        F.upper("event_type").alias("event_type_uc"),
        F.round(F.col("value"), 4).cast("double").alias("value_r4"),
        F.length("props").alias("props_len"),
    )


@query(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substr(p_name, 1, 10) AS name_prefix,
           length(p_name) AS name_len,
           len(string_split(p_type, ' ')) AS type_words,
           string_split(p_type, ' ')[-1] AS type_last_word,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           CASE WHEN p_retailprice > 1500 THEN 'premium' ELSE 'standard' END
             AS price_tier
    FROM part
    WHERE p_name LIKE '%a%'
    """,
    tags=("scalar", "string"),
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar corpus: upper/substr/length/split/element_at/concat
    + LIKE pushdown + CASE WHEN."""
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.where(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.size(words).alias("type_words"),
        F.element_at(words, -1).alias("type_last_word"),
        F.concat_ws("#", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.when(F.col("p_retailprice") > 1500, "premium")
        .otherwise("standard")
        .alias("price_tier"),
    )


@query(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount), 4) AS DOUBLE)
             AS net_price,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
           abs(l_discount - 0.05) > 0.03 AS unusual_discount,
           CAST(power(CAST(l_quantity AS DOUBLE), 2) AS DOUBLE) AS qty_sq,
           greatest(l_tax, l_discount) AS max_rate
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    tags=("scalar", "math"),
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar corpus: round/floor/abs/power/greatest."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        .cast("double")
        .alias("net_price"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_decile"),
        (F.abs(F.col("l_discount") - 0.05) > 0.03).alias("unusual_discount"),
        F.pow(F.col("l_quantity").cast("double"), 2).cast("double").alias("qty_sq"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
    )


# --------------------------------------------------------------------------
# Filters / projections exercised standalone (P-ops as relational queries)
# --------------------------------------------------------------------------


@query(
    "filter_pushdown_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("filter",),
)
def filter_pushdown_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates + BETWEEN; all three reach the parquet
    scan as PushedFilters."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(100000, 200000)
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")
