"""Relational surface, part 3: harder TPC-H-style composites —
distribution-of-distributions (Q13), HAVING-subquery top spenders
(Q18), and min-per-group lookup (Q2 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.plans.relational import dsum
from cc2dataset_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("agg", "join", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join with a join-side predicate, then a
    distribution over the per-customer counts (two aggregations, the
    second over a tiny domain — map-side combined)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("agg", "join", "subquery", "tpch"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered IN subquery (planned as a
    semi-join against the pre-aggregated lineitem) feeding a 3-table
    join + final aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
    )


@query(
    "setop_multiset_suppliers",
    oracle="""
    SELECT l_suppkey FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    )
    """,
    tags=("setop", "multiset"),
)
def setop_multiset_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — multiplicities preserved),
    U2's duplicate-aware variant."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.where(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.exceptAll(a)


@query(
    "explode_outer_long_words",
    oracle="""
    SELECT p_partkey, UNNEST(
             CASE WHEN len(w) = 0 THEN [NULL] ELSE w END
           ) AS long_word
    FROM (
      SELECT p_partkey,
             list_filter(string_split(p_name, ' '), x -> length(x) > 7) AS w
      FROM part
    )
    """,
    tags=("scalar", "explode"),
)
def explode_outer_long_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows whose array is empty survive with a null
    (the left-join flavor of the 1->N expansion)."""
    p = _t(spark, sf_dir, "part")
    w = F.filter(F.split("p_name", " "), lambda x: F.length(x) > 7)
    return p.select(
        "p_partkey", F.explode_outer(w).alias("long_word")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l WHERE l.l_quantity > 0
      GROUP BY l.l_partkey, l.l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey,
           MIN(c.l_suppkey) AS best_suppkey,
           -- NO round: the unit costs are bit-identical doubles in both
           -- engines (one IEEE division + MIN), and round-6 DIVERGES on
           -- them — Spark rounds the shortest decimal repr (BigDecimal)
           -- while DuckDB rounds the binary value; a "...5625"-repr cost
           -- flipped the last digit at sf0.1.
           b.best_cost
    FROM costs c JOIN best b
      ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    GROUP BY c.l_partkey, b.best_cost
    """,
    tags=("agg", "join", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum lookup (agg -> self-join on
    the min), with a deterministic supplier tie-break."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost")).select(
        F.col("l_partkey").alias("b_partkey"), "best_cost"
    )
    return (
        costs.join(
            best,
            (costs.l_partkey == F.col("b_partkey"))
            & (costs.unit_cost == F.col("best_cost")),
        )
        .groupBy(F.col("l_partkey").alias("partkey"), "best_cost")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .select(
            "partkey",
            "best_suppkey",
            # no round — see the oracle comment: rounding identical
            # binary doubles is what DIVERGES between engines here
            "best_cost",
        )
    )


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery", "exists"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS (the remaining subquery form
    next to IN and correlated-scalar); the fixture lacks
    commit/receipt dates, so "late" = shipped more than 60 days after
    the order date. Planned as a left-semi join whose condition
    carries the correlated date predicate — only the equi key
    shuffles; no decorrelation subquery machinery needed."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "window_percent_cume",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "distribution"),
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist /
    ntile) — the §2.5 rows not yet exercised; deterministic order via
    the (o_totalprice, o_orderkey) tie-break."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "tpch", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate (range on
    shipdate, band on discount, bound on quantity) reaches the parquet
    scan as a pushed filter, and only 4 columns are read. The canonical
    'is pushdown working' probe."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    tags=("join", "agg", "tpch", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost (returned) revenue in a
    quarter. Fact-fact join shuffles on the keys; nation is broadcast;
    the final top-20 plans as TakeOrderedAndProject (no global sort).
    Revenue is decimal-exact, so the cross-engine ordering (and the
    LIMIT boundary) is deterministic with the c_custkey tie-break."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q14_promo_effect",
    oracle="""
    -- raw double, no round(): both engines sum the same decimal-exact
    -- values and run identical IEEE multiply/divide, so the unrounded
    -- result is bit-equal by construction; round(double, 6) would ADD
    -- the Spark-shortest-repr vs DuckDB-binary half-boundary flip
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE)
             AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg", "tpch", "broadcast"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship-month. The part
    dimension is broadcast (no shuffle of the filtered fact side); both
    aggregate legs accumulate in DECIMAL so the final double division
    is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (100.0 * dsum(promo) / dsum(disc_price)).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "tpch", "disjunction"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst splits the disjunction: the single-side conjuncts common
    to every branch (none here) push to the scans, the cross-side
    residue evaluates post-join — and the part side still broadcasts,
    so the disjunction never forces a shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        lambda brand, max_size, qlo, qhi: (F.col("p_brand") == brand)
        & F.col("p_size").between(1, max_size)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        j.where(
            branch("Brand#12", 15, 1, 11)
            | branch("Brand#23", 25, 10, 20)
            | branch("Brand#34", 35, 20, 30)
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q22_dormant_rich_customers",
    oracle="""
    WITH threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
             AS totacctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
    tags=("agg", "subquery", "anti", "tpch"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-global-average balances with no RECENT
    orders — a scalar aggregate subquery (broadcast as a 1-row literal
    join by Catalyst) feeding a left-anti join, then a tiny-domain
    group-by. Dormancy is "no order since 1999" because the fixture has
    no fully order-less customers, which would make the classic form a
    0-row (evidence-free) check. The threshold divides an exact decimal
    sum by an exact count, so the comparison boundary is bit-identical
    across engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg((dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )
