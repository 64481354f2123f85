"""Relational surface, part 2: grouping sets, pivot, full-outer/cross
joins, percentiles, histograms, range frames, date/regex scalar corpus,
array ops, filtered aggregation, approx-distinct, and a grouped-UDAF
(applyInPandas) operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.plans.relational import dsum
from cc2dataset_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "grouping_sets_geo",
    oracle="""
    SELECT n.n_name, c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
    """,
    tags=("agg", "grouping_sets"),
)
def grouping_sets_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (A4) — distinct aggregation levels in one pass."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n.n_name, c.c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
        """
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): explicit value list so the plan is a
    single pass with no value-discovery job."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@query(
    "join_full_outer_nation_roles",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_customers,
           COALESCE(s.n_supp, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
          FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                     FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two pre-aggregated sides."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = c.join(s, "nk", "full_outer")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
        F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "cross_join_region_matrix",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
    tags=("join", "cross"),
)
def cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (nested-loop) on tiny dims."""
    a = _t(spark, sf_dir, "region").alias("a")
    b = _t(spark, sf_dir, "region").alias("b")
    return (
        a.crossJoin(b)
        .where(F.col("a.r_regionkey") != F.col("b.r_regionkey"))
        .select(
            F.col("a.r_name").alias("from_region"),
            F.col("b.r_name").alias("to_region"),
        )
    )


@query(
    "agg_percentiles_price",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (RESIDUAL cross-engine risk,
    accepted: interpolation is lower + frac*(upper-lower) in both
    engines but an ulp of difference in frac arithmetic is possible,
    and the 4-dp round absorbs it except within an ulp of a 0.00005
    boundary — emitting raw would EXPOSE every ulp instead; green
    since r1 at three scales). Both engines use the standard
    linear-interpolation definition)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99_price"),
    )


@query(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-bucketing (the shuffle-free way
    to histogram 100 TB: map-side partials over ~20 buckets)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx_count_distinct, oracle-checked: the sketch
    estimate itself cannot hash-match another engine, so the query emits
    the exact count plus a generous error-bound predicate (HLL at 2% rsd
    vs a 10% band — deterministic for a fixed dataset). The tight
    relative-error contract is asserted in tests/test_relational2.py."""
    li = _t(spark, sf_dir, "lineitem")
    # Pre-distinct two-phase form instead of countDistinct aggregates:
    # multiple distinct aggs plan an Expand (row duplication per
    # distinct group); distinct() then plain count over the pair set is
    # ~2.7x faster at sf0.1 with identical results — HLL is duplicate-
    # insensitive, so sketching the distinct set gives the same
    # estimate.
    d = li.select("l_returnflag", "l_partkey").distinct()
    return d.groupBy("l_returnflag").agg(
        F.count("*").alias("exact_parts"),
        (
            F.abs(F.approx_count_distinct("l_partkey", 0.02) - F.count("*"))
            <= 0.1 * F.count("*")
        ).alias("hll_within_10pct"),
    )


@query(
    "window_range_frame_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_1h,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS n_1h
    FROM events
    """,
    tags=("window", "range_frame"),
)
def window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing-1-hour sum/count per user
    (value-based frame, not row-based)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@query(
    "scalar_date_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_days,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(dayofweek(l_shipdate) + 1 AS INT) AS ship_dow,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l_linenumber = 1 AND l_orderkey < 1000
    """,
    tags=("scalar", "date"),
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval scalar corpus over a keyed join."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 1000)
    )
    o = _t(spark, sf_dir, "orders")
    # broadcast the BOUNDED side: li is pre-filtered to < 1000 keys at
    # one line each, while orders is an unfiltered fact table that
    # grows with scale (the r1-r7 F.broadcast(o) shipped the whole
    # fact to every executor)
    j = F.broadcast(li).join(o, li.l_orderkey == o.o_orderkey)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("l_shipdate", "o_orderdate").cast("int").alias("ship_days"),
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.month("l_shipdate").cast("int").alias("ship_month"),
        F.dayofweek("l_shipdate").cast("int").alias("ship_dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@query(
    "scalar_regex_extract",
    oracle=r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_value,
           regexp_matches(event_type, '^(click|view)$') AS is_interaction,
           regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_devoweled
    FROM events
    """,
    tags=("scalar", "regex"),
)
def scalar_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar corpus (extract / match / replace)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint").alias("k_value"),
        F.col("event_type").rlike(r"^(click|view)$").alias("is_interaction"),
        F.regexp_replace("event_type", r"[aeiou]", "_").alias("type_devoweled"),
    )


@query(
    "array_ops_embeddings",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1:3][1] AS DOUBLE), 6) AS head_1,
           round(CAST(embedding[1:3][2] AS DOUBLE), 6) AS head_2,
           round(CAST(embedding[1:3][3] AS DOUBLE), 6) AS head_3,
           round(list_aggregate(embedding::DOUBLE[], 'sum'), 6) AS coord_sum,
           round(CAST(list_sort(embedding[1:4])[1] AS DOUBLE), 6) AS min_head4
    FROM embeddings
    WHERE vec_id < 100
    """,
    tags=("scalar", "array"),
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar corpus: size/slice/fold/sort over embeddings.

    Outputs are scalars only: the driver's canonicalizer sorts result
    columns with pandas, and raw array cells are unhashable there
    (CORRECTNESS_r01 'unhashable type: list') — so the slice is probed
    element-wise and every float is rounded before emission."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    emb_d = F.col("embedding").cast("array<double>")
    head3 = F.slice("embedding", 1, 3).cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(head3, 1), 6).alias("head_1"),
        F.round(F.element_at(head3, 2), 6).alias("head_2"),
        F.round(F.element_at(head3, 3), 6).alias("head_3"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("coord_sum"),
        F.round(
            F.array_min(F.slice("embedding", 1, 4)).cast("double"), 6
        ).alias("min_head4"),
    )


@query(
    "agg_filtered_conditional",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
           CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                              ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
             AS returned_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "conditional"),
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered / conditional aggregation (count FILTER, CASE-sum)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
        dsum(
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0)
        ).alias("returned_qty"),
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT AVG(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("join", "subquery"),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (SURVEY §4 'subquery decorrelation: built-in')."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 2 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    tags=("sample",),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample via content hash (S5 twin of
    df.sample: reproducible across engines AND runs, which seeded
    rand() is not)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_totalprice")


@query(
    "scalar_struct_map_ops",
    oracle="""
    SELECT event_id,
           struct_pack(t := event_type, h := hour(ts)).t AS type_from_struct,
           map {event_type: value}[event_type][1] AS value_from_map,
           CAST(cardinality(map {event_type: value}) AS INT) AS map_size
    FROM events WHERE event_id < 2000
    """,
    tags=("scalar", "struct", "map"),
)
def scalar_struct_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction + field/key access (complex types stay
    internal; outputs are scalars so the comparison is engine-neutral)."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    m = F.create_map(F.col("event_type"), F.col("value"))
    return e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("t"), F.hour("ts").alias("h")
        )["t"].alias("type_from_struct"),
        F.element_at(m, F.col("event_type")).alias("value_from_map"),
        F.size(m).alias("map_size"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "analytic"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value analytics (last over the full-partition
    frame — the default growing frame is a classic footgun)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nationkey
      FROM customer WHERE c_custkey < 200
    ) UNPIVOT (value FOR metric IN (acctbal, nationkey))
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long reshape)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot(
        "c_custkey", ["acctbal", "nationkey"], "metric", "value"
    )


@query(
    "udaf_user_trend",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
             AS daily_trend,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("udaf", "pandas"),
)
def udaf_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas (SURVEY §2.9): per-user OLS slope
    of value over time (units: value/day). Arrow-batched; one shuffle
    on user_id. The closure is self-contained (pickled by value).

    This query exists to demonstrate the UDAF surface; a production
    trend query should use the JVM-side built-in instead (codegen, no
    Python workers):

        e.groupBy("user_id").agg(
            F.round(F.regr_slope("value", F.col("us") / 86400000000.0), 4)
             .alias("daily_trend"), ...)

    tests/test_relational2.py asserts the two agree to 1e-6."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "value"
    )

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["us"].to_numpy(dtype="float64") / 86400000000.0
        y = pdf["value"].to_numpy(dtype="float64")
        xbar, ybar = x.mean(), y.mean()
        denom = ((x - xbar) ** 2).sum()
        s = float(((x - xbar) * (y - ybar)).sum() / denom) if denom else None
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "daily_trend": [None if s is None else round(s, 4)],
                "n_events": [len(pdf)],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        slope, "user_id bigint, daily_trend double, n_events bigint"
    )


@query(
    "agg_regr_trend",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
             AS daily_trend,
           round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 4)
             AS intercept,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "regression"),
)
def agg_regr_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-shape twin of udaf_user_trend: per-user OLS trend
    (RESIDUAL cross-engine risk, accepted: this query exists to
    exercise the BUILT-IN regr_* aggregates, whose single-pass update
    formulas differ per engine — the 4-dp round absorbs that drift
    everywhere except a slope within drift-distance of a 0.00005
    boundary; the drift-free formulation from exact moments is
    agg_corr_lineitem's, kept separate so the builtin surface stays
    covered)
    via the JVM built-in regr_slope/regr_intercept — whole-stage
    codegen, map-side partial aggregation, no Python workers. This is
    the form to use at 100 TB; the applyInPandas variant above exists to
    exercise the UDAF surface (parity asserted in
    tests/test_relational2.py)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86400000000.0).alias("d"),
        "value",
    )
    return e.groupBy("user_id").agg(
        F.round(F.regr_slope("value", "d"), 4).alias("daily_trend"),
        F.round(F.regr_intercept("value", "d"), 4).alias("intercept"),
        F.count("*").alias("n_events"),
    )


@query(
    "agg_corr_lineitem",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(19,6)) * 1000000
                  AS HUGEINT) AS qx,
             CAST(CAST(l_extendedprice AS DECIMAL(19,6)) * 1000000
                  AS HUGEINT) AS qy
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(qx) AS DOUBLE) AS sx,
             CAST(SUM(qy) AS DOUBLE) AS sy,
             CAST(SUM(qx * qx) AS DOUBLE) AS sxx,
             CAST(SUM(qy * qy) AS DOUBLE) AS syy,
             CAST(SUM(qx * qy) AS DOUBLE) AS sxy
      FROM q GROUP BY l_returnflag
    )
    -- moments are INTEGER-exact and cast integer->double (single
    -- correctly-rounded conversion in both engines; a decimal->double
    -- cast is double-rounded in DuckDB — int->double then /10^scale —
    -- and drifted ULPs vs Spark's BigDecimal.doubleValue, caught by
    -- the full-precision r11 sim). Correlation is scale-invariant so
    -- the 10^6 quantization cancels; after the moments every op is
    -- identical IEEE — round(double, 6) would only add the repr-vs-
    -- binary half-boundary divergence (the q2 class)
    SELECT l_returnflag, n,
           (sxy / n - (sx / n) * (sy / n))
                 / (sqrt(sxx / n - (sx / n) * (sx / n))
                    * sqrt(syy / n - (sy / n) * (sy / n)))
             AS corr_qty_price
    FROM m
    """,
    tags=("agg", "statistics"),
)
def agg_corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, computed from exact INTEGER moment sums rather than the
    built-in corr() — built-in implementations use different
    single-pass update formulas per engine (Welford vs naive), so
    their float results drift. Values quantize to 10^6-scaled
    integers first (exact for the 2-dp fixture data; correlation is
    scale-invariant so the factor cancels), the moments accumulate
    exactly in DECIMAL(38,0)/HUGEINT, and each moment crosses to
    double via ONE integer->double conversion — correctly rounded in
    both engines, unlike a decimal->double cast, which DuckDB
    double-rounds (int->double then /10^scale) and which drifted the
    syy moment by a ULP vs Spark's BigDecimal.doubleValue (caught by
    the full-precision r11 driver sim; the old 12-digit sim masked
    it). Every double op after the moments is identical IEEE in both
    engines. Same one-aggregate shape and cost as any grouped agg."""
    li = _t(spark, sf_dir, "lineitem")
    qx = (F.col("l_quantity").cast("decimal(19,6)") * 1_000_000).cast(
        "decimal(38,0)"
    )
    qy = (
        F.col("l_extendedprice").cast("decimal(19,6)") * 1_000_000
    ).cast("decimal(38,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qx).cast("double").alias("sx"),
        F.sum(qy).cast("double").alias("sy"),
        F.sum(qx * qx).cast("double").alias("sxx"),
        F.sum(qy * qy).cast("double").alias("syy"),
        F.sum(qx * qy).cast("double").alias("sxy"),
    )
    n = F.col("n")
    mx, my = F.col("sx") / n, F.col("sy") / n
    cov = F.col("sxy") / n - mx * my
    sd = F.sqrt(F.col("sxx") / n - mx * mx) * F.sqrt(
        F.col("syy") / n - my * my
    )
    return m.select(
        "l_returnflag", "n", (cov / sd).alias("corr_qty_price")
    )
