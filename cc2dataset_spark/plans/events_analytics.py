"""Event-log analytics composites (north-star extension; the reference
has no event model): ordered funnel conversion and weekly retention
cohorts — the two classic product-analytics shapes, expressed as keyed
aggregates + joins so they scale as one user_id-keyed shuffle plus
small broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cc2dataset_spark.functions.numeric import RATIO6_SQL
from cc2dataset_spark.functions.datetime_ntz import (
    trunc_hour_ntz,
    trunc_week_monday_date,
)
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
    tags=("events", "funnel", "agg", "join"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click. The whole
    query is ONE user_id shuffle: each stage's timestamp is a windowed
    conditional MIN over the same partitioning (Catalyst chains the
    three Window nodes over a single exchange+sort), then a per-user
    reduce and one global count row. The staged-aggregate-and-join
    formulation (the oracle's CTE shape) measured 26 exchanges at
    sf0.1; this plan has 4. Strictly-ordered semantics (ts comparisons
    on exact timestamps), no sessionization needed."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    s1 = e.withColumn("t_view", F.min(F.when(is_("view"), F.col("ts"))).over(w))
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(is_("click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                is_("purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_full_funnel"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7
                AS INTEGER) AS week_offset,
           COUNT(*) AS n_active
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    """,
    tags=("events", "retention", "agg", "join"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by the week of their
    first event, counted once per week they were active. Two user-keyed
    aggregates (first-event week, distinct active weeks) joined on
    user_id — the join reuses the aggregation partitioning — then a
    tiny (cohort, offset) roll-up. Week truncation is Monday-based in
    both engines; the offset is exact integer day arithmetic."""
    e = load_table(spark, sf_dir, "events")
    # trunc_week_monday_date, not date_trunc("week").cast("date"):
    # date_trunc converts NTZ inputs through the session timezone, so
    # a DST gap at a week boundary would shift the cohort; the pure
    # date-arithmetic Monday is tz-free and matches DuckDB's Monday-
    # based week truncation exactly
    firsts = e.groupBy("user_id").agg(
        trunc_week_monday_date(F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id",
        trunc_week_monday_date(F.col("ts")).alias("active_week"),
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


def _session_seq(e):
    """30-minute-gap sessionization (lag-flag-cumsum) — the ONE
    definition of "session" shared by events_sessionize and
    join_interval_busy_hours (gap rule, strict '>', (ts, event_id)
    tie-break): returns (user_id, ts, session_seq) over a frame with
    user_id/event_id/ts. Both window passes stack on one user-keyed
    exchange+sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id", "ts", F.sum(new_s).over(run).alias("session_seq")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             -- CAST: DuckDB's SUM over integers returns HUGEINT
             -- (int128); Spark emits BIGINT. Values are identical but
             -- the driver's typed hasher sees Decimal vs int — this
             -- exact divergence was the only red driver row of r5.
             CAST(SUM(new_s) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end,
           CAST(date_sub('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_secs
    FROM sess GROUP BY user_id, session_seq
    """,
    tags=("events", "session", "window", "agg"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (30-minute inactivity gap), rolled
    up to one row per (user, session): the classic lag-flag-cumsum
    sessionization, the per-EVENT complement of the session_window
    aggregate in streaming/windows.py (which yields windows, not
    stable per-session ordinals).

    Plan: ONE user_id-keyed shuffle + ONE sort carry both window
    passes (the flag-sum Window consumes the lag Window's output, so
    they stack as two Window nodes over the same exchange+sort — no
    re-shuffle, .explain-verified) and the final (user, session)
    aggregate partial-aggregates map-side on the same partitioning. The
    gap test compares full-precision timestamps (no epoch truncation),
    so a 1799.999s gap stays in-session in both engines; the session
    duration counts COMPLETE seconds (timestampdiff / DuckDB
    date_sub), never epoch casts, so it is independent of the
    process/session timezone."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sess = _session_seq(e)
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.expr("timestampdiff(SECOND, min(ts), max(ts))").alias(
            "duration_secs"
        ),
    )


@query(
    "events_value_outliers",
    oracle="""
    WITH m6 AS (
      SELECT event_type,
             CAST(value AS DECIMAL(19,6)) AS v,
             -- (19,0), not (18,0): DuckDB multiplies DECIMAL(18) in
             -- int64 and overflows on m*m; width 19 forces int128.
             -- (Spark side stays (18,0): ITS product rule needs
             -- p1+p2+1 <= 38 to stay exact. Same integers either way.)
             CAST(CAST(value AS DECIMAL(19,6)) * 1000000
                  AS DECIMAL(19,0)) AS m
      FROM events
    ), stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(v) AS DOUBLE) AS s1,
             CAST(SUM(m * m) AS DOUBLE) / 1e12 AS s2
      FROM m6 GROUP BY event_type
    ), scored AS (
      SELECT e.event_id, e.event_type, e.value,
             s.s1 / s.n AS mean,
             sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0.0))
               AS std
      FROM events e JOIN stats s ON e.event_type = s.event_type
    )
    SELECT event_id, event_type, value,
           round((value - mean) / NULLIF(std, 0.0), 6) AS zscore,
           abs(value - mean) > 3 * std AS is_outlier
    FROM scored
    """,
    tags=("events", "quality", "agg"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event z-score against its event type's population moments,
    flagging |z| > 3 — the monitoring/anomaly shape (metric drift,
    bot spikes). Moments come from exact integer arithmetic: value
    quantizes to micro-units m = value*10^6 as DECIMAL(18,0) and the
    square sums as m*m at (37,0) — exact in BOTH engines (r8 fix: a
    direct (19,6)x(19,6) square is decimal(38,11) HALF_UP-rounded
    PER ROW in Spark but exact (38,12) in DuckDB — a measured ~1e-12
    per-row drift; and an (18,6) square overflows DuckDB's int64
    decimal path for |value| >= 1000, the r6 agg_corr class). The
    micro-unit bound |value| < 10^12 fails loudly (ANSI overflow) in
    both engines. mean/variance/sqrt are then identical IEEE double
    ops — sqrt is correctly rounded — so even the 3-sigma BOOLEAN
    compares identical doubles and needs no rounding slack. Plan: one
    tiny per-type aggregate broadcast back onto the events; the
    stream never shuffles."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(19,6)")
    m = (v * F.lit(1000000).cast("decimal(7,0)")).cast("decimal(18,0)")
    stats = e.groupBy(F.col("event_type").alias("t")).agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        (F.sum(m * m).cast("double") / F.lit(1e12)).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(
        F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    )
    scored = e.join(
        F.broadcast(stats), e.event_type == F.col("t")
    ).select(
        "event_id",
        "event_type",
        "value",
        mean.alias("mean"),
        std.alias("std"),
    )
    return scored.select(
        "event_id",
        "event_type",
        "value",
        F.round(
            (F.col("value") - F.col("mean"))
            / F.nullif(F.col("std"), F.lit(0.0)),
            6,
        ).alias("zscore"),
        (
            F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std")
        ).alias("is_outlier"),
    )


@query(
    "events_rolling_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (
      SELECT DISTINCT d FROM ud
    )
    SELECT days.d AS day,
           COUNT(DISTINCT ud.user_id) AS wau
    FROM days JOIN ud
      ON ud.d <= days.d AND ud.d >= days.d - 6
    GROUP BY days.d
    """,
    tags=("events", "window", "agg", "distinct"),
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the product-metrics WAU
    series. DISTINCT aggregates are not allowed inside window frames
    (either engine), so the rolling distinct uses the classic
    formulation: dedup to (day, user) once, then join the (tiny) day
    grid to the 7-day-trailing user-days and count distinct per day.

    Scale shape: the corpus-sized work is the single (day, user)
    dedup shuffle; the day grid is |days| rows and broadcasts, so the
    fan-out is exactly 7x the deduped user-days — bounded and
    skew-free. Integer/date-exact throughout."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    window_hit = (F.col("d") <= F.col("day")) & (
        F.col("d") >= F.date_sub("day", 6)
    )
    return (
        F.broadcast(days)
        .join(ud, window_hit)
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


_QUANTILES_ORACLE = """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           MAX(n) AS n_events,
           MIN(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
           MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
           MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
    FROM ranked GROUP BY event_type
    """


def _discrete_quantiles(ranked: DataFrame) -> DataFrame:
    """(event_type, value, rn, n) -> per-type exact discrete
    p50/p90/p99 with k = ceil(p*n) in integer arithmetic — shared by
    the window path and the heavy-tail keyed-rank path, which must
    produce identical rows."""
    pick = lambda t: F.min(  # noqa: E731
        F.when(F.col("rn") == F.expr(t), F.col("value"))
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        pick("(n + 1) div 2").alias("p50"),
        pick("(9 * n + 9) div 10").alias("p90"),
        pick("(99 * n + 99) div 100").alias("p99"),
    )


@query(
    "events_value_quantiles",
    oracle=_QUANTILES_ORACLE,
    tags=("events", "stats", "window", "quantile"),
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE quantiles (p50/p90/p99) of event value per type —
    the latency-percentile shape of ops analytics, done cross-engine
    exact: the k-th smallest actual value with k = ceil(p*n) computed
    in INTEGER arithmetic ((p_num*n + p_den - 1) DIV p_den), so there
    is no float interpolation to drift between engines (Spark's
    percentile()/DuckDB's quantile_cont interpolate with different
    float expression trees; approx_percentile sketches aren't
    replayable at all). NULL values are filtered first — Spark sorts
    nulls FIRST ascending, DuckDB LAST, so leaving them in would shift
    every rank.

    Plan: one event_type-keyed exchange+sort carries both the
    ROW_NUMBER and the partition COUNT (two Window nodes, same spec),
    then the per-type aggregate rides the same partitioning —
    partial-aggregates map-side, no second shuffle. Per-type state is
    the sort run, fine for bounded type cardinality; when one key's
    rows outgrow a task, use events_value_quantiles_heavy (identical
    output, rank via operators/rank.keyed_row_number)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    return _discrete_quantiles(ranked)


@query(
    "events_value_quantiles_heavy",
    oracle=_QUANTILES_ORACLE,
    tags=("events", "stats", "quantile", "rank"),
)
def events_value_quantiles_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heavy-tail twin of events_value_quantiles — identical
    output (same oracle), different rank plan: ``ROW_NUMBER() OVER
    (PARTITION BY event_type)`` funnels every row of the hottest type
    through ONE task, which dies when a 'click'-sized key holds 10^10
    rows at 100 TB. operators/rank.keyed_row_number instead
    range-partitions on (event_type, value, event_id) — the range
    sampler splits a hot key across as many partitions as its volume
    needs — and reassembles per-key ranks and totals from a
    (partition, key)-count prefix sum broadcast back, so no task ever
    sorts more than one partition's slice of any key. The choice
    between the twins is the caller's capacity call: per-type window
    state below task memory -> the window plan's single exchange is
    cheaper; above it -> this plan is the one that finishes."""
    from cc2dataset_spark.operators.rank import keyed_row_number

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value", "event_id")
    )
    ranked = keyed_row_number(
        e,
        keys=["event_type"],
        order_by=["value", "event_id"],
        rank_col="rn",
        count_col="n",
    )
    return _discrete_quantiles(ranked)


@query(
    "events_scd2_event_type",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, ts, event_type,
             CAST(SUM(chg) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS version
      FROM ordered
    ), collapsed AS (
      SELECT user_id, version, event_type,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM islands GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY version) AS valid_to,
           n_events,
           (LEAD(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY version) IS NULL) AS is_current
    FROM collapsed
    """,
    tags=("events", "scd2", "window", "islands"),
)
def events_scd2_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension reconstruction from a change
    log (Kimball SCD2): collapse each user's consecutive runs of the
    same event_type into versioned validity intervals
    [valid_from, valid_to) with an is_current flag on the open tail —
    the gaps-and-islands pattern every warehouse builds dimension
    history with, and the batch twin of a CDC-fed MERGE.

    Plan: ONE user_id-keyed exchange serves the entire query. The
    change-flag lag window and the running-sum island window hash-
    partition on user_id; the (user_id, version) collapse and the
    lead(valid_from) stitch both require only ClusteredDistribution
    over supersets of {user_id}, which HashPartitioning(user_id)
    already satisfies, so Catalyst inserts sorts but NO further
    exchanges (asserted in tests/test_r7_plans.py). Per-user state is
    bounded by that user's event count — no global window anywhere."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact twin of SQL's IS DISTINCT FROM (null-safe inequality)
    chg = (
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w))
    ).cast("bigint")
    islands = e.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("version"),
    )
    collapsed = islands.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return collapsed.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


_MARKOV_P = RATIO6_SQL.format(num="c.n", den="t.n_prev")


@query(
    "events_markov_transitions",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
      WHERE event_type IS NOT NULL
    ), pairs AS (
      SELECT event_type AS prev_type, next_type
      FROM ordered WHERE next_type IS NOT NULL
    ), c AS (
      SELECT prev_type, next_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2
    ), tot AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_prev FROM c GROUP BY 1
    )
    SELECT c.prev_type, c.next_type, c.n,
           {_MARKOV_P} AS p
    FROM c JOIN tot t USING (prev_type)
    """,
    tags=("events", "markov", "window", "agg"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), the classic
    behavioral-model fit (and the sanity check behind funnel design —
    transitions the funnel assumes but users rarely take show up
    immediately as low p).

    Plan: the successor pairing is a lead window on the same ONE
    user_id-keyed exchange the other event analytics ride; the
    (prev, next) count and the per-prev total are aggregates over a
    k x k frame (k = distinct event types — single digits), so
    everything after the window is broadcast-sized. The conditional
    probability is integer-exact via functions/numeric.ratio_round6
    (n and n_prev are BIGINTs; both engines round the same rational),
    so no float ever decides a value."""
    from cc2dataset_spark.functions.numeric import ratio_round6

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # transitions are defined over NON-NULL event types, filtered
    # identically in the oracle: without the filter Spark's marginal
    # WINDOW keeps a NULL prev_type group that the oracle's equi-join
    # formulation would drop — a latent row-count divergence if the
    # fixture ever grows a NULL event_type (the schema allows one).
    pairs = (
        e.where(F.col("event_type").isNotNull())
        .select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
    )
    c = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    # marginal as a window over the k x k count frame: an agg-and-join
    # formulation re-evaluates c's whole lineage (second corpus scan +
    # second user-keyed window) because Catalyst cannot unify the
    # differently-pruned subtrees; the window keeps ONE lineage.
    n_prev = F.sum("n").over(Window.partitionBy("prev_type"))
    return c.select(
        "prev_type",
        "next_type",
        "n",
        ratio_round6(F.col("n"), n_prev).alias("p"),
    )


@query(
    "join_interval_busy_hours",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             CAST(SUM(new_s) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq,
             ts
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_seq,
             MIN(ts) AS t_start, MAX(ts) AS t_end
      FROM sess GROUP BY user_id, session_seq
    ), hours AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n_events_hour
      FROM events GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_events_hour) AS BIGINT) AS n_total,
             COUNT(*) AS n_hours
      FROM hours
    ), busy AS (
      SELECT h, n_events_hour FROM hours, tot
      WHERE n_events_hour * n_hours > n_total
    )
    SELECT s.user_id, s.session_seq, b.h AS hour_start, b.n_events_hour
    FROM sessions s JOIN busy b
      ON date_trunc('hour', s.t_start) <= b.h
     AND b.h <= date_trunc('hour', s.t_end)
    """,
    tags=("events", "join", "interval", "session"),
)
def join_interval_busy_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join, bucket-explode form — the temporal-join
    pattern for 'which of my intervals overlap which of yours' when
    BOTH sides are interval sets (the range join in plans/relational.py
    covers point-in-interval): user sessions (30-min-gap sessionize,
    closed intervals) against above-mean-activity 'busy hours'
    (half-open calendar buckets). 'Busy' = hourly count strictly above
    the global mean, compared as n_events_hour * n_hours > n_total in
    pure BIGINT — scale-free and float-free.

    Plan: sessions ride the ONE user-keyed exchange the other session
    analytics use; the hourly histogram is a calendar-bounded
    aggregate whose busy subset is BROADCAST (a year of hours is 8.8k
    rows — genuinely broadcastable at any corpus size); each session
    EXPLODES to the hour buckets it spans (sequence of date_trunc
    boundaries — fan-out = session duration in hours, bounded by the
    session gap rule) and equi-joins on the bucket, which is the
    standard O(n * span) interval join that never degenerates into the
    O(n * m) theta join the oracle runs. Bucket membership
    h in [trunc(t_start), trunc(t_end)] is EXACTLY interval overlap
    for a closed interval vs half-open hour buckets, so no residual
    filter is needed (the oracle states the same containment as a
    theta join).

    Hour truncation uses functions/datetime_ntz.trunc_hour_ntz, NOT
    F.date_trunc — date_trunc casts NTZ inputs to LTZ via the session
    timezone, which makes hour_start render process-tz-dependently at
    collect() and shifts wall clocks that land in a DST gap."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sessions = _session_seq(e).groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("t_start"), F.max("ts").alias("t_end")
    )
    hours = (
        load_table(spark, sf_dir, "events")
        .groupBy(trunc_hour_ntz("ts").alias("h"))
        .agg(F.count("*").alias("n_events_hour"))
    )
    # global totals as a window over the hourly frame: the frame is
    # calendar-bounded (a year is 8.8k rows), so the single-partition
    # window is safe by construction — and it keeps ONE lineage where
    # an agg-and-join-back would rescan events for the totals.
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    busy = (
        hours.withColumn("n_total", F.sum("n_events_hour").over(wall))
        .withColumn("n_hours", F.count("*").over(wall))
        .where(F.col("n_events_hour") * F.col("n_hours") > F.col("n_total"))
        .select("h", "n_events_hour")
    )
    spanned = sessions.select(
        "user_id",
        "session_seq",
        F.explode(
            F.sequence(
                trunc_hour_ntz("t_start"),
                trunc_hour_ntz("t_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    )
    return spanned.join(F.broadcast(busy), "h").select(
        "user_id",
        "session_seq",
        F.col("h").alias("hour_start"),
        "n_events_hour",
    )


@query(
    "sketch_kmv_distinct_users",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(md5_number_lower(
               'kmv:' || CAST(user_id AS VARCHAR)) AS DECIMAL(20,0)) AS hv
      FROM events
    ), samp AS (
      SELECT hv FROM h ORDER BY hv LIMIT 256
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_seen, MAX(hv) AS kth FROM samp
    )
    SELECT 256 AS k, n_seen,
           CASE WHEN n_seen < 256 THEN n_seen
                ELSE CAST((255 * CAST(18446744073709551616 AS HUGEINT))
                          // CAST(kth AS HUGEINT) AS BIGINT)
           END AS est_distinct
    FROM agg
    """,
    tags=("events", "sketch", "distinct", "agg"),
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count estimator,
    k=256: hash every user, keep the k smallest DISTINCT hashes, and
    estimate |distinct| = (k-1) * 2^64 / h_k (Bar-Yossef et al. 2002 —
    the mergeable-sample ancestor of HLL; union of two sketches =
    merge + re-truncate). The estimate arithmetic is an exact integral
    divide in DECIMAL(38,0)/HUGEINT — verified bit-equal cross-engine
    — and when the universe is smaller than k the sketch IS the exact
    count (n_seen branch), so no float touches the output.

    Honest scale note: this batch twin computes the distinct-hash
    stream with a map-side partial distinct + one exchange of the
    distinct hashes before the k-truncation — oracle-replayable, but
    NOT sub-distinct cost; at true corpus scale the production path
    for one-shot counts is approx_count_distinct (HLL, already in
    A3's agg battery) and this row pins the KMV MATH the mergeable
    per-segment sketches use. The k-sample itself is tiny and the
    estimator exact given the sample, so the driver row proves the
    full estimate chain."""
    from cc2dataset_spark.functions.hashes import md5_number_lower

    e = load_table(spark, sf_dir, "events")
    h = e.select(
        md5_number_lower(
            F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
        ).alias("hv")
    ).distinct()
    samp = h.orderBy("hv").limit(256)
    agg = samp.agg(
        F.count("*").alias("n_seen"), F.max("hv").alias("kth")
    )
    est = F.when(F.col("n_seen") < 256, F.col("n_seen")).otherwise(
        F.expr(
            "CAST((CAST(255 AS DECIMAL(38,0))"
            " * CAST(18446744073709551616 AS DECIMAL(38,0)))"
            " div kth AS BIGINT)"
        )
    )
    return agg.select(
        F.lit(256).alias("k"),
        F.col("n_seen").cast("bigint").alias("n_seen"),
        est.cast("bigint").alias("est_distinct"),
    )


@query(
    "events_quantile_sketch_bottomk",
    oracle="""
    WITH s AS (
      SELECT value
      FROM events
      WHERE value IS NOT NULL
      ORDER BY md5_number_lower('qs:' || CAST(event_id AS VARCHAR)),
               event_id
      LIMIT 512
    ), ranked AS (
      SELECT value,
             ROW_NUMBER() OVER (ORDER BY value) AS rn,
             COUNT(*) OVER () AS n
      FROM s
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_sample,
           MIN(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50_est,
           MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90_est,
           MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99_est
    FROM ranked
    """,
    tags=("events", "sketch", "quantile", "sampling"),
)
def events_quantile_sketch_bottomk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile ESTIMATION from a bottom-k uniform sample — the
    mergeable-sketch counterpart of events_value_quantiles' exact
    path: the 512 events with the smallest md5(event_id) are a
    deterministic uniform sample without replacement (hash order is
    independent of value), two segment sketches merge by union +
    re-truncate, and the p50/p90/p99 estimates apply the SAME integer
    ceil-rank rule as the exact query to the sample. Replayable
    end-to-end — no random(), no interpolation.

    Plan: the sample selection is a TakeOrderedAndProject on the
    hash (per-partition top-k, driver merge of k-row slices) — the
    corpus is never shuffled or sorted, which is the whole point: the
    exact path's event_type exchange+sort disappears, at the price of
    a +-O(1/sqrt(k)) rank error. The 512-row sample then ranks in a
    single-partition window (bounded by construction). event_id
    tie-breaks the hash order so the sample is unique even under
    hash collisions."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    from cc2dataset_spark.functions.hashes import md5_number_lower

    s = (
        e.select(
            "value",
            md5_number_lower(
                F.concat(F.lit("qs:"), F.col("event_id").cast("string"))
            ).alias("hv"),
            "event_id",
        )
        .orderBy("hv", "event_id")
        .limit(512)
        .select("value")
    )
    w = Window.orderBy("value")
    ranked = s.select(
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    pick = lambda t: F.min(  # noqa: E731
        F.when(F.col("rn") == F.expr(t), F.col("value"))
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_sample"),
        pick("(n + 1) div 2").alias("p50_est"),
        pick("(9 * n + 9) div 10").alias("p90_est"),
        pick("(99 * n + 99) div 100").alias("p99_est"),
    )


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, ts, value,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ), w AS (
      SELECT user_id,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_e3,
             date_diff('microsecond', ts, nxt) // 1000 AS dt_ms
      FROM d WHERE nxt IS NOT NULL
    ), agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) + 1 AS n_events,
             CAST(SUM(v_e3 * dt_ms) AS BIGINT) AS num,
             CAST(SUM(dt_ms) AS BIGINT) AS den
      FROM w GROUP BY user_id
    )
    SELECT user_id, n_events, den AS active_ms,
           (2 * num + den) // (2 * den) AS twap_e3
    FROM agg WHERE den > 0
    """,
    tags=("events", "timeseries", "agg"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user (the TimescaleDB
    time_weight / financial TWAP primitive): each reading is held
    piecewise-constant until the user's next event, so a burst of
    cheap readings milliseconds apart cannot drown out a reading that
    stood for hours — the correct average for irregularly-sampled
    gauges. Emitted as twap_e3 = round(1000 * TWAP) in BIGINT.

    Float discipline: the reading is snapped to integer 1e-3 units
    (floor(value*1000 + 0.5) — one identical double op per row in both
    engines), the hold duration to integer milliseconds via
    MICROSECOND timestampdiff div 1000 (exact on NTZ in both engines,
    timezone-free — never DuckDB's millisecond boundary-crossing
    count, which disagrees with Spark's truncating diff on sub-ms
    gaps), so the weighted sum is pure BIGINT — order-free — and the
    final round is the exact-rational (2*num + den) div (2*den).
    Bound: sum(v_e3 * dt_ms) < 2^63 holds while value*span stays under
    ~9e15 unit-milliseconds per user (a value of 10^6 held for 290
    years); route through DECIMAL(38,0) past that.

    Plan: ONE user-keyed exchange carries the LEAD window and the
    per-user aggregate (the groupBy reuses the window's partitioning);
    nothing else shuffles. Users whose events all share one
    millisecond (den = 0) are dropped rather than divided by zero."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn("nxt", F.lead("ts").over(w)).where(
        F.col("nxt").isNotNull()
    )
    weighted = d.select(
        "user_id",
        F.floor(F.col("value") * 1000 + 0.5).cast("bigint").alias("v_e3"),
        F.expr("timestampdiff(MICROSECOND, ts, nxt) div 1000").alias(
            "dt_ms"
        ),
    )
    agg = weighted.groupBy("user_id").agg(
        (F.count("*") + 1).cast("bigint").alias("n_events"),
        F.sum(F.col("v_e3") * F.col("dt_ms")).cast("bigint").alias("num"),
        F.sum("dt_ms").cast("bigint").alias("den"),
    )
    return agg.where(F.col("den") > 0).select(
        "user_id",
        "n_events",
        F.col("den").alias("active_ms"),
        F.expr("(2 * num + den) div (2 * den)").alias("twap_e3"),
    )


@query(
    "sketch_kmv_setops",
    oracle="""
    WITH ha AS (
      SELECT DISTINCT CAST(md5_number_lower(
               'kmv:' || CAST(user_id AS VARCHAR)) AS DECIMAL(20,0)) AS hv
      FROM events WHERE event_type = 'click'
    ), hb AS (
      SELECT DISTINCT CAST(md5_number_lower(
               'kmv:' || CAST(user_id AS VARCHAR)) AS DECIMAL(20,0)) AS hv
      FROM events WHERE event_type = 'purchase'
    ), ka AS (SELECT hv FROM ha ORDER BY hv LIMIT 256),
    kb AS (SELECT hv FROM hb ORDER BY hv LIMIT 256),
    ku AS (
      SELECT hv FROM (
        SELECT DISTINCT hv
        FROM (SELECT hv FROM ka UNION ALL SELECT hv FROM kb)
      ) ORDER BY hv LIMIT 256
    ), ua AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_union, MAX(hv) AS kth FROM ku
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ku JOIN ka USING (hv) JOIN kb USING (hv)
    )
    SELECT 256 AS k, ua.n_union, m.n_both,
           CASE WHEN ua.n_union < 256 THEN ua.n_union
                ELSE CAST((255 * CAST(18446744073709551616 AS HUGEINT))
                          // CAST(ua.kth AS HUGEINT) AS BIGINT)
           END AS est_union,
           CASE WHEN ua.n_union < 256 THEN m.n_both
                ELSE (m.n_both * CAST(
                  (255 * CAST(18446744073709551616 AS HUGEINT))
                  // CAST(ua.kth AS HUGEINT) AS BIGINT)) // 256
           END AS est_intersection
    FROM ua, m
    """,
    tags=("events", "sketch", "distinct", "setops"),
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations on KMV sketches (Bar-Yossef 2002 / Beyer 2007):
    estimate |clickers UNION purchasers| and |clickers INTERSECT
    purchasers| from two k=256 bottom-k sketches WITHOUT re-touching
    the raw data — the reason KMV (not HLL) is the sketch a curation
    pipeline stores per segment: sketches merge by union+re-truncate,
    and intersection comes from the merged sketch's both-members ratio
    (est_inter = n_both * est_union / k), so overlap questions across
    any segment pair are answered from k-row summaries. Everything
    downstream of the hashes is exact integer arithmetic
    (DECIMAL/HUGEINT integral divides, the same bit-equal primitive
    the driver-proven kmv_distinct_users row pins); when the merged
    sketch holds the whole universe (n_union < k) both estimates
    collapse to EXACT counts by construction.

    Plan: each side's sketch is a distinct + TakeOrderedAndProject
    (map-side partial distinct, k-row result — the corpus-scale stream
    is never globally sorted); the merge, membership joins, and
    estimate math all run on k-row broadcast frames. Both sides MUST
    share the hash salt ('kmv:') — sketch intersection is only sound
    over a common hash universe."""
    from cc2dataset_spark.functions.hashes import md5_number_lower

    e = load_table(spark, sf_dir, "events")

    def sketch(event_type: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == event_type)
            .select(
                md5_number_lower(
                    F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
                ).alias("hv")
            )
            .distinct()
            .orderBy("hv")
            .limit(256)
        )

    ka, kb = sketch("click"), sketch("purchase")
    ku = ka.union(kb).distinct().orderBy("hv").limit(256)
    ua = ku.agg(
        F.count("*").cast("bigint").alias("n_union"),
        F.max("hv").alias("kth"),
    )
    m = (
        ku.join(F.broadcast(ka), "hv")
        .join(F.broadcast(kb), "hv")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    est_union = F.when(F.col("n_union") < 256, F.col("n_union")).otherwise(
        F.expr(
            "CAST((CAST(255 AS DECIMAL(38,0))"
            " * CAST(18446744073709551616 AS DECIMAL(38,0)))"
            " div kth AS BIGINT)"
        )
    )
    return (
        ua.crossJoin(F.broadcast(m))
        .withColumn("est_union", est_union.cast("bigint"))
        .select(
            F.lit(256).alias("k"),
            "n_union",
            "n_both",
            "est_union",
            F.when(F.col("n_union") < 256, F.col("n_both"))
            .otherwise(
                F.expr("(n_both * est_union) div 256")
            )
            .cast("bigint")
            .alias("est_intersection"),
        )
    )


@query(
    "events_m4_downsample",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS bucket, ts, event_id, value
      FROM events WHERE value IS NOT NULL
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           (MIN({'ts': ts, 'eid': event_id, 'v': value})).v AS v_first,
           (MAX({'ts': ts, 'eid': event_id, 'v': value})).v AS v_last
    FROM b GROUP BY bucket
    """,
    tags=("events", "timeseries", "downsample", "agg"),
)
def events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per hour
    bucket keep exactly min, max, first, and last — the four values
    that make a width-bounded line plot pixel-identical to the full
    series, and the standard rollup a monitoring store keeps per
    retention tier. first/last ride the min/max-of-struct trick
    (struct ordering = (ts, event_id, value), so ties are broken by
    the total order, never by arrival) — one hash aggregate, no
    per-bucket window, no sort.

    Exactness: values pass through UNTOUCHED (selection, not
    arithmetic — no float op ever runs), the bucket is the tz-free
    NTZ hour truncation, and the struct-min trick evaluates
    identically in both engines. ONE bucket-keyed exchange with
    map-side partials; bucket cardinality is calendar-bounded, so the
    result stays broadcast-small at any corpus size."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = e.select(
        trunc_hour_ntz("ts").alias("bucket"), "ts", "event_id", "value"
    )
    s = F.struct(F.col("ts"), F.col("event_id").alias("eid"), F.col("value").alias("v"))
    return b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.min(s).getField("v").alias("v_first"),
        F.max(s).getField("v").alias("v_last"),
    )


# Shared round-half-up rational fragment (functions/numeric.py): one
# definition repo-wide, so a rounding-rule fix can never miss a copy.
_MAD_FRAC_SQL = RATIO6_SQL.format(num="n_outliers", den="n_events")


@query(
    "events_anomaly_mad",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value
      FROM events WHERE value IS NOT NULL
    ), freq AS (
      SELECT event_type, value, COUNT(*) AS cnt
      FROM e GROUP BY event_type, value
    ), r1 AS (
      SELECT event_type, value, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM freq
    ), med AS (
      SELECT event_type,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN value END) AS m,
             MIN(n) AS n
      FROM r1 GROUP BY event_type
    ), d AS (
      SELECT f.event_type, abs(f.value - med.m) AS dev, f.cnt,
             med.m, med.n
      FROM freq f JOIN med USING (event_type)
    ), r2 AS (
      SELECT event_type, dev, n,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumd
      FROM d
    ), mad AS (
      SELECT event_type,
             MIN(CASE WHEN cumd >= (n + 1) // 2 THEN dev END) AS mad
      FROM r2 GROUP BY event_type
    ), agg AS (
      SELECT d.event_type,
             CAST(MIN(d.n) AS BIGINT) AS n_events,
             MIN(d.m) AS median_value,
             MIN(mad.mad) AS mad_raw,
             CAST(COALESCE(SUM(CASE WHEN d.dev > 3 * mad.mad
                                    THEN d.cnt END), 0)
               AS BIGINT) AS n_outliers
      FROM d JOIN mad USING (event_type)
      GROUP BY d.event_type
    )
    SELECT event_type, n_events,
           round(median_value, 6) AS median_value,
           round(mad_raw, 6) AS mad,
           n_outliers,
           {_MAD_FRAC_SQL} AS outlier_frac
    FROM agg
    """,
    tags=("events", "stats", "anomaly", "quantile"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-key outlier detection via MEDIAN ABSOLUTE DEVIATION —
    the anomaly gate that survives the heavy tails that break
    stddev-based z-scores (events_value_outliers' sibling: one wild
    value inflates a stddev threshold and masks every other outlier;
    the median/MAD pair has a 50% breakdown point). Both medians are
    EXACT order statistics read off a cumulative-weight scan of the
    per-(type, value) FREQUENCY table (k = (n+1) div 2 in integer
    arithmetic); the outlier flag dev > 3*MAD compares doubles built
    by identical IEEE expression trees on both engines.

    The frequency-table formulation is the scale move: median->
    deviations->median is intrinsically two passes, so take them over
    the DISTINCT-VALUE table, not the fact. The one corpus-scale
    stage is a (type, value) count whose map-side partials absorb
    duplication; the pinned frequency frame (distinct-value-sized,
    cheap to cache) then feeds both median passes, each a
    RANGE-framed cumulative window — tie-safe by construction: equal
    values collapse into one weighted row, so no event-id tie-break
    is needed and the k-th order statistic is deterministic in any
    engine. For a type whose DISTINCT values still outgrow a task,
    swap the windows to operators/rank.keyed_row_number as
    events_value_quantiles_heavy demonstrates."""
    from pyspark.storagelevel import StorageLevel

    from cc2dataset_spark import caching
    from cc2dataset_spark.functions.numeric import ratio_round6

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    # repartition("event_type") BEFORE the persist: the cached frame
    # then satisfies every downstream requirement (two type-keyed
    # windows, two type-keyed aggregates) with zero further exchanges
    # — the count's (type, value) exchange does the corpus-scale work,
    # the re-key moves only the distinct-value table.
    freq = caching.track(
        e.groupBy("event_type", "value")
        .agg(F.count("*").alias("cnt"))
        .repartition("event_type")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r1 = freq.select(
        "event_type",
        "value",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    k = F.expr("(n + 1) div 2")
    med = r1.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= k, F.col("value"))).alias("m"),
        F.min("n").alias("n"),
    )
    d = freq.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("m")).alias("dev"),
        "cnt",
        "m",
        "n",
    )
    w_dev = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r2 = d.select(
        "event_type",
        "dev",
        "n",
        F.sum("cnt").over(w_dev).alias("cumd"),
    )
    mad = r2.groupBy("event_type").agg(
        F.min(F.when(F.col("cumd") >= k, F.col("dev"))).alias("mad_raw")
    )
    agg = (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").cast("bigint").alias("n_events"),
            F.min("m").alias("median_value"),
            F.min("mad_raw").alias("mad_raw"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("dev") > 3 * F.col("mad_raw"), F.col("cnt")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    return agg.select(
        "event_type",
        "n_events",
        F.round("median_value", 6).alias("median_value"),
        F.round("mad_raw", 6).alias("mad"),
        "n_outliers",
        ratio_round6(F.col("n_outliers"), F.col("n_events")).alias(
            "outlier_frac"
        ),
    )


_LATE_SHARE = RATIO6_SQL.format(num="n_events", den="n_total")


@query(
    "events_lateness_profile",
    oracle=f"""
    WITH jit AS (
      SELECT event_type, ts,
             event_id + (event_id % 7) * 40 AS arrival_key,
             event_id
      FROM events
    ), arr AS (
      SELECT event_type, ts,
             MAX(ts) OVER (PARTITION BY event_type
               ORDER BY arrival_key, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax
      FROM jit
    ), late AS (
      SELECT event_type,
             date_diff('microsecond', ts, rmax) // 1000000 AS late_secs
      FROM arr
    ), binned AS (
      SELECT event_type, late_secs,
             CASE WHEN late_secs = 0 THEN 0
                  ELSE CAST(length(bin(late_secs)) AS BIGINT) END
               AS late_bucket
      FROM late
    ), cells AS (
      SELECT event_type, late_bucket,
             COUNT(*) AS n_events,
             MIN(late_secs) AS min_late_secs,
             MAX(late_secs) AS max_late_secs
      FROM binned GROUP BY event_type, late_bucket
    ), totals AS (
      SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS n_total
      FROM cells GROUP BY event_type
    )
    SELECT c.event_type, c.late_bucket, c.n_events,
           c.min_late_secs, c.max_late_secs,
           {_LATE_SHARE} AS share
    FROM cells c JOIN totals ON totals.event_type = c.event_type
    """,
    tags=("events", "streaming", "profiling", "watermark"),
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-lateness histogram — the measurement that SETS a
    withWatermark threshold instead of guessing it: for each event,
    lateness = (max event time seen so far in arrival order) - its own
    event time, log-binned by power-of-two seconds per event type. A
    watermark of 2^k seconds drops exactly the events in buckets > k —
    so this table IS the watermark-vs-data-loss trade-off curve the
    streaming queries (streaming/windows.py) need tuned. Arrival order
    on a real bus is the log offset; the fixture's event_ids are
    perfectly time-ordered (zero lateness everywhere — a degenerate
    histogram), so a deterministic jitter permutation
    (event_id + (event_id % 7) * 40, replayed in the oracle) stands in
    for the mostly-ordered-with-local-reordering arrival a real
    ingestion log shows.

    Exactness: the running max rides ONE type-keyed window exchange;
    lateness diffs in MICROSECONDS (timestampdiff is tz-free on NTZ
    and matches DuckDB's date_diff exactly — the millisecond variants
    count boundary crossings differently) then integer-div to
    seconds; buckets by integer bit length (length(bin(s)) — the same
    no-float-log2 move as graph_degree_distribution, with an explicit
    0 bucket for in-order events); shares via the exact rational.
    Downstream of the one exchange everything is
    (type x <=64 buckets)-sized."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        (F.col("event_id") + (F.col("event_id") % 7) * 40).alias(
            "arrival_key"
        ),
    )
    # SQL-expr window: timestampdiff needs the running max inline
    late = e.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, ts, "
            "max(ts) OVER (PARTITION BY event_type "
            "ORDER BY arrival_key, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
            "div 1000000"
        ).alias("late_secs"),
    )
    binned = late.select(
        "event_type",
        "late_secs",
        F.when(F.col("late_secs") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.length(F.bin(F.col("late_secs"))).cast("bigint"))
        .alias("late_bucket"),
    )
    cells = binned.groupBy("event_type", "late_bucket").agg(
        F.count("*").alias("n_events"),
        F.min("late_secs").alias("min_late_secs"),
        F.max("late_secs").alias("max_late_secs"),
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n_events").cast("bigint").alias("n_total")
    )
    from cc2dataset_spark.functions.numeric import ratio_round6

    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "late_bucket",
        "n_events",
        "min_late_secs",
        "max_late_secs",
        ratio_round6(F.col("n_events"), F.col("n_total")).alias("share"),
    )


_CONC_SHARE = RATIO6_SQL.format(num="n_events", den="n_total")
_CONC_CUM = RATIO6_SQL.format(num="cum_events", den="n_total")


@query(
    "events_user_concentration",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id)
                  AS BIGINT) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_users_total
      FROM per_user
    ), deciled AS (
      SELECT ((rn - 1) * 10) // n_users_total + 1 AS decile, n
      FROM ranked
    ), cells AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM deciled GROUP BY decile
    ), tot AS (
      SELECT CAST(SUM(n_events) AS BIGINT) AS n_total FROM cells
    ), cum AS (
      SELECT decile, n_users, n_events, n_total,
             CAST(SUM(n_events) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_events
      FROM cells CROSS JOIN tot
    )
    SELECT decile, n_users, n_events,
           {_CONC_SHARE} AS events_share,
           {_CONC_CUM} AS cum_events_share
    FROM cum
    """,
    tags=("events", "profiling", "stats", "skew"),
)
def events_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration (Pareto) curve: rank users by event
    volume, cut into deciles, report each decile's share and the
    cumulative share — the "top 10% of users generate X% of events"
    table that complements profile_key_skew (that op names the
    heaviest KEYS; this one characterizes the whole distribution,
    which is what decides whether user-keyed state — sessionizers,
    funnels, per-user windows — needs the heavy-tail rank path or
    not).

    Integer-exact throughout: decile = ((rank-1)*10) div n_users
    (equal-count cuts, remainder spilling to early deciles — the
    deterministic convention both engines share), shares via the
    exact rational over the cumulative BIGINT sums.

    Plan: one user-keyed count (map-side partials) is the only
    corpus-scale stage; the rank runs over the USER table (the
    unpartitioned window is the documented key-cardinality exception
    — swap to operators/rank.global_row_number when the user table
    outgrows a task, as dedup_truncated_docs demonstrates); the
    decile rollup and cumulative window touch 10 rows."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n"))
    ranked = per_user.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("user_id")))
        .cast("bigint")
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias(
            "n_users_total"
        ),
    )
    deciled = ranked.select(
        F.expr("((rn - 1) * 10) div n_users_total + 1")
        .cast("bigint")
        .alias("decile"),
        "n",
    )
    cells = deciled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    tot = cells.agg(F.sum("n_events").cast("bigint").alias("n_total"))
    cum = cells.crossJoin(F.broadcast(tot)).select(
        "*",
        F.sum("n_events")
        .over(
            Window.orderBy("decile").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("bigint")
        .alias("cum_events"),
    )
    from cc2dataset_spark.functions.numeric import ratio_round6

    return cum.select(
        "decile",
        "n_users",
        "n_events",
        ratio_round6(F.col("n_events"), F.col("n_total")).alias(
            "events_share"
        ),
        ratio_round6(F.col("cum_events"), F.col("n_total")).alias(
            "cum_events_share"
        ),
    )
