"""Scalable global ranking (scale extension; no reference twin).

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY is the
classic Spark scale trap: the unpartitioned window moves the ENTIRE
dataset through one task. This module implements the standard
two-pass alternative — range-repartition on the order key, count rows
per range, broadcast the prefix-sum offsets back, and add a
within-partition row_number — so a total global rank costs one range
exchange plus a partition-count-sized driver aggregate, and every
partition ranks independently.

Used by the quality-tiering query (plans/curation.py): CCNet-style
head/middle/tail splits are defined by PER-CORPUS rank terciles, and
rank-based tiering is integer-exact across engines where
percentile-threshold tiering would hinge on float interpolation ulps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "global_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense global row number under a TOTAL order.

    ``order_by`` must be a total order (include a unique tiebreak
    column) — with ties the range partitioner may split equal keys
    arbitrarily and the result would not be reproducible.

    Plan: range exchange on the order key (the sampler handles skew),
    a per-partition count frame (bounded by the partition count)
    prefix-summed with a single-partition window — ≤ #partitions rows,
    never a driver collect — joined back on _pid (AQE broadcasts the
    tiny offsets side), and one within-partition sort+row_number with
    the partition's prefix-sum offset added. No stage ever holds more
    than one partition's rows.

    The returned frame is backed by a persisted intermediate (see the
    boundary-pinning comment below) that must outlive every action on
    the result — eager cleanup inside this function would let a later
    action re-sample different range boundaries and mis-attribute the
    prefix-sum offsets. ``.unpersist()`` on the RETURNED frame does
    NOT release it (it is a derived plan, not the cached one): callers
    running many ranks in one session should call ``release(result)``
    after the final action on the result.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions is None:
        ranged = df.repartitionByRange(*cols)
    else:
        ranged = df.repartitionByRange(num_partitions, *cols)
    from pyspark.storagelevel import StorageLevel

    # The persist is CORRECTNESS-critical, not a cache optimization:
    # the range partitioner SAMPLES its boundaries per execution, so
    # without pinning, the counts job and the final ranking job could
    # draw different boundaries and the prefix-sum offsets would be
    # attributed to the wrong partitions.
    from cc2dataset_spark import caching

    ranged = caching.track(
        ranged.withColumn("_pid", F.spark_partition_id()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    # Prefix-sum the per-partition counts with a single-partition
    # window over the ≤ #partitions-row counts frame (no driver
    # collect, no extra job); _off_ prefix sidesteps self-join
    # attribute ambiguity (off_df derives from ranged).
    wp = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = (
        ranged.groupBy("_pid")
        .count()
        .select(
            F.col("_pid").alias("_off_pid"),
            F.coalesce(F.sum("count").over(wp), F.lit(0))
            .cast("bigint")
            .alias("_offset"),
        )
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    # off_df is <= #partitions rows BY CONSTRUCTION — broadcast it
    # explicitly (guide §3.1) instead of waiting for AQE to discover
    # the size at runtime: the static plan skips the shuffle-stage
    # materialization + replan for this join (r14; same treatment as
    # the pagerank loop joins).
    out = (
        ranged.join(F.broadcast(off_df), F.col("_pid") == F.col("_off_pid"))
        .withColumn(
            rank_col,
            (F.col("_offset") + F.row_number().over(w)).cast("bigint"),
        )
        .drop("_pid", "_off_pid", "_offset")
    )
    out._pinned_intermediates = [ranged]  # released via release()
    return out


def keyed_row_number(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
    rank_col: str = "rn",
    count_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based PER-KEY row number (and optionally the per-key
    total) without ``PARTITION BY key`` window state — the heavy-tail
    variant of :func:`global_row_number` for when a single key's rows
    exceed one task's capacity (``ROW_NUMBER() OVER (PARTITION BY
    key)`` funnels every row of the hottest key through one task; a
    'click' event type with 10^10 rows kills that plan at 100 TB).

    Plan: ONE range exchange on ``(keys..., order_by...)`` — the range
    sampler splits a hot key across as many partitions as its volume
    demands, so no task ever holds more than one partition's rows of
    it — then a per-(partition, key) count frame (bounded by
    #partitions + #keys-present: keys are contiguous in range order,
    so each partition adds at most one straddling key) prefix-summed
    per key in partition order WITH A WINDOW OVER THE COUNTS FRAME —
    never a driver collect, so there is no key-cardinality ceiling
    (per-user keys at 10^8-10^9 distinct values stay fully
    distributed; each key's window partition holds at most #partitions
    rows by the contiguity argument). The offsets join back onto the
    ranged frame on (_pid, keys) — the SAME clustering the final
    row_number window needs, so when AQE plans it as a shuffle join
    the exchange is the one the window required anyway, and when the
    offsets frame is tiny AQE broadcasts it. Same boundary-pinning
    persist contract as global_row_number (registered with
    cc2dataset_spark.caching).

    ``order_by`` plus ``keys`` must be a total order (include a unique
    tiebreak) for reproducibility.
    """
    kcols = [F.col(k) for k in keys]
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    allcols = kcols + ocols
    if num_partitions is None:
        ranged = df.repartitionByRange(*allcols)
    else:
        ranged = df.repartitionByRange(num_partitions, *allcols)
    from pyspark.storagelevel import StorageLevel

    from cc2dataset_spark import caching

    ranged = caching.track(
        ranged.withColumn("_pid", F.spark_partition_id()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    counts = ranged.groupBy("_pid", *keys).count()
    wk = Window.partitionBy(*keys).orderBy("_pid")
    # Columns renamed with an _off_ prefix: off_df derives from ranged
    # (a self-join), and prefixed names sidestep ambiguous-attribute
    # resolution without relying on DataFrame-identity disambiguation.
    off_df = counts.select(
        F.col("_pid").alias("_off_pid"),
        *[F.col(k).alias(f"_off_{k}") for k in keys],
        F.coalesce(
            F.sum("count").over(
                wk.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("_offset"),
        F.sum("count")
        .over(
            wk.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("_ktotal"),
    )
    w = Window.partitionBy("_pid", *keys).orderBy(*ocols)
    # eqNullSafe, not a name-list equi-join: a NULL key forms its own
    # group in the window twin and the SQL oracle (ROW_NUMBER
    # PARTITION BY treats NULL as a partition), so the offset join
    # must match NULL keys too — a plain EqualTo would silently drop
    # every NULL-key row from the output.
    cond = F.col("_pid") == F.col("_off_pid")
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_off_{k}"))
    out = (
        ranged.join(off_df, cond)
        .drop("_off_pid", *[f"_off_{k}" for k in keys])
        .withColumn(
            rank_col,
            (F.col("_offset") + F.row_number().over(w)).cast("bigint"),
        )
    )
    if count_col is not None:
        out = out.withColumn(count_col, F.col("_ktotal"))
    out = out.drop("_pid", "_offset", "_ktotal")
    out._pinned_intermediates = [ranged]
    return out


def global_running_sum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the INCLUSIVE global running sum of ``value_col`` under a
    TOTAL order — the prefix-sum sibling of :func:`global_row_number`,
    for operators that need a global cumulative quantity (sequence
    packing by token budget, quota cutoffs) without the unpartitioned
    ``SUM() OVER (ORDER BY ...)`` window that funnels the whole corpus
    through one task.

    Plan: one range exchange on the order key, a per-partition SUM
    frame (bounded by the partition count) prefix-summed with a
    single-partition window — never a driver collect — joined back on
    _pid (AQE broadcasts the tiny offsets side), and a
    within-partition cumulative window with the partition's prefix-sum
    offset added. Same boundary-pinning persist contract as
    :func:`global_row_number` (the offsets branch and the final job
    must see identical range boundaries); the pinned frame registers
    with cc2dataset_spark.caching so the @query wrapper releases it.

    ``order_by`` must be a total order (unique tiebreak) and
    ``value_col`` must be integral (the prefix fold is exact BIGINT
    arithmetic; float partials would reorder).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions is None:
        ranged = df.repartitionByRange(*cols)
    else:
        ranged = df.repartitionByRange(num_partitions, *cols)
    from pyspark.storagelevel import StorageLevel

    from cc2dataset_spark import caching

    ranged = caching.track(
        ranged.withColumn("_pid", F.spark_partition_id()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    # Single-partition window over the ≤ #partitions-row sums frame —
    # no driver collect; NULL partial sums (all-null partitions)
    # contribute 0 like the old Python fold's `or 0`.
    wp = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = (
        ranged.groupBy("_pid")
        .agg(
            F.coalesce(F.sum(F.col(value_col)), F.lit(0))
            .cast("bigint")
            .alias("_s")
        )
        .select(
            F.col("_pid").alias("_off_pid"),
            F.coalesce(F.sum("_s").over(wp), F.lit(0))
            .cast("bigint")
            .alias("_offset"),
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # off_df <= #partitions rows by construction — explicit broadcast,
    # same rationale as global_row_number (guide §3.1).
    out = (
        ranged.join(F.broadcast(off_df), F.col("_pid") == F.col("_off_pid"))
        .withColumn(
            sum_col,
            (F.col("_offset") + F.sum(F.col(value_col)).over(w)).cast(
                "bigint"
            ),
        )
        .drop("_pid", "_off_pid", "_offset")
    )
    out._pinned_intermediates = [ranged]
    return out


def release(result: DataFrame) -> None:
    """Unpersist the boundary-pinning intermediates behind a frame
    returned by :func:`global_row_number` (or any frame that stacked
    handles onto ``_pinned_intermediates``). Call only after the FINAL
    action on the result — afterwards the result must not be recomputed
    (range boundaries would re-sample).

    Production paths no longer rely on this: every pinned frame is
    also registered with cc2dataset_spark.caching, which the @query
    wrapper drains between catalog queries. This remains for callers
    composing operators directly who want the memory back sooner."""
    for h in getattr(result, "_pinned_intermediates", []):
        h.unpersist()
