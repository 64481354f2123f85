"""As-of join (SURVEY.md §2.3: "no native primitive -> windowed last()
over union" — this module is that composite).

Two implementations with identical semantics, different scale
envelopes:

- ``plans/relational.join_asof_last_order``: candidate join + max_by.
  Simple, but the candidate set per (key, left-row) is every earlier
  right row — quadratic within hot keys.
- ``asof_join_union`` (here): tag + union + partitioned window with
  last(ignorenulls). Cost is one shuffle on the key and one sort per
  partition — LINEAR in rows regardless of per-key history length.
  This is the 100 TB shape (and the standard streaming-friendly
  formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    right_tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the matching right row for the same
    key: with ``direction='backward'`` (default) the greatest
    ``right_ts`` <= ``left_ts``; with ``direction='forward'`` the
    smallest ``right_ts`` >= ``left_ts``; with ``direction='nearest'``
    whichever of the two is closer in time (pandas merge_asof parity).
    ``allow_exact_matches=False`` makes every comparison strict
    (< / >), exactly as in pandas. ``tolerance`` (a Column — e.g.
    ``F.expr("INTERVAL 7 DAYS")`` for timestamps or ``F.lit(5)`` for
    numeric time axes) rejects matches farther than that from the left
    timestamp, again as in pandas.

    Ties on right_ts resolve via ``right_tiebreak`` — greatest for
    backward, smallest for forward (the mirror image) — which is
    REQUIRED: an implicit fallback (e.g. monotonically_increasing_id)
    varies with partitioning, so the same input could match different
    right rows run-to-run — breaking the engine's determinism contract.
    ``how='left'`` keeps unmatched left rows with null right values.
    """
    if right_tiebreak is None:
        raise ValueError(
            "right_tiebreak is required: as-of tie resolution must be "
            "deterministic (pass a unique right-side column, or derive "
            "one, e.g. xxhash64 over the carried value columns)"
        )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if how not in ("inner", "left"):
        # validated like direction — an unknown value silently behaving
        # as a left join is the worse failure mode
        raise ValueError(f"how must be inner|left, got {how!r}")
    clash = set(right_values) & set(left.columns)
    if clash:
        # pandas merge_asof suffixes _x/_y here; this engine's contract
        # is explicit aliasing, so fail loudly instead of emitting a
        # frame with duplicate names (ambiguous references, parquet
        # write failures) or silently renaming
        raise ValueError(
            f"right_values {sorted(clash)} collide with left columns; "
            "alias them on the right frame before the join"
        )
    backward = direction == "backward"
    nearest = direction == "nearest"
    strict = not allow_exact_matches
    # The matched right row travels as ONE struct (__matchts + every
    # value column), filled with a single last/first(ignorenulls) —
    # never one fill per value column, which would stitch values from
    # DIFFERENT right rows whenever a right row holds a NULL in one
    # column (and, under tolerance, could surface a stale column from
    # outside the window). pandas merge_asof semantics: the matched
    # ROW's values verbatim, NULLs included.
    rv = ["__matchts"] + list(right_values)
    rv_src = {c: F.col(c) for c in right_values}
    rv_type = {c: right.schema[c].dataType for c in right_values}
    rv_src["__matchts"] = F.col(right_ts)
    rv_type["__matchts"] = right.schema[right_ts].dataType
    # Position at equal ts decides whether exact matches land inside a
    # leg's frame. Backward leg (preceding->current, last): inclusive
    # wants right BEFORE left (_ob: right 0, left 1), strict wants
    # right AFTER left so equal-ts rows fall outside the frame.
    # Forward leg (current->following, first): the mirror image.
    # The two legs therefore carry their own ordering columns; same
    # key partitioning, so nearest pays one exchange and (at most) two
    # sorts.
    lb_ord, rb_ord = (0, 1) if strict else (1, 0)
    lf_ord, rf_ord = (1, 0) if strict else (0, 1)
    lcols = left.columns
    # The tiebreak keeps its OWN type: an unconditional cast('long')
    # truncated fractional tiebreaks to EQUAL values (recreating the
    # nondeterminism the mandatory parameter exists to prevent) and
    # nulled string tiebreaks under non-ANSI sessions.
    tb_type = right.schema[right_tiebreak].dataType
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(lb_ord).alias("_ob"),
        F.lit(lf_ord).alias("_of"),
        F.lit(None).cast(tb_type).alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rv_type[c]).alias(f"_rv_{c}") for c in rv],
    )
    # NULL-timestamp right rows have no position on the time axis and
    # can never be as-of matches — pandas merge_asof raises on null
    # keys; this composite EXCLUDES them (they would otherwise sort
    # nulls-first INSIDE the window frames and surface as phantom
    # matches).
    r = right.where(F.col(right_ts).isNotNull()).select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(rb_ord).alias("_ob"),
        F.lit(rf_ord).alias("_of"),
        F.col(right_tiebreak).alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[rv_src[c].alias(f"_rv_{c}") for c in rv],
    )
    # one struct per row: non-null exactly on right rows (a struct of
    # possibly-null fields is itself non-null), so ignorenulls fills
    # pick whole matched rows atomically
    u = l.unionByName(r).withColumn(
        "_rvs",
        F.when(
            F.col("_side") == 0,
            F.struct(*[F.col(f"_rv_{c}").alias(c) for c in rv]),
        ),
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_ob", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_of", "_tb")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # backward: right ties sort _tb ASC and last() takes the greatest;
    # forward: _tb ASC and first() takes the smallest
    if backward:
        carried = u.withColumn(
            "_asof", F.last("_rvs", ignorenulls=True).over(wb)
        )
    elif direction == "forward":
        carried = u.withColumn(
            "_asof", F.first("_rvs", ignorenulls=True).over(wf)
        )
    else:
        # nearest: both legs over ONE exchange (two sorts at most),
        # then a per-row choice. In the inclusive form the backward leg
        # absorbs exact-ts matches (distance 0, which always wins);
        # equidistant candidates resolve BACKWARD (documented).
        both = u.withColumn(
            "_b", F.last("_rvs", ignorenulls=True).over(wb)
        ).withColumn("_f", F.first("_rvs", ignorenulls=True).over(wf))
        b_ts = F.col("_b").getField("__matchts")
        f_ts = F.col("_f").getField("__matchts")
        use_b = b_ts.isNotNull() & (
            f_ts.isNull()
            | ((F.col("_ts") - b_ts) <= (f_ts - F.col("_ts")))
        )
        carried = both.withColumn(
            "_asof", F.when(use_b, F.col("_b")).otherwise(F.col("_f"))
        )
    carried = carried.where(F.col("_side") == 1)
    # a NULL-timestamp LEFT row has no position either: it sorts
    # nulls-first, where the forward/nearest frame would hand it the
    # partition's earliest right row — gate its match away (backward
    # gets this for free: nothing precedes the first sort position)
    carried = carried.withColumn(
        "_asof", F.when(F.col("_ts").isNotNull(), F.col("_asof"))
    )
    if tolerance is not None:
        m = F.col("_asof").getField("__matchts")
        dist = F.when(m >= F.col("_ts"), m - F.col("_ts")).otherwise(
            F.col("_ts") - m
        )
        within = m.isNotNull() & (dist <= tolerance)
        carried = carried.withColumn(
            "_asof", F.when(within, F.col("_asof"))
        )
    out = carried.select(
        *lcols,
        *[
            F.col("_asof").getField(c).alias(c)
            for c in right_values
        ],
        F.col("_asof").isNotNull().alias("_matched"),
    )
    if how == "inner":
        # matched = a right ROW was found (within tolerance), NOT
        # "first value column non-null" — a genuine match whose value
        # happens to be NULL must survive an inner as-of join
        out = out.where(F.col("_matched"))
    return out.drop("_matched")
