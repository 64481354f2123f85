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
) -> DataFrame:
    """For each left row, attach the matching right row for the same
    key: with ``direction='backward'`` (default) the greatest
    ``right_ts`` <= ``left_ts``; with ``direction='forward'`` the
    smallest ``right_ts`` >= ``left_ts`` (pandas merge_asof parity;
    both directions include exact-timestamp matches).

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
    backward = direction == "backward"
    nearest = direction == "nearest"
    # nearest needs the matched right_ts of both candidates to compare
    # distances, so it is carried as an internal extra value column
    rv = list(right_values) + (["__matchts"] if nearest else [])
    rv_src = {c: F.col(c) for c in right_values}
    rv_type = {c: right.schema[c].dataType for c in right_values}
    if nearest:
        rv_src["__matchts"] = F.col(right_ts)
        rv_type["__matchts"] = right.schema[right_ts].dataType
    # ordering position at equal ts: backward (and nearest, whose
    # backward leg absorbs exact matches at distance 0) scans
    # preceding->current with last(), so right rows must sort BEFORE
    # left; pure forward scans current->following with first(), so
    # right rows must sort AFTER
    lcols = left.columns
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0 if direction == "forward" else 1).alias("_ord"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rv_type[c]).alias(f"_rv_{c}") for c in rv],
    )
    tb = F.col(right_tiebreak).cast("long")
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(1 if direction == "forward" else 0).alias("_ord"),
        tb.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[rv_src[c].alias(f"_rv_{c}") for c in rv],
    )
    u = l.unionByName(r)
    order = ["_ts", "_ord", "_tb"]
    wb = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # backward: right ties sort _tb ASC and last() takes the greatest;
    # forward: _tb ASC and first() takes the smallest
    if backward:
        carried = u.select(
            "*",
            *[
                F.last(f"_rv_{c}", ignorenulls=True).over(wb).alias(f"_asof_{c}")
                for c in right_values
            ],
        )
    elif direction == "forward":
        carried = u.select(
            "*",
            *[
                F.first(f"_rv_{c}", ignorenulls=True).over(wf).alias(f"_asof_{c}")
                for c in right_values
            ],
        )
    else:
        # nearest: both legs over ONE exchange+sort (same partitioning
        # and ordering, only the frames differ), then a per-row choice.
        # The backward leg includes exact-ts matches (distance 0, which
        # always wins), so the forward leg only needs strictly-later
        # rows; equidistant candidates resolve BACKWARD (documented).
        both = u.select(
            "*",
            *[
                F.last(f"_rv_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}")
                for c in rv
            ],
            *[
                F.first(f"_rv_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}")
                for c in rv
            ],
        )
        b_ts, f_ts = F.col("_b___matchts"), F.col("_f___matchts")
        use_b = b_ts.isNotNull() & (
            f_ts.isNull()
            | ((F.col("_ts") - b_ts) <= (f_ts - F.col("_ts")))
        )
        carried = both.select(
            "*",
            *[
                F.when(use_b, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_f_{c}"))
                .alias(f"_asof_{c}")
                for c in right_values
            ],
        )
    carried = carried.where(F.col("_side") == 1)
    out = carried.select(
        *lcols, *[F.col(f"_asof_{c}").alias(c) for c in right_values]
    )
    if how == "inner":
        out = out.where(F.col(right_values[0]).isNotNull())
    return out
