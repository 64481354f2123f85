"""Join strategies for scale (SURVEY.md §2.3 + §4 skew/balance row).

Catalyst + AQE cover the default cases (broadcast below threshold,
skew-join splitting when adaptive). These operators cover the two
patterns that still need explicit engineering at 100 TB:

- ``salted_join``: deterministic key salting for joins where ONE hot
  key would otherwise pin a whole executor (AQE skew handling splits
  partitions, but a single key's rows still hash to one reducer for
  the build side; salting splits the key itself).
- ``write_bucketed`` / co-located joins: pre-bucket both fact tables
  on the join key so repeated joins are exchange-free (the shuffle is
  paid once at write time, amortized over every downstream join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys split across
    ``salt_buckets`` reducers.

    The left (large/skewed) side gets a deterministic salt — from
    ``salt_from`` (a left column with per-row entropy, e.g. a unique
    event id: the RIGHT choice whenever one exists) or, by default,
    from the full row hash. The full-row default DEGENERATES when the
    hot key's rows are identical or low-entropy (e.g. the frame was
    projected down to the join key, or boilerplate duplicates): every
    copy hashes to ONE salt bucket, the straggler remains, and the
    ``salt_buckets``-fold right-side explode is paid for nothing —
    pass ``salt_from`` for those shapes (join_salted_skew salts from
    event_id for exactly this reason). The right side is exploded
    ``salt_buckets``-fold so every (key, salt) pair finds its match.
    Right-side blowup is the price — use only when the right side is
    small-ish but above the broadcast threshold, or when AQE's split
    isn't enough.
    Result == plain ``left.join(right, key, how)`` row-for-row for
    ``how`` in ('inner', 'left', 'left_semi', 'left_anti') — the hows
    where unmatched RIGHT rows never surface. 'right'/'full' would
    emit every unmatched right row ``salt_buckets`` times (one per
    exploded copy), silently inflating downstream counts, so they are
    rejected rather than quietly wrong.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti",
                   "leftsemi", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins only; "
            f"how={how!r} would duplicate unmatched right rows "
            f"{salt_buckets}x (explode the LEFT side and salt the "
            f"right if you need right-outer semantics)"
        )
    salt_src = (
        [F.col(salt_from)]
        if salt_from is not None
        else [F.col(c) for c in left.columns]
    )
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")),
    )
    return l_salted.join(r_salted, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Joins and
    aggregations on ``bucket_key`` between tables bucketed with the
    same count run with ZERO exchanges (verified by
    tests/test_joins_scale.py asserting no Exchange in the plan)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key —
    exchange-free by construction."""
    return spark.table(left_table).join(spark.table(right_table), key)
