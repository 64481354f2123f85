"""Distributed frequency sketches (SURVEY.md §2 custom-operator row:
"a novel sketch" — no reference implementation; the scale shape a
training-data pipeline uses for heavy-hitter detection over columns
too wide to count exactly).

Count-Min (Cormode & Muthukrishnan, 2005) as pure DataFrame ops:

- build: ONE scan of the input — each row explodes to d (depth) hash
  cells, then groupBy(depth, bucket).count() with map-side partial
  aggregation, so the shuffle carries at most d*width rows per
  partition regardless of input size. The sketch itself is a tiny
  d x width table (broadcastable).
- estimate: min over the d counters addressed by the key's hashes —
  a broadcast join of the sketch against the queried keys.

Hashing is md5-based and engine-neutral (hex-digit positions via
instr over a constant alphabet — no hex->int builtin is shared by
Spark and DuckDB), so estimates are DuckDB-oracle-checkable and
reproducible across engines. Count-Min guarantees
estimate >= true count, with overestimates only from bucket
collisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _bucket(key: Column, depth_idx: int, width: int = 256) -> Column:
    """Bucket in [0, width): md5 of the salted key, first two hex
    digits -> 0..255 (width must divide 256). Engine-neutral: the same
    expression is expressible in DuckDB with strpos/substr."""
    h = F.md5(F.concat(F.lit(f"{depth_idx}|"), key))
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2) % width


def countmin_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(depth_idx, bucket, counter) — the sketch table, one input scan."""
    cells = df.select(
        F.posexplode(
            F.array(
                *[_bucket(F.col(key_col), j, width) for j in range(depth)]
            )
        ).alias("depth_idx", "bucket")
    )
    return cells.groupBy("depth_idx", "bucket").agg(
        F.count("*").alias("counter")
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per key: min over the d addressed counters (missing cell -> 0).
    The sketch is tiny (<= depth*width rows) and broadcast; keys are
    never shuffled."""
    addressed = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[_bucket(F.col(key_col), j, width) for j in range(depth)]
            )
        ).alias("depth_idx", "bucket"),
    )
    joined = addressed.join(
        F.broadcast(sketch), ["depth_idx", "bucket"], "left"
    ).select(key_col, F.coalesce("counter", F.lit(0)).alias("counter"))
    return joined.groupBy(key_col).agg(
        F.min("counter").alias("cm_estimate")
    )


def misra_gries_candidates(
    items: DataFrame, col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summary (Misra & Gries 1982) over a
    single-column item stream: returns a DISTINCT superset of every
    NON-NULL item whose GLOBAL frequency exceeds n/k, keeping the
    counter dict bounded by ``k`` + one Arrow batch's distinct count
    per partition — the prune runs after each batch merge, so the
    transient bound is batch-sized, not k (size ``k`` against executor
    memory with the ~10k-row default Arrow batch in mind, or lower
    spark.sql.execution.arrow.maxRecordsPerBatch for ultra-wide
    columns) — and never shuffling the stream. NULL items are
    EXCLUDED by contract (pandas value_counts drops them): a NULL
    group's frequency is a one-line exact aggregate if a caller needs
    it, and "heaviest item" questions are about values.

    Guarantee (why the superset is sound): within a partition holding
    n_i items, MG undercounts any item by at most n_i/(k+1), so an
    item with partition frequency > n_i/k survives that partition's
    summary. If an item's global frequency exceeds n/k = sum(n_i)/k,
    it must exceed n_i/k in at least one partition — hence every true
    global heavy hitter appears in the union of partition summaries.
    The candidate set is partitioning-dependent (up to k*partitions
    rows); callers MUST verify with an exact count pass — only the
    verified output is deterministic.

    Batched kernel: per Arrow batch, merge vectorized value_counts
    into the counter dict, then apply the standard batched decrement —
    subtract the (k+1)-th largest count m from every counter and drop
    the non-positive ones. Each such step removes >= (k+1)*m total
    mass while charging any single item only m, preserving the
    n_i/(k+1) undercount bound. The Python cost is one value_counts +
    one dict merge per batch, never per row.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    if k < 1:
        raise ValueError(f"misra_gries_candidates requires k >= 1, got {k}")

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for w, c in zip(vc.index, vc.to_numpy()):
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {w: c for w, c in counters.items() if c > m}
                counters = {w: c - m for w, c in counters.items()}
        yield pd.DataFrame({col: list(counters)})

    # output schema mirrors the INPUT column type (bigint keys stay
    # bigint — a hard-coded string schema would fail Arrow conversion
    # or silently change the type under the exact-count verify join)
    field = items.schema[col]
    schema = StructType([StructField(col, field.dataType, True)])
    return items.select(col).mapInPandas(mg, schema).distinct()
