"""Input-parallelism repair for compute-heavy operators.

Spark sizes scan partitions by bytes (spark.sql.files.maxPartitionBytes,
default 128 MB), which is right when the expensive work IS the scan.
For operators whose per-row compute dwarfs the read — md5 shingle
chains, MinHash signatures, winnowing — a corpus that fits in a couple
of splits serializes that compute onto a couple of cores: at fixture
scale the whole documents table reads as ONE split, so the dominant
stage of every shingle-based query ran 1-of-32 cores (measured: the
minhash shingle stage alone ~3 s single-task at sf0.1).

``spread_small_input`` repartitions ONLY when the scan came back with
fewer splits than the session's default parallelism. On a production
cluster reading 100 TB the input has orders of magnitude more splits
than cores and this is a no-op — no extra shuffle, no plan change; the
repartition fires exactly in the small-input regime where the shuffle
it introduces is by definition cheap (the input is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism iff its current partition count is lower. Spark's
    round-robin repartition sorts within partitions first, so the
    result is deterministic under task retry."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
