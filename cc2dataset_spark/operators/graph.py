"""Graph analytics over fact-derived edge lists (scale extension; the
reference has no graph surface — its only graph-shaped step is exact
uid dedup, main.py:256. In a CC-scale corpus pipeline the canonical
use is domain ranking: CCNet/RefinedWeb-style source-quality priors
computed from the link graph, which this module expresses over any
(src, dst, weight) DataFrame).

PageRank is implemented as classic weighted power iteration, kept
entirely in DataFrame algebra:

    rank_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_t(u) * p(u,v)

with p(u,v) = w(u,v) / outweight(u). Dangling-node mass (nodes with no
out-edges) is absorbed by default — the variant expressible
identically in one SQL statement per iteration, so the DuckDB
correctness oracle can replay every round bit-for-close (sums of
<= in-degree doubles; only 6-dp-rounded ranks are emitted).
``redistribute_dangling=True`` gives the classic sum-preserving
variant (dangling mass spreads uniformly each round, as a 1-row
broadcast aggregate — NumPy-verified in tests/test_graph.py).

Scale shape: the expensive part of a real domain-rank job is building
the AGGREGATED edge list from the fact data (a fact-fact join + one
(src, dst) groupBy — exactly the shape Catalyst already optimizes);
the iteration then runs over edges ~ |domains|^2-bounded rows, orders
of magnitude smaller than the corpus. Each round is one keyed join +
one groupBy on the small graph; AQE broadcasts the rank side when it
fits. Rounds are O(iters) with NO lineage blowup concern at the
default 3 iterations (plan depth grows linearly; localCheckpoint would
cost more than it saves on a small aggregated graph — contrast
operators/components.py where the loop is unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 3,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(id, rank) for every node in ``edges`` after ``iters`` rounds of
    weighted power iteration starting from the uniform vector.

    ``edges`` must already be aggregated (one row per (src, dst));
    duplicate edges would double-count weight. Out-edge normalization
    uses a window sum partitioned by src — one shuffle, no join, and
    integer-valued weights stay exact under any summation order (every
    partial sum < 2^53), so both engines derive identical transition
    probabilities.

    ``n = nodes.count()`` is a driver-side scalar action (graph
    cardinality, same class as the IVF centroid seed in
    operators/similarity.py) — the node SET never leaves the cluster.

    The aggregated edge list is persisted before iterating: its
    lineage is typically the corpus-scale fact join, and ``norm``,
    ``nodes``, and every iteration's contribution join all reference
    it — without the persist the physical plan replicates the whole
    edge-build subtree ~(2*iters+2)x (observed in .explain on the
    registered trade query). The cached frame itself is small by the
    aggregation contract.
    """
    from pyspark.storagelevel import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    p = (F.col(weight).cast("double") / F.sum(F.col(weight).cast("double")).over(
        Window.partitionBy(src)
    )).alias("_p")
    norm = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), p)
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    srcs = edges.select(F.col(src).alias("id")).distinct()
    for _ in range(iters):
        contribs = (
            norm.join(ranks, norm._src == ranks.id)
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        inflow = F.coalesce("_in", F.lit(0.0))
        if redistribute_dangling:
            # classic variant: mass parked on no-out-edge nodes spreads
            # uniformly, keeping sum(rank) == 1. The dangling total is a
            # 1-row aggregate broadcast back — no driver action.
            dang = ranks.join(srcs, "id", "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
            ranks = (
                nodes.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "id",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping) * (inflow + F.col("_dang") / n)
                    ).alias("rank"),
                )
            )
        else:
            ranks = nodes.join(contribs, "id", "left").select(
                "id",
                (
                    F.lit((1.0 - damping) / n) + F.lit(damping) * inflow
                ).alias("rank"),
            )
    return ranks
