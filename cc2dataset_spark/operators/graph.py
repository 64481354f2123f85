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
    big_graph_threshold: int = 200_000,
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

    from cc2dataset_spark import caching

    edges = caching.track(edges.persist(StorageLevel.MEMORY_AND_DISK))
    m = edges.count()
    p = (F.col(weight).cast("double") / F.sum(F.col(weight).cast("double")).over(
        Window.partitionBy(src)
    )).alias("_p")
    norm = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), p)
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    # Loop discipline for non-tiny graphs (components.py-style):
    # - joins pinned to shuffle-hash. Left to AQE, each round
    #   re-BROADCASTS the edge and rank frames; broadcasts are
    #   driver-built and only lazily GC'd, so iters x O(|E|) copies
    #   accumulate on the driver — measured: the ~80k-edge
    #   supplier->part graph OOMs a default-heap driver at sf0.1.
    # - loop frames repartitioned to a count sized to the graph, not
    #   to the corpus-sized session default (a 21k-row vector split 64
    #   ways is pure scheduling overhead — measured 21 s -> ~4 s).
    # - each round's rank vector persisted + materialized, previous
    #   round dropped: in the redistribution variant ranks feed BOTH
    #   the contribution join and the dangling aggregate, so an
    #   unpersisted chain re-evaluates round i-1 twice per round —
    #   2^iters subtree blowup.
    # The threshold is in EDGE rows (|nodes| <= 2|edges|, so one test
    # covers both); the hazard it guards is broadcast BYTES on the
    # driver, so it is deliberately generous — a 200k-row edge frame
    # is ~10 MB broadcast-built, still cheap, while the loop
    # discipline costs ~2 s of fixed per-round stage overhead on
    # local[32] that a tiny graph shouldn't pay.
    big = m > big_graph_threshold
    # The per-round persist is also load-bearing for SMALL graphs when
    # redistributing: ranks feeds both the contribution join and the
    # dangling aggregate, and an unpersisted dual-referenced chain
    # re-evaluates every earlier round twice per round (2^iters
    # stages — measured 15 s vs 3 s on the 25k-edge brand graph).
    persist_rounds = big or redistribute_dangling
    # r14 (VERDICT ask #5 — graph_pagerank_brands ran 36-43 JOBS per
    # execution): materializing each round with .count() spends a
    # whole scheduler round-trip per iteration plus every AQE stage of
    # the round's join chain as its own job. The persist ALONE already
    # prevents the 2^iters physical blowup — CacheManager substitutes
    # the InMemoryRelation into every downstream plan whether or not
    # it is materialized yet, so the final action computes each
    # round's cache once on demand, all inside ONE job's stage graph.
    # Eager materialization is kept where it is load-bearing: BIG
    # graphs (the unpersist-previous-round memory discipline needs a
    # materialization point to be meaningful across an unbounded
    # iteration budget) and long iteration budgets (the ANALYZED plan
    # of the dual-referenced redistribute chain still doubles per
    # round — fine at 2^4 copies of a tiny subtree, not at 2^20).
    eager_rounds = persist_rounds and (big or iters > 4)
    # norm and nodes are referenced every round; persist them in all
    # modes so a round costs its own joins, not a re-derivation of the
    # window/distinct chains (each a shuffle) from the edge cache.
    if big:
        sp = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        parts = max(8, min(sp, m // 50_000 + 1))
        norm = norm.repartition(parts, "_src")
        nodes = nodes.repartition(parts, "id")
    norm = caching.track(norm.persist(StorageLevel.MEMORY_AND_DISK))
    nodes = caching.track(nodes.persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    def _h(df: DataFrame) -> DataFrame:
        # Small-graph loop joins: the hinted side (ranks / contribs /
        # srcs — each bounded by the big-guard's edge count) gets an
        # EXPLICIT broadcast instead of waiting for AQE to discover it
        # per round (guide §3.1 "pick the strategy deliberately"): the
        # runtime join strategy is unchanged — AQE already picked
        # broadcast — but statically-planned broadcasts skip the
        # per-round shuffle-stage materialization + replan latency.
        # A/B (7 warm reps, anchor-normalized): brands median 4.36 s
        # @ anchor 1.77 hinted vs 7.11 s @ anchor 2.29 unhinted.
        return df.hint("shuffle_hash") if big else F.broadcast(df)

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    srcs = edges.select(F.col(src).alias("id")).distinct()
    if redistribute_dangling:
        srcs = caching.track(srcs.persist(StorageLevel.MEMORY_AND_DISK))
    prev: DataFrame | None = None
    for _ in range(iters):
        contribs = (
            norm.join(_h(ranks), norm._src == ranks.id)
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        inflow = F.coalesce("_in", F.lit(0.0))
        if redistribute_dangling:
            # classic variant: mass parked on no-out-edge nodes spreads
            # uniformly, keeping sum(rank) == 1. The dangling total is a
            # 1-row aggregate broadcast back — no driver action.
            dang = ranks.join(_h(srcs), "id", "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
            ranks_next = (
                nodes.join(_h(contribs), "id", "left")
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
            ranks_next = nodes.join(_h(contribs), "id", "left").select(
                "id",
                (
                    F.lit((1.0 - damping) / n) + F.lit(damping) * inflow
                ).alias("rank"),
            )
        if persist_rounds:
            ranks_next = caching.track(
                ranks_next.persist(StorageLevel.MEMORY_AND_DISK)
            )
            if eager_rounds:
                ranks_next.count()
                if prev is not None:
                    prev.unpersist()
                prev = ranks_next
        ranks = ranks_next
    if eager_rounds:
        # The final rank vector is materialized, so the loop's
        # scaffolding caches are dead weight for the caller — drop
        # them eagerly (a bench / test session calls pagerank dozens
        # of times). In the LAZY modes (small graphs, both variants)
        # nothing is materialized until the caller's action, so every
        # cache must survive it — they are all track()ed and released
        # between catalog queries via cc2dataset_spark.caching.
        for scaffold in (edges, norm, nodes):
            scaffold.unpersist()
        if redistribute_dangling:
            srcs.unpersist()
    return ranks
