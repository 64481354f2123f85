"""Graph-analytics queries over fact-derived edge lists.

The flagship is a CCNet/RefinedWeb-style source-rank prior: PageRank
over the nation-to-nation trade graph derived from the TPC-H facts
(the stand-in for a domain link graph — the testdata documents table
has no URL column, so the fact join provides the realistic
edge-aggregation workload). The oracle replays every power-iteration
round as an unrolled CTE chain, so the whole thing — edge
aggregation, out-weight normalization, three damped rounds — is
differentially checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc2dataset_spark.operators.graph import pagerank
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table

_PR_DAMPING = 0.85
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled power iteration: one CTE per round, same IEEE ops in
    the same order as operators/graph.py (only summation order can
    differ, bounded by in-degree ulps — killed by the 6-dp round)."""
    ctes = [
        """edges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem
      JOIN orders    ON l_orderkey  = o_orderkey
      JOIN customer  ON o_custkey   = c_custkey
      JOIN supplier  ON l_suppkey   = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY cn.n_name, sn.n_name
    )""",
        """norm AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM edges
    )""",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT nodes.id,
             (1.0 - {_PR_DAMPING}) / nn.n
             + {_PR_DAMPING} * COALESCE(SUM(r{i - 1}.rank * norm.p), 0.0)
               AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN norm ON norm.dst = nodes.id
      LEFT JOIN r{i - 1} ON r{i - 1}.id = norm.src
      GROUP BY nodes.id, nn.n
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT id AS nation, round(rank, 6) AS pagerank FROM r{_PR_ITERS}"
    )


@query(
    "graph_pagerank_trade",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "llm"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 3 rounds) over the customer-nation →
    supplier-nation trade graph.

    Scale shape: the dominant cost is the edge build — a fact-fact
    join (lineitem ⋈ orders on the order key) with all four dims
    broadcast, collapsed by one (src, dst) groupBy with map-side
    partial aggregation; the corpus-scale rows die there. The power
    iteration then runs on the |nations|²-bounded aggregated graph
    (joins AQE-broadcast). On a real domain graph the same plan holds
    with |domains| ~ 10⁷ aggregated edges — still a rounding error
    next to the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(
            F.col("cust_nation").alias("src"), F.col("supp_nation").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    ranks = pagerank(edges, damping=_PR_DAMPING, iters=_PR_ITERS)
    return ranks.select(
        F.col("id").alias("nation"), F.round("rank", 6).alias("pagerank")
    )


def _pagerank_brands_oracle() -> str:
    """Unrolled sum-preserving power iteration over the supplier ->
    brand supply graph. Brands never have out-edges, so every round a
    real dangling mass respreads uniformly — the variant actually
    changes the answer here, unlike the trade graph where every
    nation has out-edges."""
    ctes = [
        """edges AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS src, p_brand AS dst,
             CAST(SUM(l_quantity) AS DOUBLE) AS w
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY l_suppkey, p_brand
    )""",
        """norm AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM edges
    )""",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "srcs AS (SELECT DISTINCT src AS id FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""dang{i} AS (
      SELECT COALESCE(SUM(rank), 0.0) AS m FROM r{i - 1}
      WHERE id NOT IN (SELECT id FROM srcs)
    )"""
        )
        ctes.append(
            f"""r{i} AS (
      SELECT nodes.id,
             (1.0 - {_PR_DAMPING}) / nn.n
             + {_PR_DAMPING} * (COALESCE(SUM(r{i - 1}.rank * norm.p), 0.0)
                                + dang{i}.m / nn.n) AS rank
      FROM nodes CROSS JOIN nn CROSS JOIN dang{i}
      LEFT JOIN norm ON norm.dst = nodes.id
      LEFT JOIN r{i - 1} ON r{i - 1}.id = norm.src
      GROUP BY nodes.id, nn.n, dang{i}.m
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, round(rank, 6) AS pagerank FROM r{_PR_ITERS}
    ORDER BY pagerank DESC, id LIMIT 100"""
    )


@query(
    "graph_pagerank_brands",
    oracle=_pagerank_brands_oracle(),
    tags=("graph", "pagerank", "llm"),
)
def graph_pagerank_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum-preserving PageRank (redistribute_dangling=True) over the
    supplier -> brand supply graph: brands are pure sinks, so most of
    the rank vector parks on dangling nodes each round and the
    uniform respread is load-bearing — the variant test the trade
    graph cannot provide. Top-100 by rank (TakeOrderedAndProject;
    suppliers have no in-edges, so their ranks tie and the id
    tiebreak keeps the head deterministic).

    Scale: the edge build is one fact scan + broadcast dim join +
    (src, dst) groupBy; the iteration runs on the |suppliers x
    brands|-bounded aggregated graph. The UNBOUNDED-graph physical
    path (shuffle-hash loop joins, graph-sized partitioning,
    per-round persist) is exercised by the supplier -> part graph in
    tests/test_graph.py — at sf0.1 that graph is ~590k edges, nearly
    fact-sized, and belongs in a job, not a 118-query benchmark."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    edges = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("l_suppkey").alias("src_key"),
            F.col("p_brand").alias("dst"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("w"))
        # node ids must share one type across the bipartite union; the
        # cast runs on the aggregated rows, not per fact row
        .select(
            F.col("src_key").cast("string").alias("src"), "dst", "w"
        )
    )
    ranks = pagerank(
        edges,
        damping=_PR_DAMPING,
        iters=_PR_ITERS,
        redistribute_dangling=True,
    )
    return (
        ranks.select("id", F.round("rank", 6).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "id")
        .limit(100)
    )
