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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cc2dataset_spark.functions.numeric import RATIO6_SQL
from cc2dataset_spark.operators.graph import pagerank
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table

_PR_DAMPING = 0.85
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled power iteration: one CTE per round, same IEEE ops in
    the same order as operators/graph.py (only summation order can
    differ, bounded by in-degree ulps — ABSORBED, not killed, by the
    6-dp round: a rank landing within an ulp of a 0.5e-6 boundary
    could still flip between engines, and round(double, 6) itself has
    the Spark-shortest-repr vs DuckDB-binary divergence at exact
    halves (functions/numeric.py). Residual, not zero, risk —
    accepted because the fixture graphs' ranks sit far from 6-dp
    boundaries across all three scales and re-deriving the loop in
    scaled integers would cost the oracle its direct IEEE parity;
    if a sweep ever reddens here, resync each round at 9 dp in both
    engines and final-round via floor(x*1e6 + 0.5))."""
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


_TRI_COEFF = RATIO6_SQL.format(
    num="2 * COALESCE(tn.n_triangles, 0)",
    den="deg.degree * (deg.degree - 1)",
)


@query(
    "graph_triangle_counts",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id % 89 AS a,
             (doc_id * 31 + doc_id // 89) % 89 AS b,
             (doc_id * 17 + 5) % 89 AS c
      FROM documents
    ), mention AS (
      SELECT a AS x, b AS y FROM raw
      UNION ALL SELECT b, c FROM raw
      UNION ALL SELECT a, c FROM raw
    ), e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM mention WHERE x <> y
    ), deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node
    ), tri AS (
      SELECT e1.u AS ta, e1.v AS tb, e2.v AS tc
      FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    ), tn AS (
      SELECT node, COUNT(*) AS n_triangles
      FROM (SELECT UNNEST([ta, tb, tc]) AS node FROM tri)
      GROUP BY node
    )
    SELECT deg.node, deg.degree,
           COALESCE(tn.n_triangles, 0) AS n_triangles,
           CASE WHEN deg.degree >= 2 THEN {_TRI_COEFF} END
             AS clustering_coeff
    FROM deg LEFT JOIN tn ON deg.node = tn.node
    """,
    tags=("graph", "triangles"),
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting + local clustering coefficient over
    a deterministic doc-derived edge stream (each document contributes
    one pseudo-random triangle over an 89-node space, so triangles
    exist at every scale factor and the duplicate-mention volume — not
    the distinct graph — grows with sf, exactly like repeated
    hyperlinks on a web graph).

    Spark side enumerates each triangle ONCE via DEGREE ORIENTATION
    (Chiba–Nishizeki / Cohen's MapReduce form): orient every
    undirected edge from its (degree, id)-smaller endpoint to the
    larger, pair out-neighbors per source, and close the wedge with a
    join back to the oriented edge set. Out-degree under this
    orientation is O(sqrt(m)) regardless of hub size, so the wedge
    join's fan-out is bounded at ~m^1.5 total — a hub of degree d in
    the naive all-neighbors join contributes d^2 wedges; here it
    contributes only pairs among its HIGHER-ordered neighbors. The
    oracle enumerates the same triangles by the simpler (u < v < w)
    total order — same set, hub-sensitive plan DuckDB can afford at
    fixture scale.

    The count/coefficient columns are integer-exact; the coefficient
    2T/(d(d-1)) routes through ratio_round6 (numerator 2T is bounded
    by n^2 here, far under the 2^53/2e6 ceiling), NULL for degree<2
    nodes on both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.select(
        (F.col("doc_id") % 89).alias("a"),
        ((F.col("doc_id") * 31 + F.expr("doc_id div 89")) % 89).alias("b"),
        ((F.col("doc_id") * 17 + 5) % 89).alias("c"),
    )
    mention = (
        raw.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(raw.select(F.col("b").alias("x"), F.col("c").alias("y")))
        .unionAll(raw.select(F.col("a").alias("x"), F.col("c").alias("y")))
    )
    # The edge and degree frames feed 4+ consumers each (degree calc,
    # orientation annotation, both wedge sides, the closing join, the
    # final report); without pinning, Catalyst re-executes the whole
    # mention-union + distinct chain per consumer (measured: 66
    # exchanges vs 12 pinned). Both frames are graph-sized (edges,
    # nodes), not corpus-sized. Released by the next query's build via
    # caching.release_all().
    from pyspark.storagelevel import StorageLevel

    from cc2dataset_spark import caching

    e = caching.track(
        mention.where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = caching.track(
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Orient u->v when (deg(u), u) < (deg(v), v); ties on degree break
    # by id, so the orientation is a strict total order (acyclic) and
    # every triangle closes exactly once.
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    annotated = e.join(du, "u").join(dv, "v")
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    # oriented feeds three consumers (both wedge sides + the closer)
    oriented = caching.track(
        annotated.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias(
                "dst_deg"
            ),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    o1 = oriented.select(
        F.col("src").alias("s"),
        F.col("dst").alias("p"),
        F.col("dst_deg").alias("pd"),
    )
    o2 = oriented.select(
        F.col("src").alias("s"),
        F.col("dst").alias("q"),
        F.col("dst_deg").alias("qd"),
    )
    wedges = o1.join(o2, "s").where(
        F.struct("pd", "p") < F.struct("qd", "q")
    )
    closer = oriented.select(
        F.col("src").alias("p"), F.col("dst").alias("q")
    )
    tri = wedges.join(closer, ["p", "q"]).select("s", "p", "q")
    tn = (
        tri.select(
            F.explode(F.array("s", "p", "q")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    from cc2dataset_spark.functions.numeric import ratio_round6

    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    return deg.join(tn, "node", "left").select(
        "node",
        "degree",
        t.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            ratio_round6(
                F.lit(2) * t, F.col("degree") * (F.col("degree") - 1)
            ),
        ).alias("clustering_coeff"),
    )


# denominator = total nodes, derived FROM THE HISTOGRAM (sum of
# bucket counts over <= 64 rows) — a separate tot branch re-executed
# the whole corpus-scale edge/degree chain a second time
_DEG_SHARE = RATIO6_SQL.format(
    num="n_nodes", den="SUM(n_nodes) OVER ()"
)


@query(
    "graph_degree_distribution",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id % 293 AS a,
             (doc_id * 31 + 7) % 293 AS b,
             100 + (doc_id * 13) % 7 AS h
      FROM documents
    ), mention AS (
      SELECT a AS x, b AS y FROM raw
      UNION ALL SELECT a, h FROM raw
    ), e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM mention WHERE x <> y
    ), deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node
    ), binned AS (
      SELECT CAST(length(bin(degree)) AS BIGINT) AS log2_bucket,
             node, degree
      FROM deg
    ), hist AS (
      SELECT log2_bucket,
             COUNT(*) AS n_nodes,
             MIN(degree) AS min_degree,
             MAX(degree) AS max_degree
      FROM binned GROUP BY log2_bucket
    )
    SELECT log2_bucket,
           CAST(1 << (log2_bucket - 1) AS BIGINT) AS bucket_min_degree,
           n_nodes,
           min_degree,
           max_degree,
           {_DEG_SHARE} AS node_share
    FROM hist
    """,
    tags=("graph", "profiling", "stats"),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-binned degree histogram of the link graph — the power-law
    profile that tells a 100 TB graph job what it is about to shuffle:
    a heavy log-log tail means hub keys, which means the degree
    orientation in graph_triangle_counts and the salting in
    join_salted_skew are load-bearing, and this table is the evidence.
    Buckets are powers of two: bucket k holds degrees in
    [2^(k-1), 2^k), keyed by the INTEGER bit length of the degree —
    length(bin(degree)) is identical in Spark and DuckDB, so the
    binning needs no float log2 (whose libm rounding at exact powers
    of two differs between engines — the classic histogram edge bug).

    The edge construction is deliberately HUB-SKEWED (each document
    contributes one sparse edge over a 293-node space plus one edge
    into a 7-node hub set), so the histogram genuinely spans buckets
    — a star-plus-mesh shape, the toy version of a real web graph's
    power law; the triangle query's near-regular construction would
    collapse this histogram to one row. Node shares via the exact
    rational; the histogram is bit-length-bucket cardinality — at
    most 64 rows no matter the graph.

    Plan: the distinct edge set and the node-keyed degree count are
    the corpus-scale stages (both map-side combined); the histogram
    aggregate runs on node-count rows and the total is a 1-row
    broadcast."""
    from cc2dataset_spark.functions.numeric import ratio_round6

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.select(
        (F.col("doc_id") % 293).alias("a"),
        ((F.col("doc_id") * 31 + 7) % 293).alias("b"),
        (F.lit(100) + (F.col("doc_id") * 13) % 7).alias("h"),
    )
    mention = raw.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).unionAll(raw.select(F.col("a").alias("x"), F.col("h").alias("y")))
    e = (
        mention.where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    binned = deg.select(
        F.length(F.bin(F.col("degree"))).cast("bigint").alias(
            "log2_bucket"
        ),
        "node",
        "degree",
    )
    # Histogram FIRST (<= 64 rows), total as a window sum OVER the
    # histogram: a tot = deg.agg(count) branch re-executed the whole
    # corpus-scale edge/degree chain a second time (measured: 16 scans
    # of documents in the static plan with only partial AQE reuse).
    # The unpartitioned window is the documented bounded-frame
    # exception (same class as curate_unimax_budget's).
    hist = binned.groupBy("log2_bucket").agg(
        F.count("*").alias("n_nodes"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "log2_bucket",
        F.expr("CAST(1 << (log2_bucket - 1) AS BIGINT)").alias(
            "bucket_min_degree"
        ),
        "n_nodes",
        "min_degree",
        "max_degree",
        ratio_round6(
            F.col("n_nodes"), F.sum("n_nodes").over(w)
        ).alias("node_share"),
    )
