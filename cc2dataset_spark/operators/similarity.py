"""Similarity search over embedding columns (north-star; SURVEY.md §2.3
similarity-join row). Brute-force top-k is the exact baseline; the
SimHash-bucketed ANN variant is the subquadratic scale path (same shape
as IVF: restrict candidates to a bucket, rank within it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cc2dataset_spark.functions.vectors import (
    as_double_array,
    cosine_similarity,
    random_hyperplanes,
    simhash_signature,
)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Queries are broadcast (the small side by construction); the corpus
    is scanned once — a 1000-executor cluster ranks its own partitions
    and the per-query top-k merges via the window's partial
    WindowGroupLimit. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def simhash_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's SimHash
    bucket (8-bit default -> ~corpus/256 candidates per query), ranked
    exactly within the bucket. The join is an equi-join on the
    signature — shuffle-light and skew-free at any scale."""
    planes = random_hyperplanes(dim, n_bits, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
        simhash_signature(as_double_array(vec_col), planes).alias("sig"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
        simhash_signature(as_double_array(vec_col), planes).alias("sig"),
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest
    centroid (inverted list), search each query only in its n_probes
    closest lists.

    Centroids are a deterministic sample of the corpus itself (every
    corpus_size/n_lists-th vector by id) — at scale, replace with
    k-means centroids computed once and broadcast; the join shape is
    identical. Two broadcast joins + one window; the corpus is scanned
    once and shuffled once on list_id.
    """
    v = corpus.select(F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv"))
    # Deterministic pseudo-random centroid sample: the n_lists corpus
    # vectors with the smallest id-hashes, via orderBy().limit() — Spark
    # plans TakeOrderedAndProject (each partition keeps its own top
    # n_lists, the driver merges), so the whole corpus never funnels
    # through one task. The row_number window that assigns list ids then
    # runs over at most n_lists rows. (At real scale: k-means once,
    # broadcast the centroids; the join shape below is unchanged.)
    sampled = v.orderBy(F.xxhash64(F.col("cid")), F.col("cid")).limit(n_lists)
    w_tiny = Window.orderBy(F.xxhash64(F.col("cid")), F.col("cid"))
    centroids = (
        sampled.withColumn("list_id", F.row_number().over(w_tiny))
        .select("list_id", F.col("cv").alias("centroid"))
    )

    def best_lists(side: DataFrame, vcol: str, n: int) -> DataFrame:
        scored = side.crossJoin(F.broadcast(centroids)).select(
            *side.columns,
            "list_id",
            cosine_similarity(F.col(vcol), F.col("centroid")).alias("_cs"),
        )
        w = Window.partitionBy(*[c for c in side.columns if c.endswith("_id")]).orderBy(
            F.col("_cs").desc(), F.col("list_id")
        )
        return scored.withColumn("_r", F.row_number().over(w)).where(
            F.col("_r") <= n
        ).drop("_cs", "_r")

    assigned = best_lists(
        v.select(F.col("cid").alias("corpus_id"), F.col("cv")), "cv", 1
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    probed = best_lists(q, "qv", n_probes)
    scored = (
        assigned.join(probed, "list_id")
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("corpus_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def knn_label_vote(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-label classification with deterministic tie-breaks
    (highest vote count, then smallest label)."""
    topk = brute_force_topk(queries, corpus, k, vec_col, id_col)
    labeled = topk.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), label_col), "neighbor_id"
    )
    votes = labeled.groupBy("query_id", label_col).agg(F.count("*").alias("votes"))
    return votes.groupBy("query_id").agg(
        F.expr(f"max_by({label_col}, struct(votes, -{label_col}))").alias(
            "predicted_label"
        ),
        F.max("votes").alias("top_votes"),
    )
