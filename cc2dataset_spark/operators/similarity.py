"""Similarity search over embedding columns (north-star; SURVEY.md §2.3
similarity-join row). Brute-force top-k is the exact baseline; the
SimHash-bucketed ANN variant is the subquadratic scale path (same shape
as IVF: restrict candidates to a bucket, rank within it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cc2dataset_spark.functions.hashes import md5_number_lower
from cc2dataset_spark.functions.vectors import (
    as_double_array,
    cosine_similarity,
    random_hyperplanes,
    simhash_signature,
)


def _ranked_topk(scored, k: int, order, out_cols) -> DataFrame:
    """Shared per-query top-k tail: rank within query_id under the
    given order (which must end in the neighbor_id ASC tie-break so
    results are deterministic and oracle-replayable), keep rank <= k.
    One definition so the tie-break contract cannot drift between the
    five ANN variants."""
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out_cols)
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
    return _ranked_topk(
        scored,
        k,
        order=(F.col("cos_sim").desc(), F.col("neighbor_id").asc()),
        out_cols=("query_id", "neighbor_id", "cos_sim", "rank"),
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
    signature — shuffle-light and skew-free at any scale.

    ``dim`` must match the actual embedding width, enforced per row
    with a raise_error guard: a mismatch NULL-pads (or truncates) the
    hyperplane zip, every dot product goes NULL, every bit falls to
    the when-otherwise 0, and ALL signatures collapse to 0 — the join
    silently degenerates to the full quadratic cross product (the
    failure mode pq_codebook's fit-time check exists for)."""
    planes = random_hyperplanes(dim, n_bits, seed)

    def checked(v):
        from cc2dataset_spark.functions.vectors import checked_dim

        return checked_dim(v, dim, "simhash_ann_topk")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
        simhash_signature(
            checked(as_double_array(vec_col)), planes
        ).alias("sig"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
        simhash_signature(
            checked(as_double_array(vec_col)), planes
        ).alias("sig"),
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
    return _ranked_topk(
        scored,
        k,
        order=(F.col("cos_sim").desc(), F.col("neighbor_id").asc()),
        out_cols=("query_id", "neighbor_id", "cos_sim", "rank"),
    )


def _hash_sample_rows(v: DataFrame, n: int):
    """The deterministic pseudo-random fit sample shared by every index
    fit in this module: the ``n`` corpus vectors with the smallest
    id-hashes, via orderBy().limit() — Spark plans
    TakeOrderedAndProject (each partition keeps its own top n, the
    driver merges), so the whole corpus never funnels through one
    task. The hash is md5_number_lower (DuckDB builtin twin) so the
    SQL oracle selects the identical sample. ONE bounded collect —
    composite indexes (IVF-PQ) slice centroid seed AND codebook out of
    the same row list instead of collecting twice (r14, VERDICT ask
    #6: each fit collect is a driver-side job exposed to host stalls,
    and the two IVF-PQ collects were 2x that exposure for identical
    rows)."""
    return (
        v.orderBy(md5_number_lower(F.col("cid").cast("string")), F.col("cid"))
        .limit(n)
        .collect()
    )


def _seed_centroids(v: DataFrame, n_lists: int, rows=None):
    """Row-normalized numpy centroid matrix from the hash sample (tiny:
    n_lists x dim on the driver — an ANN index build is an action, like
    fitting). ``rows``: optionally reuse an already-collected
    >=n_lists-row hash sample (see _hash_sample_rows)."""
    import numpy as np

    if rows is None:
        rows = _hash_sample_rows(v, n_lists)
    if len(rows) < n_lists:
        # fail at the fit like pq_codebook: a silently-shrunken index
        # breaks the cluster sizing and the oracle's n_lists replay,
        # and an empty corpus would otherwise surface as an opaque
        # numpy axis error below.
        raise ValueError(
            f"IVF seed needs >= n_lists={n_lists} vectors, got {len(rows)}"
        )
    c = np.array([r.cv for r in rows[:n_lists]], dtype="float64")
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def kmeans_refine_centroids(
    v: DataFrame, centroids, iters: int = 2
):
    """Lloyd refinement with the 100 TB shuffle shape: per iteration,
    assignment is a NARROW Arrow-batched argmax (no corpus shuffle) and
    the new means reduce via posexplode + groupBy(list_id, pos) with
    map-side partial aggregation — only n_lists*dim rows ever cross the
    wire. Means are float reductions, so refined centroids are
    deterministic only up to reduction order; use the un-refined seed
    sample where bit-stable output is required."""
    import numpy as np

    c = centroids
    for _ in range(iters):
        assigned = v.select(
            _nearest_list_udf(c)(F.col("cv")).alias("list_id"), F.col("cv")
        )
        means = (
            assigned.select("list_id", F.posexplode("cv").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        nxt = np.array(c, dtype="float64", copy=True)
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(r.list_id, {})[r.pos] = r.m
        for lid, coords in by_list.items():
            nxt[lid - 1] = [coords[p] for p in sorted(coords)]
        c = nxt / np.maximum(np.linalg.norm(nxt, axis=1, keepdims=True), 1e-12)
    return c


def _nearest_list_udf(centroid_matrix):
    """1-based argmax-cosine list assignment (Arrow-batched numpy
    matmul; ties -> lowest list_id, matching the window tie-break)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cn = np.ascontiguousarray(centroid_matrix)

    @pandas_udf("int")
    def nearest(cv: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        x = _np.array(cv.tolist(), dtype="float64")
        xn = x / _np.maximum(_np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return _pd.Series((xn @ cn.T).argmax(axis=1) + 1).astype("int32")

    return nearest


def _top_lists_udf(centroid_matrix, n_probes: int):
    """Array of the n_probes nearest list_ids per query vector (stable
    sort: ties -> lowest list_id)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cn = np.ascontiguousarray(centroid_matrix)

    @pandas_udf("array<int>")
    def top_lists(qv: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        x = _np.array(qv.tolist(), dtype="float64")
        xn = x / _np.maximum(_np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        order = _np.argsort(-(xn @ cn.T), axis=1, kind="stable")[:, :n_probes]
        return _pd.Series([(row + 1).tolist() for row in order])

    return top_lists


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest
    centroid (inverted list), search each query only in its n_probes
    closest lists.

    Scale shape — the corpus is NEVER shuffled: centroids live on the
    driver (n_lists x dim, collected once like an index fit), corpus
    list assignment is a narrow Arrow-batched argmax, and the probe
    join broadcasts the (tiny by contract) query side, so the only
    wide op is the per-query top-k window over the candidate set
    (~ queries * n_probes * corpus/n_lists rows), which plans with
    WindowGroupLimit partial top-k.

    ``kmeans_iters > 0`` refines the seed sample with Lloyd iterations
    (see kmeans_refine_centroids) — better-balanced lists at the cost
    of float-reduction-order nondeterminism in the centroids; the
    default 0 keeps the fully deterministic hash-sample.
    """
    v = corpus.select(F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv"))
    c = _seed_centroids(v, n_lists)
    if kmeans_iters > 0:
        c = kmeans_refine_centroids(v, c, kmeans_iters)

    assigned = v.select(
        F.col("cid").alias("corpus_id"),
        F.col("cv"),
        _nearest_list_udf(c)(F.col("cv")).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    probed = q.select(
        "query_id",
        "qv",
        F.explode(_top_lists_udf(c, n_probes)(F.col("qv"))).alias("list_id"),
    )
    scored = (
        assigned.join(F.broadcast(probed), "list_id")
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("corpus_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    return _ranked_topk(
        scored,
        k,
        order=(F.col("cos_sim").desc(), F.col("neighbor_id").asc()),
        out_cols=("query_id", "neighbor_id", "cos_sim", "rank"),
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
    (highest vote count, then smallest label).

    The label join is left to AQE on purpose: topk is tiny
    (queries * k rows) but it is a COMPUTED subtree, and an explicit
    F.broadcast would serialize the whole score+rank pipeline into a
    broadcast-exchange build before the join can start (measured ~25%
    slower); AQE sees the small runtime size and converts the join to
    broadcast anyway, without the pipeline barrier."""
    topk = brute_force_topk(queries, corpus, k, vec_col, id_col)
    labeled = topk.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), label_col), "neighbor_id"
    )
    votes = labeled.groupBy("query_id", label_col).agg(F.count("*").alias("votes"))
    # min_by over (votes DESC, label ASC) — negate the COUNT (always
    # numeric), never the label: -label on a string column casts to
    # double and yields NULL, making vote ties nondeterministic (the
    # same unary-minus trap components.cluster_best_survivors avoids)
    return votes.groupBy("query_id").agg(
        F.expr(f"min_by({label_col}, struct(-votes, {label_col}))").alias(
            "predicted_label"
        ),
        F.max("votes").alias("top_votes"),
    )


SEMDEDUP_TARGET_CLUSTER = 128
SEMDEDUP_MIN_LISTS = 8


def semantic_dedup_n_lists(
    n_vectors: int,
    target_cluster_size: int = SEMDEDUP_TARGET_CLUSTER,
    min_lists: int = SEMDEDUP_MIN_LISTS,
) -> int:
    """Auto-size the cluster count so the within-cluster pair search
    stays LINEAR in corpus size: candidate volume is
    ~ n_assign^2 * n^2 / n_lists, so pinning the average cluster at
    ``target_cluster_size`` (n_lists = n / target) makes it
    ~ n_assign^2 * n * target / 2 — a fixed-width band per row. A
    fixed n_lists is the measured trap: the r5 10x-density probe on
    n_lists=8 ran 15x (cluster-bounded QUADRATIC, SCALE.md); with this
    formula the same probe is ~10x (linear). The floor keeps tiny
    fixtures on the exact clustering the oracle replays."""
    import math

    return max(min_lists, math.ceil(n_vectors / target_cluster_size))


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_lists: int | None = None,
    n_assign: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, find near-duplicate
    pairs ONLY within each cluster, then keep one survivor per
    connected component. The clustering bounds the quadratic pair
    search to ~ (n_assign*corpus/n_lists)^2 per list instead of
    corpus^2 — the reason the recipe scales where all-pairs cosine
    (operators/neardup.embedding_cosine_pairs) cannot.

    ``n_assign > 1`` soft-assigns each vector to its top-n_assign
    lists (overlapping clusters), trading candidate volume for recall
    of near-dup pairs that straddle a cluster boundary; the candidate
    reduction factor vs all-pairs is ~ n_assign^2 / n_lists, so size
    n_lists >> n_assign^2 at scale (SemDeDup used ~100k hard clusters
    for LAION; the fixture query uses 8x3 because its planted
    near-dups sit at cosine ~0.35-0.5, far looser than real semantic
    duplicates, and spread across any small clustering).

    Scale shape: centroids are the deterministic md5-hash seed sample
    (driver-side, n_lists x dim — an index fit); list assignment is a
    narrow Arrow-batched top-m (corpus never shuffles for it); the
    within-list pair join shuffles keyed on list_id once; survivors
    come from operators/components.cluster_survivors (keyed-join
    label propagation). Fully deterministic: hash-sampled centroids,
    stable lowest-list tie-break, cosine rounded to 6 before the
    threshold, min-id survivor.
    """
    from cc2dataset_spark.operators.components import cluster_survivors

    v = corpus.select(
        F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv")
    )
    if n_lists is None:
        # One count() job (an index-fit statistic, like the centroid
        # sample itself) buys the linear candidate bound above. Callers
        # pinning n_lists explicitly own the quadratic risk.
        n_lists = semantic_dedup_n_lists(v.count())
    c = _seed_centroids(v, n_lists)
    assigned = v.select(
        "cid",
        "cv",
        F.explode(_top_lists_udf(c, n_assign)(F.col("cv"))).alias("list_id"),
    )
    # Candidate generation is the production SemDeDup kernel: one
    # numpy matmul per cluster (applyInPandas group), row-blocked so a
    # cluster of L vectors peaks at ~block*L doubles, emitting only
    # pairs within `slack` of the threshold. A pure Column-expression
    # pair join evaluates the O(L^2) cosines one scalar expression at a
    # time — measured 12x slower end-to-end at sf0.1 (121 s vs 10 s).
    # The matmul's SIMD/blocked summation order differs from the
    # sequential-sum cosine the oracle replays, so candidates are
    # RE-VERIFIED below with the exact codegen cosine — numpy decides
    # only what is cheap to check, never membership (the LSH
    # candidates->verify pattern).
    cand = assigned.groupBy("list_id").applyInPandas(
        _blocked_pair_candidates(threshold, slack=1e-6),
        "id_a long, id_b long",
    ).distinct()
    va = v.select(F.col("cid").alias("id_a"), F.col("cv").alias("cv_a"))
    vb = v.select(F.col("cid").alias("id_b"), F.col("cv").alias("cv_b"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(
            F.round(cosine_similarity(F.col("cv_a"), F.col("cv_b")), 6)
            >= threshold
        )
        .select("id_a", "id_b")
    )
    return cluster_survivors(corpus, pairs, id_col)


def _blocked_pair_candidates(threshold: float, slack: float = 1e-6, block: int = 1024):
    """applyInPandas kernel: all (id_a < id_b) pairs in one cluster with
    numpy-cosine >= threshold - slack. Row-blocked matmul keeps peak
    memory at ~block * cluster_size doubles regardless of cluster size."""
    import numpy as np

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["cid"].to_numpy()
        x = np.array(pdf["cv"].tolist(), dtype="float64")
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cut = threshold - slack
        out_a: list = []
        out_b: list = []
        for s in range(0, len(ids), block):
            sims = xn[s : s + block] @ xn.T
            bi, bj = np.nonzero(sims >= cut)
            gi = ids[bi + s]
            gj = ids[bj]
            keep = gi < gj
            out_a.append(gi[keep])
            out_b.append(gj[keep])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype="int64"),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype="int64"),
            }
        )

    return fn


# --------------------------------------------------------------------------
# Product quantization (PQ) — FAISS-style ADC top-k
# --------------------------------------------------------------------------


def pq_codebook(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    n_codes: int = 16,
) -> list[list[list[float]]]:
    """codebook[m][k-1] = the k-th codeword (length dim/n_sub) of
    subspace m. Codewords are subvector slices of the ``n_codes``
    corpus vectors with the smallest id-hashes — the same
    md5_number_lower sample (and the same TakeOrderedAndProject
    bounded collect) as the IVF centroid seed, so the SQL oracle
    derives the identical codebook; kmeans refinement is deliberately
    omitted for cross-engine determinism (same trade as the
    registered IVF query's kmeans_iters=0).

    Raises instead of silently truncating: every distance in the
    pipeline slices exactly dim components, so a dim that doesn't
    match the data or divide by n_sub would otherwise drop trailing
    dimensions from every ranking with no error."""
    v = vectors.select(
        F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv")
    )
    return _codebook_from_rows(
        _hash_sample_rows(v, n_codes), dim=dim, n_sub=n_sub, n_codes=n_codes
    )


def _codebook_from_rows(
    rows, dim: int = 64, n_sub: int = 4, n_codes: int = 16
) -> list[list[list[float]]]:
    """Codebook construction from an already-collected hash sample
    (>= n_codes rows; extra rows beyond n_codes are ignored so a
    composite fit can share one larger sample). Validation identical
    to the pq_codebook contract."""
    if dim % n_sub != 0:
        raise ValueError(f"dim={dim} not divisible by n_sub={n_sub}")
    sub_len = dim // n_sub
    if len(rows) < n_codes:
        # An empty/short codebook poisons every downstream encode
        # (codebook[0][0] IndexError, or silent low-recall quantization
        # with fewer codewords than the code range assumes) — fail at
        # the fit, where the cause is visible.
        raise ValueError(
            f"pq_codebook needs >= n_codes={n_codes} corpus vectors, "
            f"got {len(rows)}"
        )
    rows = rows[:n_codes]
    if len(rows[0].cv) != dim:
        raise ValueError(
            f"dim={dim} but vectors have {len(rows[0].cv)} components"
        )
    return [
        [
            [float(x) for x in r.cv[m * sub_len : (m + 1) * sub_len]]
            for r in rows
        ]
        for m in range(n_sub)
    ]


def _pq_codebook_norms(codebook: list[list[list[float]]]):
    """(numpy codebooks, per-codeword self-dots) — the self-dots fold
    SEQUENTIALLY in Python, bit-identical to DuckDB's
    list_dot_product. Single home for the invariant both PQ kernels
    depend on: edit the fold here or nowhere."""
    import numpy as np

    cbs = [np.array(words, dtype="float64") for words in codebook]
    dbb = []
    for words in codebook:
        row = []
        for cw in words:
            acc = 0.0
            for x in cw:
                acc = acc + x * x
            row.append(acc)
        dbb.append(row)
    return cbs, dbb


def _pq_codes_udf(codebook: list[list[list[float]]]):
    """Arrow-batched PQ encoder that reproduces the SQL fold
    BIT-FOR-BIT: distances accumulate sequentially over dimensions
    (vectorized across rows, scalar loop over the sub_len dims — the
    same left-assoc IEEE adds as list_dot_product / the query-side
    zip_with fold), and np.argmin's first-min rule equals the
    (d, k)-ascending tie-break. The expression formulation (array_min
    over array<struct>) is semantically identical but its M*K
    higher-order folds are CodegenFallback — measured ~6 s vs ~1 s for
    100k x 64-dim at M=4, K=16."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_sub = len(codebook)
    sub_len = len(codebook[0][0])
    cbs, dbb = _pq_codebook_norms(codebook)

    @pandas_udf("array<int>")
    def codes(v: pd.Series) -> pd.Series:
        X = np.array(v.tolist(), dtype="float64")
        out = np.zeros((len(X), n_sub), dtype="int32")
        for m in range(n_sub):
            sub = X[:, m * sub_len : (m + 1) * sub_len]
            D = np.empty((len(X), len(cbs[m])))
            for kk in range(len(cbs[m])):
                acc = np.zeros(len(X))
                for j in range(sub_len):
                    acc = acc + sub[:, j] * cbs[m][kk, j]
                D[:, kk] = dbb[m][kk] - 2.0 * acc
            out[:, m] = D.argmin(axis=1) + 1
        return pd.Series([row.tolist() for row in out])

    return codes


def pq_encode(
    vectors: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, c0..c{M-1}) — each vector compressed to M small integer
    codes (1-based, matching the oracle's ROW_NUMBER codeword ids).
    One narrow Arrow-batched map pass (_pq_codes_udf — bit-identical
    to the SQL argmin, see its docstring), no shuffle; at 100 TB this
    is the index-build scan and the stored codes are dim*8/M bytes
    smaller per row than the raw vectors."""
    n_sub = len(codebook)
    codes = _pq_codes_udf(codebook)
    base = vectors.select(
        F.col(id_col), codes(as_double_array(vec_col)).alias("_codes")
    )
    return base.select(
        F.col(id_col),
        *[F.element_at("_codes", m + 1).alias(f"c{m}") for m in range(n_sub)],
    )


def _pq_tables_udf(codebook: list[list[list[float]]]):
    """Arrow-batched ADC table builder, exact twin of the SQL folds
    (same dimension-sequential accumulation as _pq_codes_udf): returns
    struct<qc:double, tabs:array<array<double>>> where tabs[m][k-1] =
    dbb[m][k] - 2*dot(q_m, cw[m][k]) and qc = sum_m dot(q_m, q_m).
    A UDF rather than 64 zip_with/aggregate expressions because the
    expression form costs seconds of one-off driver plan/codegen time
    for a query side that is tiny by contract."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_sub = len(codebook)
    sub_len = len(codebook[0][0])
    cbs, dbb = _pq_codebook_norms(codebook)

    @pandas_udf("struct<qc:double, tabs:array<array<double>>>")
    def tables(v: pd.Series) -> pd.DataFrame:
        X = np.array(v.tolist(), dtype="float64")
        qc = np.zeros(len(X))
        all_tabs = []
        for m in range(n_sub):
            sub = X[:, m * sub_len : (m + 1) * sub_len]
            acc = np.zeros(len(X))
            for j in range(sub_len):
                acc = acc + sub[:, j] * sub[:, j]
            qc = qc + acc
            T = np.empty((len(X), len(cbs[m])))
            for kk in range(len(cbs[m])):
                a = np.zeros(len(X))
                for j in range(sub_len):
                    a = a + sub[:, j] * cbs[m][kk, j]
                T[:, kk] = dbb[m][kk] - 2.0 * a
            all_tabs.append(T)
        tabs_col = [
            [all_tabs[m][i].tolist() for m in range(n_sub)]
            for i in range(len(X))
        ]
        return pd.DataFrame({"qc": qc, "tabs": tabs_col})

    return tables


def _pq_query_tables(
    q: DataFrame,
    codebook: list[list[list[float]]],
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(query_id, *keep, _qc, _tabs) — per-query ADC lookup tables
    plus the per-query constant, via _pq_tables_udf."""
    t = _pq_tables_udf(codebook)
    return q.select("query_id", *keep, t(F.col("qv")).alias("_qt")).select(
        "query_id",
        *keep,
        F.col("_qt.qc").alias("_qc"),
        F.col("_qt.tabs").alias("_tabs"),
    )


def _pq_code_lookup_sum(n_sub: int):
    """sum_m element_at(_tabs[m], c{m}) in fixed left-assoc order."""
    score = None
    for m in range(n_sub):
        t = F.element_at(F.element_at("_tabs", m + 1), F.col(f"c{m}"))
        score = t if score is None else score + t
    return score


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate nearest neighbors by asymmetric distance (ADC):
    approx ||q - v||^2 = sum_m ||q_m - codeword(v, m)||^2, computed
    from v's stored codes only — v's raw vector is never read at query
    time. Table lookups are element_at into a per-subspace array of
    the K query-to-codeword distances, materialized as columns of the
    TINY query side BEFORE the join — evaluated once per query, not
    once per (query, corpus) pair (the folds are interpreted HOFs;
    per-pair evaluation measured ~4 s of pure re-fold at sf0.1).
    Plan: corpus codes broadcast-joined with the bounded query set,
    one (query) window top-k — the corpus shuffles once on nothing
    (scan + map), the ranking state is per-query k rows."""
    n_sub = len(codebook)
    codes = pq_encode(corpus, codebook, id_col=id_col, vec_col=vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    qt = _pq_query_tables(q, codebook)
    joined = codes.join(F.broadcast(qt), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (F.col("_qc") + _pq_code_lookup_sum(n_sub)).alias("_adc"),
    )
    return _ranked_topk(
        scored,
        k,
        order=(F.col("_adc").asc(), F.col("neighbor_id").asc()),
        out_cols=(
            "query_id",
            "neighbor_id",
            F.round("_adc", 6).alias("adc_sqdist"),
            "rank",
        ),
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebook: list[list[list[float]]] | None,
    k: int = 3,
    n_lists: int = 16,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub_default: int = 4,
    n_codes: int = 16,
) -> DataFrame:
    """IVF-PQ — the full FAISS IndexIVFPQ shape: IVF probing prunes
    the candidate set to n_probes inverted lists, PQ ADC ranks the
    candidates from their stored codes. The index pass computes list
    assignment AND the PQ codes in ONE map over the corpus (narrow;
    the corpus is never shuffled, exactly like ivf_topk), so the
    serving-side state per vector is one list id + n_sub bytes.

    ``codebook=None`` builds the codebook INTERNALLY (dim/n_sub_default/
    n_codes) from the SAME hash sample as the centroid seed, in ONE
    bounded driver collect instead of two (r14, VERDICT ask #6): the
    seed and the codebook are by construction the smallest-id-hash
    rows under the same total order, so slicing one collected sample
    yields bit-identical structures to two separate fits. Passing an
    explicit codebook keeps the two-collect behavior for callers that
    fit on a different corpus.

    Both component structures are individually deterministic and
    SQL-replayable, so the composition is too — see _ivfpq_oracle in
    plans/llm_ops.py."""
    v = corpus.select(
        F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv")
    )
    if codebook is None:
        rows = _hash_sample_rows(v, max(n_lists, n_codes))
        c = _seed_centroids(v, n_lists, rows=rows)
        codebook = _codebook_from_rows(
            rows, dim=dim, n_sub=n_sub_default, n_codes=n_codes
        )
    else:
        c = _seed_centroids(v, n_lists)
    n_sub = len(codebook)
    emb = as_double_array(vec_col)
    codes_udf = _pq_codes_udf(codebook)
    base = corpus.select(F.col(id_col), emb.alias("_cv"))
    indexed = base.select(
        F.col(id_col).alias("corpus_id"),
        _nearest_list_udf(c)(F.col("_cv")).alias("list_id"),
        codes_udf(F.col("_cv")).alias("_codes"),
    ).select(
        "corpus_id",
        "list_id",
        *[F.element_at("_codes", m + 1).alias(f"c{m}") for m in range(n_sub)],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    probed = q.select(
        "query_id",
        "qv",
        F.explode(_top_lists_udf(c, n_probes)(F.col("qv"))).alias("list_id"),
    )
    qt = _pq_query_tables(probed, codebook, keep=("list_id",))
    scored = (
        indexed.join(F.broadcast(qt), "list_id")
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("corpus_id").alias("neighbor_id"),
            (
                F.col("_qc")
                + _pq_code_lookup_sum(n_sub)
            ).alias("_adc"),
        )
    )
    return _ranked_topk(
        scored,
        k,
        order=(F.col("_adc").asc(), F.col("neighbor_id").asc()),
        out_cols=(
            "query_id",
            "neighbor_id",
            F.round("_adc", 6).alias("adc_sqdist"),
            "rank",
        ),
    )
