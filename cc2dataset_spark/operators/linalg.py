"""Distributed linear algebra over embedding columns (scale
extension; no reference twin): the exact-integer second-moment pass
and the PCA fit/project built on it — the preprocessing step under
whitening, OPQ rotations, and SemDeDup-style semantic clustering.

Scale shape: the ONLY corpus-scale stage is one double-posexplode
into a d(d+1)/2-key partial hash aggregate — the map side combines
each partition to <= d(d+1)/2 integer rows, so the shuffle is
#partitions x 2080 (d=64) REGARDLESS of corpus size, and the fit's
driver action collects exactly those d(d+1)/2 rows (the bounded
codebook-fit class, same as IVF). Projection is an Arrow-batched
numpy matmul over the stream (the operators/similarity.py kernel
shape); nothing ever broadcasts or collects the corpus.

Determinism: coordinates quantize by q = floor(x * 2^20)
(float32 -> double exact, power-of-two scale exact, floor exact), so
the collected moments are INTEGERS — identical under any
partitioning — and numpy's eigh on identical input gives identical
components; eigenvector signs are canonicalized (largest-|coord|
positive). The ~2^-20 quantization bias is negligible against
embedding noise and is the price of a bit-reproducible fit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1 << 20


def quantized_vec(vec_col: str | Column, scale: int = QUANT_SCALE) -> Column:
    """floor(x * scale) per coordinate as BIGINT — exact in every
    engine for power-of-two scales (see module docstring)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c,
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )


def quantized_second_moments(
    df: DataFrame, vec_col: str = "embedding", scale: int = QUANT_SCALE
) -> DataFrame:
    """(i, j, n, s_i, s_j, s_ij) for every dimension pair i <= j over
    the quantized coordinates. Sums accumulate as DECIMAL(38,0) (so
    partial aggregation can never wrap) and EMIT as BIGINT: with
    |q| <= scale * max|x| the products are bounded by
    n * (scale * max|x|)^2, which for unit-scale embeddings at
    scale = 2^20 keeps every sum under 2^63 up to n ~ 4M vectors per
    fit — and past that ceiling an EXPLICIT guard raises in every
    session (a plain decimal->long cast is only loud under ANSI; a
    non-ANSI session would silently NULL the overflow) exactly as
    DuckDB's BIGINT cast does, rather than drifting (the repo's
    standing overflow discipline, functions/numeric.py). All-integer output matters downstream:
    DECIMAL(38,0) columns are the one output type the external
    driver's value hasher has disagreed with (r10 red on
    embed_covariance_exact — rows and schema matched, hash didn't),
    while BIGINT hashes identically everywhere. One pass, one
    d(d+1)/2-key aggregate; marginals ride the same groups (each row
    contributes each (i,j) exactly once)."""
    qd = df.select(quantized_vec(vec_col, scale).alias("q"))
    ex = qd.select(F.posexplode("q").alias("i", "qi"), "q")
    pairs = ex.select(
        "i",
        "qi",
        F.posexplode(F.expr("slice(q, i + 1, size(q) - i)")).alias(
            "jj", "qj"
        ),
    ).select("i", (F.col("i") + F.col("jj")).alias("j"), "qi", "qj")

    def to_long(c: Column, name: str) -> Column:
        # loud past-the-ceiling in EVERY session: ANSI makes the
        # plain cast error, but a non-ANSI session (a configuration
        # the repo treats as reachable — see operators/asof.py)
        # silently NULLs decimal->long overflow, which would be
        # exactly the cross-engine drift the all-integer output
        # exists to rule out. Guard explicitly instead.
        # asymmetric bounds (ADVICE r11): BIGINT reaches -2^63 but
        # only +2^63-1; an abs() guard would reject the representable
        # minimum
        hi = F.lit(9223372036854775807).cast("decimal(38,0)")
        lo = F.lit(-9223372036854775808).cast("decimal(38,0)")
        return (
            F.when(
                (c > hi) | (c < lo),
                F.raise_error(
                    F.lit(
                        f"quantized_second_moments: {name} exceeds "
                        "BIGINT — reduce scale or shard dimensions"
                    )
                ).cast("decimal(38,0)"),
            )
            .otherwise(c)
            .cast("bigint")
        )

    return pairs.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        to_long(
            F.sum(F.col("qi").cast("decimal(20,0)")).cast(
                "decimal(38,0)"
            ),
            "s_i",
        ).alias("s_i"),
        to_long(
            F.sum(F.col("qj").cast("decimal(20,0)")).cast(
                "decimal(38,0)"
            ),
            "s_j",
        ).alias("s_j"),
        to_long(
            F.sum(
                (F.col("qi") * F.col("qj")).cast("decimal(20,0)")
            ).cast("decimal(38,0)"),
            "s_ij",
        ).alias("s_ij"),
    )


@dataclass(frozen=True)
class PcaModel:
    mean: "object"  # np.ndarray (d,) in original units
    components: "object"  # np.ndarray (k, d), rows orthonormal
    eigenvalues: "object"  # np.ndarray (k,) descending, >= 0
    n: int
    dim: int


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    scale: int = QUANT_SCALE,
) -> PcaModel:
    """Fit a k-component PCA of the embedding column.

    Collects only the d(d+1)/2 moment rows (bounded driver action);
    the covariance assembles in float64 from exact integers, so the
    fit is bit-reproducible across partitionings and re-runs."""
    import numpy as np

    # Null coordinates are invisible to the moment rows (SUM skips
    # them while COUNT(*) doesn't — the oracle-pinned semantics of
    # quantized_second_moments), so guard them here with a lazily
    # evaluated raise_error branch: zero extra passes, fails the scan
    # on the first offending vector. Mixed DIMENSIONS are caught
    # below by the per-pair count / pair-coverage check.
    null_msg = (
        "fit_pca: ragged embeddings — null coordinate inside a vector"
    )
    c = F.col(vec_col)
    guarded = df.select(
        F.when(
            F.exists(c, lambda x: x.isNull()),
            F.raise_error(F.lit(null_msg)),
        )
        .otherwise(c)
        .alias(vec_col)
    )
    try:
        rows = quantized_second_moments(guarded, vec_col, scale).collect()
    except Exception as e:  # surface the guard as the documented type
        if null_msg in str(e):
            raise ValueError(null_msg) from e
        raise
    if not rows:
        raise ValueError("fit_pca: empty input")
    d = max(r["j"] for r in rows) + 1
    if not 1 <= k <= d:
        raise ValueError(f"fit_pca: k must be in [1, {d}], got {k}")
    # Ragged input (mixed dimensions, or nulls inside a vector) makes
    # the per-(i, j) counts disagree and/or drops pairs — that would
    # silently skew the mean/covariance, so refuse instead.
    n_set = {r["n"] for r in rows}
    if len(n_set) != 1 or len(rows) != d * (d + 1) // 2:
        raise ValueError(
            "fit_pca: ragged embeddings — every vector must have the "
            f"same dimension with no null coordinates (saw counts "
            f"{sorted(n_set)[:5]} over {len(rows)} of "
            f"{d * (d + 1) // 2} expected dimension pairs)"
        )
    n = rows[0]["n"]
    s = np.zeros(d, dtype="float64")
    ss = np.zeros((d, d), dtype="float64")
    for r in rows:
        i, j = r["i"], r["j"]
        ss[i, j] = ss[j, i] = float(r["s_ij"])
        s[i] = float(r["s_i"])
        if i != j:
            s[j] = float(r["s_j"])
    cov = (ss - np.outer(s, s) / n) / n / (float(scale) ** 2)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T.copy()
    # sign canonicalization: the largest-|coordinate| entry positive
    # (ties -> lowest index via argmax), so the fit has ONE answer
    for r in range(comps.shape[0]):
        lead = np.argmax(np.abs(comps[r]))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    mean = s / n / float(scale)
    return PcaModel(
        mean=mean, components=comps, eigenvalues=evals, n=int(n), dim=d
    )


def project_pca(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the centered k-dim projection — Arrow-batched numpy
    matmul over the stream, no shuffle, no collect."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    comps = np.ascontiguousarray(model.components, dtype="float64")
    mean = np.ascontiguousarray(model.mean, dtype="float64")

    @pandas_udf("array<double>")
    def proj(cv):
        import numpy as _np
        import pandas as _pd

        x = _np.array(cv.tolist(), dtype="float64")
        y = (x - mean) @ comps.T
        return _pd.Series(list(y))

    return df.withColumn(out_col, proj(F.col(vec_col)))
