"""fit_pca / project_pca: the distributed fit must equal a numpy
reference computed from the SAME quantized integers, be
bit-reproducible across partitionings, produce an orthonormal basis
with descending eigenvalues, and the projection must realize those
eigenvalues as per-axis variances."""

import numpy as np
import pytest

from cc2dataset_spark.operators.linalg import (
    QUANT_SCALE,
    fit_pca,
    project_pca,
)
from cc2dataset_spark.sources.tables import load_table


def _collect_matrix(df, vec_col="embedding"):
    return np.array(
        [r[vec_col] for r in df.select(vec_col).collect()],
        dtype="float64",
    )


def _ref_fit(x, k, scale=QUANT_SCALE):
    q = np.floor(x * scale)
    n = q.shape[0]
    s = q.sum(axis=0)
    cov = (q.T @ q - np.outer(s, s) / n) / n / (float(scale) ** 2)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T.copy()
    for r in range(comps.shape[0]):
        lead = np.argmax(np.abs(comps[r]))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    return s / n / scale, comps, evals


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_matches_numpy_reference(spark, emb):
    x = _collect_matrix(emb)
    model = fit_pca(emb, k=6)
    mean, comps, evals = _ref_fit(x, 6)
    assert model.n == x.shape[0] and model.dim == x.shape[1]
    np.testing.assert_allclose(model.mean, mean, rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        model.eigenvalues, evals, rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(
        model.components, comps, rtol=0, atol=1e-9
    )


def test_bit_reproducible_across_partitionings(spark, emb):
    a = fit_pca(emb.repartition(3), k=4)
    b = fit_pca(emb.repartition(17, "vec_id"), k=4)
    assert (a.components == b.components).all()
    assert (a.eigenvalues == b.eigenvalues).all()
    assert (a.mean == b.mean).all()


def test_basis_orthonormal_eigs_descending(spark, emb):
    m = fit_pca(emb, k=8)
    gram = m.components @ m.components.T
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-9)
    assert (np.diff(m.eigenvalues) <= 1e-15).all()
    assert (m.eigenvalues >= 0).all()


def test_projection_realizes_eigenvalues(spark, emb):
    k = 5
    m = fit_pca(emb, k=k)
    y = np.array(
        [
            r.pca
            for r in project_pca(emb, m).select("pca").collect()
        ],
        dtype="float64",
    )
    assert y.shape == (m.n, k)
    # population variance per projected axis == eigenvalue (up to the
    # quantization of the FIT vs the unquantized projection input)
    var = y.var(axis=0)
    np.testing.assert_allclose(var, m.eigenvalues, rtol=5e-5, atol=1e-9)
    # centered projection: axis means ~ 0
    np.testing.assert_allclose(
        y.mean(axis=0), np.zeros(k), atol=1e-5
    )


def test_invalid_k_and_empty_raise(spark, emb):
    with pytest.raises(ValueError):
        fit_pca(emb, k=0)
    with pytest.raises(ValueError):
        fit_pca(emb, k=65)
    with pytest.raises(ValueError):
        fit_pca(emb.where("vec_id < 0"))


def test_ragged_embeddings_refused(spark):
    # Mixed dimensions (and null coordinates) make the per-(i, j)
    # moment counts disagree — the fit must refuse loudly instead of
    # returning a silently skewed covariance.
    ragged = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([4.0, 5.0],)], "embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        fit_pca(ragged, k=1)
    holey = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([4.0, None, 6.0],)],
        "embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        fit_pca(holey, k=1)
