"""Unit tests for operators/graph.py (weighted PageRank) and the
incremental-dedup operator — the differential oracle checks live in
tests/test_oracle.py; these pin the operator semantics on hand-built
graphs where the expected answer is computed independently (NumPy
power iteration / by hand)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cc2dataset_spark.operators.dedup import dedup_incremental
from cc2dataset_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping, iters):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for u, v, w in edges:
        P[idx[u], idx[v]] = w
    out = P.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        P = np.where(out > 0, P / out, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1.0 - damping) / n + damping * (P.T @ r)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy(spark):
    # Directed weighted graph with a dangling node (d has no out-edges)
    # and a node with only out-edges (a gets only the teleport mass).
    edges = [
        ("a", "b", 3.0),
        ("a", "c", 1.0),
        ("b", "c", 2.0),
        ("c", "b", 1.0),
        ("c", "d", 1.0),
        ("b", "d", 1.0),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r.id: r.rank for r in pagerank(df, damping=0.85, iters=4).collect()
    }
    want = _numpy_pagerank(edges, 0.85, 4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # a has no in-edges: exactly the teleport share each round
    assert got["a"] == pytest.approx(0.15 / 4, abs=1e-12)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string, w double")
    assert pagerank(df).count() == 0


@settings(max_examples=10, deadline=None)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(0, 7), st.integers(0, 7), st.integers(1, 5)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pagerank_matches_numpy_on_random_graphs(spark, raw):
    # aggregate duplicate (src, dst) pairs — the operator's contract
    edges = {}
    for u, v, w in raw:
        edges[(str(u), str(v))] = edges.get((str(u), str(v)), 0.0) + w
    flat = [(u, v, w) for (u, v), w in edges.items()]
    df = spark.createDataFrame(flat, ["src", "dst", "w"])
    got = {
        r.id: r.rank for r in pagerank(df, damping=0.85, iters=3).collect()
    }
    want = _numpy_pagerank(flat, 0.85, 3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-10)


def test_dedup_incremental_semantics(spark):
    batch = spark.createDataFrame(
        [
            (10, "dup-of-index"),  # fingerprint already in the index
            (11, "new-content"),  # new, min-id within batch -> survives
            (12, "new-content"),  # same fp, larger id -> dropped
            (13, "other-new"),  # unique new -> survives
        ],
        ["doc_id", "text"],
    )
    index = spark.createDataFrame(
        [("dup-of-index",), ("dup-of-index",)], ["raw"]
    ).select(F.md5("raw").alias("fingerprint"))
    out = dedup_incremental(batch, index, F.md5("text"))
    assert sorted(r.doc_id for r in out.collect()) == [11, 13]
