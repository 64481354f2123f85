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


def _numpy_pagerank(edges, damping, iters, redistribute=False):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for u, v, w in edges:
        P[idx[u], idx[v]] = w
    out = P.sum(axis=1, keepdims=True)
    dangling = (out.ravel() == 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        P = np.where(out > 0, P / out, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        spread = r[dangling].sum() / n if redistribute else 0.0
        r = (1.0 - damping) / n + damping * (P.T @ r + spread)
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


@pytest.mark.slow
def test_pagerank_redistributed_preserves_mass(spark):
    # d has no out-edges; with redistribution the rank vector stays a
    # probability distribution (sum == 1) and matches NumPy.
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r.id: r.rank
        for r in pagerank(
            df, damping=0.85, iters=5, redistribute_dangling=True
        ).collect()
    }
    want = _numpy_pagerank(edges, 0.85, 5, redistribute=True)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


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
@pytest.mark.slow
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


@settings(max_examples=10, deadline=None)
@given(
    batch=st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from("abcdefgh")),
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    index=st.lists(st.sampled_from("abcdefgh"), max_size=6),
)
@pytest.mark.slow
def test_dedup_incremental_matches_python_model(spark, batch, index):
    """Random batches/indexes vs a direct Python model of the
    contract: survivors = min-id per content among batch rows whose
    content is not indexed."""
    expected = {}
    for doc_id, text in batch:
        if text in set(index):
            continue
        if text not in expected or doc_id < expected[text]:
            expected[text] = doc_id
    bdf = spark.createDataFrame(
        batch or [(None, None)], "doc_id long, text string"
    ).where(F.col("doc_id").isNotNull())
    idf = spark.createDataFrame(
        [(t,) for t in index] or [(None,)], "fingerprint string"
    ).where(F.col("fingerprint").isNotNull())
    out = dedup_incremental(bdf, idf, F.col("text"))
    got = {r.fingerprint: r.doc_id for r in out.collect()}
    assert got == expected


def test_upsert_by_key(spark):
    base = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["k", "v"]
    )
    updates = spark.createDataFrame([("b", 20), ("d", 40)], ["k", "v"])
    from cc2dataset_spark.operators.dedup import upsert_by_key

    got = {(r.k, r.v) for r in upsert_by_key(base, updates, ["k"]).collect()}
    assert got == {("a", 1), ("b", 20), ("c", 3), ("d", 40)}
    with pytest.raises(ValueError):
        upsert_by_key(base, updates.select("v", "k"), ["k"])


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


@pytest.mark.slow
def test_pagerank_big_graph_path(spark, sf_dir):
    """The supplier -> part graph at sf0.01 (~59k edges) crosses the
    big-graph threshold, exercising the shuffle-hash / graph-sized
    partitioning / per-round-persist loop. The math is pinned by the
    small-graph NumPy tests; here we assert the physical path keeps
    the invariants: full node coverage, a probability-distribution
    rank vector (redistribution), and run-to-run determinism."""
    from cc2dataset_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    edges = li.groupBy(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    ).agg(F.sum("l_quantity").cast("double").alias("w"))
    assert edges.count() > 10_000
    # force the big path (default threshold is 200k rows — sized to
    # broadcast bytes, not to this fixture)
    r = pagerank(
        edges, iters=2, redistribute_dangling=True, big_graph_threshold=10_000
    )
    rows = {x.id: x.rank for x in r.collect()}
    n_nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert len(rows) == n_nodes
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    again = {x.id: x.rank for x in pagerank(
        edges, iters=2, redistribute_dangling=True, big_graph_threshold=10_000
    ).collect()}
    assert again == rows
