"""Unit tests for operators/linalg.py and operators/graph.py::pagerank:
distributed moments vs numpy ground truth, row-local projection, and
power iteration vs a dense numpy reference."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _vec_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "id long, vec array<double>").repartition(3)


def test_covariance_matches_numpy(spark):
    from asritha_metamorphetl_spark.operators.linalg import covariance_matrix

    rng = np.random.RandomState(7)
    mat = rng.randn(40, 5)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(_vec_df(spark, mat), "vec", 5).collect()
    }
    want = np.cov(mat, rowvar=False, bias=True)  # population covariance
    assert len(got) == 25
    for i in range(5):
        for j in range(5):
            assert abs(got[(i, j)] - round(want[i, j], 6)) < 1e-9


def test_gram_moments_partials_sum_exactly(spark):
    from asritha_metamorphetl_spark.operators.linalg import gram_moments

    mat = np.arange(12, dtype=float).reshape(4, 3)
    rows = {(r["i"], r["j"]): r["val"] for r in gram_moments(
        _vec_df(spark, mat), "vec", 3
    ).collect()}
    assert rows[(-1, -1)] == 4.0
    np.testing.assert_allclose(
        [rows[(k, -1)] for k in range(3)], mat.sum(axis=0)
    )
    np.testing.assert_allclose(
        [[rows[(i, j)] for j in range(3)] for i in range(3)], mat.T @ mat
    )


def test_project_embeddings_centered_dot(spark):
    from asritha_metamorphetl_spark.operators.linalg import project_embeddings

    mat = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    direction = [0.5, -1.0, 2.0]
    center = [1.0, 1.0, 1.0]
    out = {
        r["id"]: r["proj"]
        for r in project_embeddings(
            _vec_df(spark, mat), "vec", direction, center=center
        ).collect()
    }
    want = (mat - np.array(center)) @ np.array(direction)
    for i, w in enumerate(want):
        assert abs(out[i] - w) < 1e-12


def test_pagerank_matches_dense_power_iteration(spark):
    from asritha_metamorphetl_spark.operators.graph import pagerank

    # weighted digraph; node 0 has out-edges but NO in-edges (keeps the
    # teleport floor), every node has at least one out-edge.
    edges = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 1, 3.0)]
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, "src", "dst", weight="w", damping=0.85, iters=3).collect()
    }
    # dense reference
    n = 3
    p = np.zeros((n, n))
    for s, d, w in edges:
        p[s, d] = w
    p = p / p.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = (1 - 0.85) / n + 0.85 * (p.T @ r)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12
    assert abs(got[0] - (1 - 0.85) / n) < 1e-12  # no in-edges → floor


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    from asritha_metamorphetl_spark.operators.graph import pagerank

    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    ranks = pagerank(e, "src", "dst", iters=4)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_moment_fold_is_linear(spark):
    """Summed partials over an arbitrary split equal the one-shot
    moments — the linearity the streaming maintenance path relies on."""
    import pyspark.sql.functions as FF

    from asritha_metamorphetl_spark.operators.linalg import gram_moments

    rng = np.random.RandomState(3)
    mat = rng.randn(30, 4)
    df = _vec_df(spark, mat)
    whole = {
        (r["i"], r["j"]): r["val"]
        for r in gram_moments(df, "vec", 4).collect()
    }
    parts = (
        gram_moments(df.filter("id % 3 = 0"), "vec", 4)
        .unionByName(gram_moments(df.filter("id % 3 = 1"), "vec", 4))
        .unionByName(gram_moments(df.filter("id % 3 = 2"), "vec", 4))
        .groupBy("i", "j")
        .agg(FF.sum("val").alias("val"))
    )
    folded = {(r["i"], r["j"]): r["val"] for r in parts.collect()}
    assert set(folded) == set(whole)
    for k, v in whole.items():
        assert abs(folded[k] - v) < 1e-9


def test_triangle_counts_known_graphs(spark):
    from asritha_metamorphetl_spark.operators.graph import triangle_counts

    # K4: every vertex sits in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "src long, dst long"), "src", "dst"
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # path + pendant star: no triangles anywhere, all nodes reported
    path = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 9), (2, 8)]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            spark.createDataFrame(path, "src long, dst long"), "src", "dst"
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5, 8, 9}
    assert all(v == 0 for v in got.values())

    # one triangle plus a tail; duplicate/reversed edges must not
    # inflate the count
    g = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 4)]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            spark.createDataFrame(g, "src long, dst long"), "src", "dst"
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}
