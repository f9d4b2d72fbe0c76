"""Degree-ordered triangle counting (operators/triangles.py) on graphs
with known triangle structure, plus a brute-force equivalence check."""

from __future__ import annotations

from itertools import combinations

from algorithmproject_spark_spark.operators.triangles import (
    triangles,
    vertex_triangle_counts,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(sorted(pairs), ["a", "b"])


def _brute_counts(pairs):
    adj = set(pairs) | {(b, a) for a, b in pairs}
    verts = sorted({v for e in pairs for v in e})
    counts = {}
    for u, v, w in combinations(verts, 3):
        if (u, v) in adj and (v, w) in adj and (u, w) in adj:
            for x in (u, v, w):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_k4_every_vertex_in_three_triangles(spark):
    k4 = list(combinations(range(4), 2))
    out = {r.v: r.n_triangles for r in
           vertex_triangle_counts(_edges_df(spark, k4)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
    assert triangles(_edges_df(spark, k4)).count() == 4


def test_path_and_star_have_no_triangles(spark):
    path = [(i, i + 1) for i in range(6)]
    star = [(0, i) for i in range(1, 8)]
    assert vertex_triangle_counts(_edges_df(spark, path)).count() == 0
    assert vertex_triangle_counts(_edges_df(spark, star)).count() == 0


def test_two_triangles_sharing_an_edge(spark):
    # (1,2,3) and (2,3,4) share edge (2,3)
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    out = {r.v: r.n_triangles for r in
           vertex_triangle_counts(_edges_df(spark, pairs)).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_matches_brute_force_on_dense_random_graph(spark):
    # deterministic pseudo-random graph: edge (i,j) iff hash-ish mix is
    # even — dense enough for many overlapping triangles
    verts = range(12)
    pairs = [
        (i, j)
        for i, j in combinations(verts, 2)
        if ((i * 37 + j * 101) % 3) == 0
    ]
    expected = _brute_counts(pairs)
    out = {r.v: r.n_triangles for r in
           vertex_triangle_counts(_edges_df(spark, pairs)).collect()}
    assert out == expected
