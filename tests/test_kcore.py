"""Fixed-round k-core peeling (operators/kcore.py) on graphs with
known core structure."""

from __future__ import annotations

from itertools import combinations

from algorithmproject_spark_spark.operators.kcore import kcore_vertices


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), ["a", "b"])


def test_triangle_with_pendant_chain(spark):
    # 2-core = the triangle; the chain 3-4-5 peels away over rounds
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    out = {r.v: r.deg for r in
           kcore_vertices(_edges(spark, pairs), k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_k4_has_a_3core_but_k4_minus_edge_does_not(spark):
    k4 = list(combinations(range(4), 2))
    out = {r.v: r.deg for r in
           kcore_vertices(_edges(spark, k4), k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
    broken = [e for e in k4 if e != (0, 1)]
    assert kcore_vertices(_edges(spark, broken), k=3).count() == 0


def test_long_path_needs_enough_rounds(spark):
    # P9 (8 edges) peels one vertex per end per round: 4 rounds empty
    # it; 2 rounds leave survivors with deg < k — the convergence
    # invariant must fail LOUDLY instead of returning a non-k-core
    import pytest

    path = [(i, i + 1) for i in range(8)]
    assert kcore_vertices(_edges(spark, path), k=2, rounds=4).count() == 0
    with pytest.raises(ValueError, match="did not converge"):
        kcore_vertices(_edges(spark, path), k=2, rounds=2).count()


def test_two_disjoint_triangles_both_survive(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    out = {r.v for r in kcore_vertices(_edges(spark, pairs), k=2).collect()}
    assert out == {0, 1, 2, 10, 11, 12}
