"""KMV sketch determinism + accuracy (queries/kmv.py)."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.kmv import (
    KMV_K,
    kmv_distinct_per_group,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["g", "k"])


def test_below_k_is_exact(spark):
    rows = [("a", i % 7) for i in range(100)]  # 7 distinct < k
    (r,) = kmv_distinct_per_group(_df(spark, rows), "g", "k").collect()
    assert r.kmv_size == 7
    assert r.est_distinct == r.n_exact == 7


def test_estimator_is_deterministic_and_close(spark):
    n = 5000
    rows = [("a", i) for i in range(n)] + [("a", i) for i in range(n)]
    out1 = kmv_distinct_per_group(
        _df(spark, rows).repartition(8), "g", "k"
    ).collect()[0]
    out2 = kmv_distinct_per_group(
        _df(spark, rows).repartition(3), "g", "k"
    ).collect()[0]
    # partitioning-invariant (a pure function of the value set)
    assert (out1.kth_min, out1.est_distinct) == (
        out2.kth_min, out2.est_distinct
    )
    assert out1.n_exact == n
    assert out1.kmv_size == KMV_K
    # standard KMV error ~ 1/sqrt(k) ≈ 18% at k=32; allow 3σ
    assert abs(out1.est_distinct - n) < 0.54 * n


def test_duplicates_do_not_shift_the_sketch(spark):
    base = [("a", i * 17) for i in range(500)]
    heavy = base + [("a", 17)] * 2000  # one value repeated massively
    r1 = kmv_distinct_per_group(_df(spark, base), "g", "k").collect()[0]
    r2 = kmv_distinct_per_group(_df(spark, heavy), "g", "k").collect()[0]
    assert (r1.kth_min, r1.est_distinct) == (r2.kth_min, r2.est_distinct)
