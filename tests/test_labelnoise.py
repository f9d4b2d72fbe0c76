"""Unit tests for k-NN label-noise detection.

The value-level contract is pinned by the DuckDB oracle at two scale
factors; these tests assert the structural invariants on real testdata
plus the flag semantics on a hand-built embedding fixture where the
neighborhoods are known by construction."""

from __future__ import annotations

from pyspark.sql import Row

from algorithmproject_spark_spark.queries.labelnoise import (
    KNN_K,
    knn_label_noise,
)

SF = "/root/testdata/sf0.001"


def test_complete_spine_and_flag_invariants(spark):
    rows = knn_label_noise(spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_vecs  # every vector gets a verdict row
    for r in rows:
        assert 0 <= r.n_same <= r.k_eff <= KNN_K
        assert r.suspect == (1 if r.k_eff > 0 and 2 * r.n_same < r.k_eff else 0)


def test_minority_label_is_flagged(spark, tmp_path):
    # One 64-d direction; 5 near-identical vectors labeled 1 and one
    # labeled 0 in the middle of them: the label-0 vector's neighbors
    # all carry label 1 → suspect; the label-1 vectors agree → clean.
    def vec(eps):
        return [1.0 + eps] + [0.0] * 63

    rows = [
        Row(vec_id=i, embedding=vec(0.001 * i), label=1) for i in range(5)
    ] + [Row(vec_id=5, embedding=vec(0.0025), label=0)]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {r.vec_id: (r.n_same, r.suspect)
           for r in knn_label_noise(spark, str(tmp_path)).collect()}
    assert got[5] == (0, 1)  # the mislabeled vector: zero agreeing neighbors
    for i in range(5):
        n_same, suspect = got[i]
        assert suspect == 0 and n_same == 4  # 4 same-label + the odd one
