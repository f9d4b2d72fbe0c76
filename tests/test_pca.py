"""Exact-integer PCA operator (operators/pca.py): kernel vs relational
moments, eigensolve sanity against numpy, determinism, empty guard."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from algorithmproject_spark_spark.operators.pca import (
    EMB_DIM,
    PCA_ITERS,
    Q_SCALE,
    X_SCALE,
    _tdiv,
    embedding_moments,
    principal_direction,
)
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_moments_match_numpy(spark):
    """The Arrow Gram kernel's aggregated moments equal a direct numpy
    recomputation of the quantized corpus."""
    emb = load_table(spark, SF, "embeddings").select("embedding").collect()
    v = np.asarray([np.asarray(r.embedding, dtype="float64") for r in emb])
    q = np.floor(v * Q_SCALE + 0.5).astype("int64")
    rows = embedding_moments(spark, SF).collect()
    got_m = {}
    got_s = {}
    got_n = None
    for r in rows:
        if r.i == -1:
            got_n = r.v
        elif r.j == -1:
            got_s[r.i] = r.v
        else:
            got_m[(r.i, r.j)] = r.v
    assert got_n == len(q)
    ref_m = q.T @ q
    ref_s = q.sum(axis=0)
    assert all(got_s[i] == ref_s[i] for i in range(EMB_DIM))
    assert all(
        got_m[(i, j)] == ref_m[i, j]
        for i in range(EMB_DIM)
        for j in range(EMB_DIM)
    )


def test_principal_direction_aligns_with_numpy_eigenvector(spark):
    """The integer power iteration lands within a degree of numpy's
    top covariance eigenvector (direction up to sign)."""
    x = np.asarray(principal_direction(spark, SF), dtype="float64")
    assert np.max(np.abs(x)) == X_SCALE  # renormalized fixed point
    emb = load_table(spark, SF, "embeddings").select("embedding").collect()
    v = np.asarray([np.asarray(r.embedding, dtype="float64") for r in emb])
    q = np.floor(v * Q_SCALE + 0.5)
    c = np.cov(q.T, bias=True)
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, -1]
    cosine = abs(np.dot(x, top)) / (
        np.linalg.norm(x) * np.linalg.norm(top)
    )
    assert cosine > 0.99


def test_pca_queries_deterministic_and_consistent(spark):
    a = [tuple(r) for r in REGISTRY["embedding_pca_top_direction"].fn(spark, SF).collect()]
    b = [tuple(r) for r in REGISTRY["embedding_pca_top_direction"].fn(spark, SF).collect()]
    assert a == b and len(a) == EMB_DIM
    out = REGISTRY["embedding_pca_outliers"].fn(spark, SF).collect()
    assert len(out) == 20
    devs = [abs(r.dev) for r in out]
    assert devs == sorted(devs, reverse=True)


def test_empty_corpus_guard(spark):
    empty = (
        load_table(spark, SF, "embeddings")
        .filter(F.lit(False))
        .select("embedding")
    )
    from algorithmproject_spark_spark.operators.pca import _moment_batches

    import pandas as pd

    pdf = empty.toPandas()
    parts = list(_moment_batches(iter([pdf])))
    assert len(parts) == 1
    n_row = parts[0][(parts[0].i == -1) & (parts[0].j == -1)]
    assert int(n_row.v.iloc[0]) == 0
    assert _tdiv(-7, 2) == -3 and _tdiv(7, -2) == -3 and _tdiv(-7, -2) == 3


def test_iters_constant_matches_oracle_unroll():
    """The oracle unrolls PCA_ITERS rounds; the registered SQL must
    reference the final px CTE of that exact depth."""
    sql = REGISTRY["embedding_pca_top_direction"].oracle
    assert f"px{PCA_ITERS}" in sql
    assert f"px{PCA_ITERS + 1}" not in sql
