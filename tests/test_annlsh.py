"""Scale-posture tests for the banded hyperplane-LSH near-dup path.

The quadratic-blowup failure mode of fixed-width LSH is a *growth*
property, so it is tested as one: with the corpus-derived signature
width, candidate pairs per vector must stay bounded as the corpus
quadruples, while a planted exact duplicate is always recalled
(identical vectors land in identical buckets in every band).
"""

from __future__ import annotations

import math
import random

import pytest

from algorithmproject_spark_spark.operators.annlsh import (
    NEAR_DUP_BANDS,
    NEAR_DUP_TARGET_BUCKET,
    near_dup_candidates,
    near_dup_pairs,
    planes_per_band_for,
)

DIM = 64


def _random_vectors(spark, n, seed):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1.0, 1.0) for _ in range(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planes_per_band_tracks_corpus_size():
    assert planes_per_band_for(500) == 5  # the registered sf0.01 setting
    # Quadrupling the corpus widens the signature by 2 bits, keeping
    # E[bucket size] ~ target.
    for n in (1_000, 4_000, 16_000, 1_000_000):
        r = planes_per_band_for(n)
        assert 2**r >= n / NEAR_DUP_TARGET_BUCKET
        assert 2 ** (r - 1) < n / NEAR_DUP_TARGET_BUCKET or r == 1


def test_candidate_growth_is_linear_not_quadratic(spark):
    """cand/n must stay ~flat as n quadruples (it would 4x if quadratic)."""
    per_row = {}
    for n in (256, 1024):
        df = _random_vectors(spark, n, seed=5)
        cand = near_dup_candidates(df, planes_per_band=planes_per_band_for(n))
        per_row[n] = cand.count() / n
        # absolute bound: bands * E[bucket]²/2 pairs spread over E[bucket]
        # rows ⇒ ~bands·target/2 per row; allow 4x slack for bucket skew.
        assert per_row[n] <= NEAR_DUP_BANDS * NEAR_DUP_TARGET_BUCKET * 2
    assert per_row[1024] <= per_row[256] * 2.5


def test_planted_duplicate_always_recalled(spark):
    df = _random_vectors(spark, 128, seed=11)
    dup = df.filter("vec_id = 7").selectExpr("cast(9999 as long) vec_id", "embedding")
    corpus = df.unionAll(dup)
    pairs = near_dup_pairs(corpus, threshold_e6=990_000).collect()
    assert any(r.vec_a == 7 and r.vec_b == 9999 for r in pairs)
    top = [r for r in pairs if r.vec_a == 7 and r.vec_b == 9999][0]
    assert top.cosine_e6 == 1_000_000


def test_derived_width_matches_explicit(spark):
    df = _random_vectors(spark, 256, seed=3)
    derived = near_dup_candidates(df).count()
    explicit = near_dup_candidates(df, planes_per_band=planes_per_band_for(256)).count()
    assert derived == explicit


def test_wide_signatures_never_truncate(spark):
    """A corpus wide enough to need rows > 12 per band must still give
    every band a full plane set (the fixed-pool regression left band 3
    with zero planes → constant bucket → all-pairs self-join)."""
    from algorithmproject_spark_spark.operators.annlsh import _band_planes

    rows = planes_per_band_for(1_000_000)  # 16 at the default target
    assert rows > 12
    for band in range(NEAR_DUP_BANDS):
        planes = _band_planes(band, rows)
        assert len(planes) == rows
        assert all(len(p) == DIM for p in planes)
    # All bands' planes are distinct draws, not recycled slices.
    flat = [p for band in range(NEAR_DUP_BANDS) for p in _band_planes(band, rows)]
    assert len(set(flat)) == len(flat)
    # And the last band's bucket expression actually partitions data.
    df = _random_vectors(spark, 64, seed=17)
    cand = near_dup_candidates(df, planes_per_band=rows)
    # 64 random vectors under 16-bit signatures should collide rarely:
    # far fewer than the all-pairs 64*63/2 = 2016 a dead band would emit.
    assert cand.count() < 200


def test_n_vectors_param_builds_plan_without_spark_job(spark):
    """Passing n_vectors must keep candidate-plan construction action-free."""
    sc = spark.sparkContext
    df = _random_vectors(spark, 256, seed=3)
    group = "annlsh-no-action-probe"
    sc.setJobGroup(group, "near_dup_candidates plan build")
    try:
        cand = near_dup_candidates(df, n_vectors=256)
        assert sc.statusTracker().getJobIdsForGroup(group) == []
    finally:
        sc.setJobGroup("annlsh-after-probe", "execution")
    # Same width as the derived path, so results are identical.
    assert cand.count() == near_dup_candidates(df, planes_per_band=planes_per_band_for(256)).count()
