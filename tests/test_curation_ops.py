"""Invariant tests for the round-8 curation/selection operators:
prototype-distance pruning, hard-negative mining, DSIR importance
weights. Value-exactness is the oracle gate's job; these pin the
semantic contracts the hash cannot see."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def centroid_rows(spark):
    from algorithmproject_spark_spark.queries.prototypes import (
        label_centroid_outliers,
    )

    return label_centroid_outliers(spark, SF).collect()


def test_centroid_outliers_flag_counts(centroid_rows):
    """Exactly floor(n_label/20) rows flagged per tail per label, and
    flags sit at the rank extremes."""
    from collections import defaultdict

    by_label = defaultdict(list)
    for r in centroid_rows:
        by_label[r.label].append(r)
    assert by_label
    for label, rows in by_label.items():
        n = len(rows)
        assert all(r.n_label == n for r in rows)
        assert sorted(r.rk_far for r in rows) == list(range(1, n + 1))
        outliers = [r for r in rows if r.outlier == 1]
        protos = [r for r in rows if r.prototype == 1]
        assert len(outliers) == n // 20
        assert len(protos) == n // 20
        assert all(r.rk_far <= n // 20 for r in outliers)
        assert all(r.rk_far > n - n // 20 for r in protos)


def test_centroid_outliers_distance_orders_rank(centroid_rows):
    from collections import defaultdict

    by_label = defaultdict(list)
    for r in centroid_rows:
        by_label[r.label].append(r)
    for rows in by_label.values():
        rows.sort(key=lambda r: r.rk_far)
        dists = [r.dist2_e12 for r in rows]
        assert dists == sorted(dists, reverse=True)
        assert all(d >= 0 for d in dists)


def test_hard_negatives_contract(spark):
    from algorithmproject_spark_spark.queries.labelnoise import (
        HN_K,
        hard_negative_mining_grouped,
    )

    rows = hard_negative_mining_grouped(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.neg_label != r.label
        assert r.neg_id != r.vec_id
        assert 1 <= r.rk <= HN_K
    # per anchor: ranks contiguous from 1, cosine non-increasing
    from collections import defaultdict

    by_anchor = defaultdict(list)
    for r in rows:
        by_anchor[r.vec_id].append(r)
    for anchor_rows in by_anchor.values():
        anchor_rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in anchor_rows] == list(
            range(1, len(anchor_rows) + 1)
        )
        cosines = [r.cos_e6 for r in anchor_rows]
        assert cosines == sorted(cosines, reverse=True)


def test_dsir_weights_contract(spark):
    from algorithmproject_spark_spark.queries.dsir import (
        TARGET_LANG,
        dsir_importance_weights,
    )

    rows = dsir_importance_weights(spark, SF).collect()
    assert rows
    # every score is a ppm proportion (tgt subset of raw => ratio <= 1)
    assert all(0 <= r.dsir_avg_ppm <= 1_000_000 for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.dsir_avg_ppm)
    # the selection signal: target-language docs must outscore every
    # other language on average (their tokens concentrate in
    # target-heavy buckets)
    mean = {lang: sum(v) / len(v) for lang, v in by_lang.items()}
    assert TARGET_LANG in mean
    for lang, m in mean.items():
        if lang != TARGET_LANG:
            assert mean[TARGET_LANG] > m
