"""Span-corruption mask generation (queries/maskgen.py)."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.maskgen import (
    corruption_mask_stats,
)


def _docs(spark, texts, partitions=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return df.repartition(partitions) if partitions else df


TEXTS = [" ".join(f"t{i}" for i in range(n)) for n in (5, 40, 80, 200)]


def test_mask_is_partitioning_invariant(spark):
    a = {r.doc_id: (r.n_mask_spans, r.masked_tokens)
         for r in corruption_mask_stats(_docs(spark, TEXTS, 1)).collect()}
    b = {r.doc_id: (r.n_mask_spans, r.masked_tokens)
         for r in corruption_mask_stats(_docs(spark, TEXTS, 7)).collect()}
    assert a == b


def test_mask_bounds_and_clamping(spark):
    rows = corruption_mask_stats(_docs(spark, TEXTS)).collect()
    assert len(rows) == len(TEXTS)
    for r in rows:
        # masked span count/coverage bounded by the doc itself; spans
        # clamped at the end never overshoot
        assert 0 <= r.masked_tokens <= r.n_tokens
        assert r.n_mask_spans * 1 <= r.masked_tokens or r.n_mask_spans == 0
        assert r.mask_permille == 1000 * r.masked_tokens // r.n_tokens


def test_long_doc_mask_rate_near_target(spark):
    # 5% starts x width 3 → ~14-15% expected coverage on a long doc
    long_doc = [" ".join(f"t{i}" for i in range(5000))]
    (r,) = corruption_mask_stats(_docs(spark, long_doc)).collect()
    assert 80 <= r.mask_permille <= 220


def test_mask_depends_on_doc_id(spark):
    """Regression for the hash-annihilation bug: the doc term of the
    mask hash must actually reach the bucket — equal-length docs must
    NOT all mask the same positions (found when the mixing prime
    equalled hash_mod's internal reduction prime)."""
    same_len = [" ".join(f"t{i}" for i in range(300))] * 6
    docs = spark.createDataFrame(
        [(i * 101 + 7, t) for i, t in enumerate(same_len)],
        ["doc_id", "text"],
    )
    rows = corruption_mask_stats(docs).collect()
    signatures = {(r.n_mask_spans, r.masked_tokens) for r in rows}
    assert len(signatures) > 1, "every doc got an identical mask"
