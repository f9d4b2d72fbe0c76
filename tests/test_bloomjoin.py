"""Relational Bloom prefilter (operators/bloomjoin.py): no false
negatives ever, bitmap assembly, and fp behavior under saturation."""

from __future__ import annotations

from pyspark.sql import functions as F

from algorithmproject_spark_spark.operators.bloomjoin import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_prefilter,
)


def test_prefilter_never_drops_a_true_match(spark):
    big = spark.createDataFrame([(i, i % 100) for i in range(2000)], ["id", "k"])
    small = spark.createDataFrame([(k,) for k in range(0, 100, 7)], ["k"])
    passed = bloom_prefilter(big, small, "k", "k")
    true_rows = {r.id for r in big.join(small, "k", "left_semi").collect()}
    pass_rows = {r.id for r in passed.collect()}
    assert true_rows <= pass_rows  # the Bloom guarantee
    assert pass_rows <= {r.id for r in big.collect()}


def test_membership_all_inserted_keys_positive(spark):
    keys = spark.createDataFrame([(i * 37,) for i in range(50)], ["k"])
    bm = bloom_bitmap(keys, "k")
    probe = keys.crossJoin(F.broadcast(bm)).select(
        bloom_might_contain("k", "bm").alias("hit")
    )
    assert all(r.hit for r in probe.collect())


def test_tiny_bitmap_saturates_to_all_pass(spark):
    # m=62 bits with hundreds of keys sets every word: the filter
    # degrades to pass-everything — still CORRECT, just useless
    big = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    small = spark.createDataFrame([(i,) for i in range(400)], ["k"])
    passed = bloom_prefilter(big, small, "k", "k", m_bits=62, k=2)
    assert passed.count() == 500


def test_bitmap_is_dense_and_sized(spark):
    keys = spark.createDataFrame([(1,), (2,)], ["k"])
    row = bloom_bitmap(keys, "k", m_bits=124, k=2).first()
    assert len(row.bm) == 2  # 124 bits / 62 per word
    assert all(isinstance(w, int) and w >= 0 for w in row.bm)
    assert sum(bin(w).count("1") for w in row.bm) <= 4  # ≤ n*k bits set
