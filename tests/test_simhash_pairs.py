"""The banded SimHash Hamming join must be COMPLETE: the 4-band
pigeonhole bucketing may generate extra candidates (harmlessly filtered
by the exact verify) but must never miss a pair within Hamming
``SIMHASH_K`` — otherwise the dedup recall silently degrades. Pinned by
comparing against the brute-force all-pairs formulation on the smoke
fixture, which the banded plan must reproduce exactly.

Round 10: the fingerprint widened from 62 bits / 16-bit band keys to
124 bits / 31-bit band keys (four affine-derived vote blocks), so
accidental candidate volume is n²/2³¹-driven instead of n²/2¹⁶ — the
completeness contract is identical, the occupancy math is not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from algorithmproject_spark_spark.queries.dedup import (
    SIMHASH_K,
    simhash124_fingerprints,
    simhash_hamming_pairs,
)
from tests.conftest import SF_SMOKE


def _brute_force_pairs(fps):
    a = fps.select(
        F.col("doc_id").alias("doc_a"),
        F.col("fp_lo").alias("lo_a"),
        F.col("fp_hi").alias("hi_a"),
    )
    b = fps.select(
        F.col("doc_id").alias("doc_b"),
        F.col("fp_lo").alias("lo_b"),
        F.col("fp_hi").alias("hi_b"),
    )
    ham = F.expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)").cast("long")
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(ham <= F.lit(SIMHASH_K))
        .select("doc_a", "doc_b", ham.alias("hamming"))
    )


def test_banded_join_equals_brute_force(spark):
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs(spark, SF_SMOKE).collect()
    }
    fps = simhash124_fingerprints(spark, SF_SMOKE)
    brute = {
        (r.doc_a, r.doc_b, r.hamming) for r in _brute_force_pairs(fps).collect()
    }
    assert banded == brute
    # the smoke fixture contains exact duplicates → hamming-0 pairs exist,
    # so the equality above is not vacuous
    assert any(h == 0 for (_, _, h) in banded)


def test_fingerprint_halves_are_62_bits_nonnegative(spark):
    fps = simhash124_fingerprints(spark, SF_SMOKE)
    bad = fps.where(
        (F.col("fp_lo") < 0)
        | (F.col("fp_lo") >= F.lit(1 << 62))
        | (F.col("fp_hi") < 0)
        | (F.col("fp_hi") >= F.lit(1 << 62))
    ).count()
    assert bad == 0


def test_vote_blocks_are_independent(spark):
    """The four 31-bit blocks must not be copies of each other (the
    affine re-hash has to actually decorrelate the votes) — identical
    blocks would collapse the pigeonhole to one effective band."""
    fps = simhash124_fingerprints(spark, SF_SMOKE)
    same = fps.where(
        (F.expr("fp_lo & 2147483647") == F.expr("shiftright(fp_lo, 31)"))
        & (F.expr("fp_hi & 2147483647") == F.expr("shiftright(fp_hi, 31)"))
    ).count()
    n = fps.count()
    assert same < n  # not all docs degenerate
