"""The banded SimHash Hamming join must be COMPLETE: the 4-band
pigeonhole bucketing may generate extra candidates (harmlessly filtered
by the exact verify) but must never miss a pair within Hamming
``SIMHASH_K`` — otherwise the dedup recall silently degrades. Pinned by
comparing against the brute-force all-pairs formulation on the smoke
fixture, which the banded plan must reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from algorithmproject_spark_spark.queries.dedup import (
    SIMHASH_K,
    simhash62_fingerprints,
    simhash_hamming_pairs,
)
from tests.conftest import SF_SMOKE


def _brute_force_pairs(fps):
    a = fps.select(F.col("doc_id").alias("doc_a"), F.col("fp62").alias("fp_a"))
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("fp62").alias("fp_b"))
    ham = F.expr("bit_count(fp_a ^ fp_b)").cast("long")
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
    fps = simhash62_fingerprints(spark, SF_SMOKE)
    brute = {
        (r.doc_a, r.doc_b, r.hamming) for r in _brute_force_pairs(fps).collect()
    }
    assert banded == brute
    # the smoke fixture contains exact duplicates → hamming-0 pairs exist,
    # so the equality above is not vacuous
    assert any(h == 0 for (_, _, h) in banded)


def test_fingerprint_is_62_bits_nonnegative(spark):
    fps = simhash62_fingerprints(spark, SF_SMOKE)
    bad = fps.where(
        (F.col("fp62") < 0) | (F.col("fp62") >= F.lit(1 << 62))
    ).count()
    assert bad == 0
