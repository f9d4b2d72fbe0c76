"""Largest-remainder allocation + MAD outlier invariants."""

from __future__ import annotations


def test_allocation_sums_to_budget_and_stays_within_one(spark):
    from algorithmproject_spark_spark.queries.alloc import (
        ALLOC_BUDGET,
        corpus_quota_allocation,
    )

    rows = corpus_quota_allocation(spark, "/root/testdata/sf0.001").collect()
    total_docs = sum(r["n_docs"] for r in rows)
    assert sum(r["alloc"] for r in rows) == ALLOC_BUDGET  # every slot used
    for r in rows:
        exact = ALLOC_BUDGET * r["n_docs"] / total_docs
        # Hamilton guarantee: allocation within 1 of the real quota
        assert exact - 1 < r["alloc"] < exact + 1


def test_mad_outliers_robust_to_extreme_values(spark):
    """Injecting one absurd value must not move median or MAD (the
    point of robust stats) — only the outlier count."""
    import pyspark.sql.functions as F

    from algorithmproject_spark_spark.queries.alloc import events_mad_outliers
    from algorithmproject_spark_spark.sources.catalog import load_table

    base = events_mad_outliers(spark, "/root/testdata/sf0.001")
    b = {r["event_type"]: r for r in base.collect()}
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # clone one row with a 1e6x value and run the query over the
    # spiked relation via a temp table dir
    spike = ev.limit(1).withColumn("value", F.col("value") * 1_000_000)
    spiked = ev.unionByName(spike)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spiked.write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
        s = {r["event_type"]: r for r in events_mad_outliers(spark, td).collect()}
    spiked_type = ev.limit(1).collect()[0]["event_type"]
    r0, r1 = b[spiked_type], s[spiked_type]
    assert r1["med_e2"] == r0["med_e2"]
    assert r1["mad_e2"] == r0["mad_e2"]
    assert r1["n_outliers"] == r0["n_outliers"] + 1
