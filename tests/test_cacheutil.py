"""Session-level tracked-cache ledger (cacheutil.py) — ADVICE r6:
query-built cached relations need a release hook so bench loops and
notebooks can return storage memory without stopping the session."""

from __future__ import annotations


def test_tracked_cache_release_roundtrip(spark):
    from algorithmproject_spark_spark.cacheutil import (
        release_caches,
        tracked_cache,
        tracked_count,
    )

    release_caches()
    df = tracked_cache(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert df.count() == 100
    assert df.storageLevel.useMemory
    assert tracked_count() >= 1
    release_caches()
    assert tracked_count() == 0
    assert not df.storageLevel.useMemory
    # idempotent + df still usable after release (recomputes)
    release_caches()
    assert df.count() == 100


def test_release_skips_dead_contexts(spark):
    from algorithmproject_spark_spark import cacheutil as cu

    class _DeadSC:
        _jsc = None

    class _NoUnpersist:
        def unpersist(self):  # pragma: no cover
            raise AssertionError("unpersist on a dead context")

    cu._TRACKED.append((_NoUnpersist(), _DeadSC()))
    cu.release_caches()  # must not raise
    assert cu.tracked_count() == 0


def test_queries_route_caches_through_ledger(spark):
    """A registered query that caches (customer_rfm_segments) must
    register its relation with the ledger so release_caches() frees it."""
    from algorithmproject_spark_spark.cacheutil import (
        release_caches,
        tracked_count,
    )
    from algorithmproject_spark_spark.queries import REGISTRY

    release_caches()
    df = REGISTRY["customer_rfm_segments"].fn(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    assert tracked_count() >= 1
    release_caches()
    assert tracked_count() == 0
