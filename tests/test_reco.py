"""Unit tests for the CF recommendation step (queries/reco.py).

The value-level contract is pinned by the DuckDB oracle; this asserts
the structural invariants on real testdata: recommendations never
include parts the customer already owns, scores are positive, and the
per-customer top-k cap holds."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.reco import (
    TOPK_RECS,
    customer_item_recs_topk,
)


def test_recs_exclude_owned_and_respect_topk(spark):
    sf = "/root/testdata/sf0.001"
    recs = customer_item_recs_topk(spark, sf).collect()
    assert recs, "fixture produces at least one recommendation"
    owned = {
        (r.cust, r.part)
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .selectExpr("o_orderkey", "o_custkey as cust")
        .join(
            spark.read.parquet(f"{sf}/lineitem.parquet").selectExpr(
                "l_orderkey as o_orderkey", "l_partkey as part"
            ),
            "o_orderkey",
        )
        .select("cust", "part")
        .distinct()
        .collect()
    }
    per_cust: dict = {}
    for r in recs:
        assert (r.c_custkey, r.rec_part) not in owned
        assert r.score_e6 > 0 and r.n_paths >= 1
        per_cust.setdefault(r.c_custkey, 0)
        per_cust[r.c_custkey] += 1
    assert max(per_cust.values()) <= TOPK_RECS
