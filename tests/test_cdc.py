"""cdc_apply semantics on planted change batches."""

from __future__ import annotations

from pyspark.sql import Row

from algorithmproject_spark_spark.operators.cdc import cdc_apply


def test_cdc_apply_upsert_delete_and_latest_wins(spark):
    snap = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, op="U", v="b2", seq=1),
            Row(k=2, op="U", v="b3", seq=5),   # latest wins
            Row(k=3, op="D", v=None, seq=1),   # delete
            Row(k=4, op="I", v="d", seq=1),    # insert
        ]
    )
    got = {r.k: r.v for r in cdc_apply(snap, changes, "k").collect()}
    assert got == {1: "a", 2: "b3", 4: "d"}


def test_cdc_apply_delete_then_reinsert_same_batch(spark):
    snap = spark.createDataFrame([Row(k=1, v="a")])
    changes = spark.createDataFrame(
        [Row(k=1, op="D", v=None, seq=1), Row(k=1, op="I", v="a2", seq=2)]
    )
    got = {r.k: r.v for r in cdc_apply(snap, changes, "k").collect()}
    assert got == {1: "a2"}
