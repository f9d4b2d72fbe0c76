"""Keyed table diff (operators/tablediff.py) on snapshots with known
change sets."""

from __future__ import annotations

from algorithmproject_spark_spark.operators.tablediff import (
    diff_summary,
    table_diff,
)

COLS = ["k", "v", "w"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_classifies_all_four_states(spark):
    a = _df(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    b = _df(spark, [(1, "x", 10), (2, "CHANGED", 20), (4, "n", 40)])
    d = {r.k: r.change_type
         for r in table_diff(a, b, ["k"], ["v", "w"]).collect()}
    assert d == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_null_values_diff_correctly(spark):
    # null vs empty string must NOT collide (presence-tagged hash)
    a = _df(spark, [(1, None, 1), (2, "", 1)])
    b = _df(spark, [(1, "", 1), (2, "", 1)])
    d = {r.k: r.change_type
         for r in table_diff(a, b, ["k"], ["v", "w"]).collect()}
    assert d == {1: "changed", 2: "unchanged"}


def test_null_position_swap_is_detected(spark):
    # concat_ws drops NULLs AND their separators, so without presence
    # tags (NULL,'x') and ('x',NULL) would hash identically — a real
    # change the migration gate must not miss
    schema = "k INT, v STRING, w STRING"
    a = spark.createDataFrame([(1, None, "x")], schema)
    b = spark.createDataFrame([(1, "x", None)], schema)
    d = {r.k: r.change_type
         for r in table_diff(a, b, ["k"], ["v", "w"]).collect()}
    assert d == {1: "changed"}


def test_summary_counts_and_witnesses(spark):
    a = _df(spark, [(i, "v", i) for i in range(10)])
    b = _df(spark, [(i, "v" if i % 3 else "m", i) for i in range(2, 12)])
    s = {r.change_type: (r.n_rows, r.min_key, r.max_key)
         for r in diff_summary(
             table_diff(a, b, ["k"], ["v", "w"]), "k"
         ).collect()}
    # removed: 0,1; added: 10,11; changed: multiples of 3 in [2,9] → 3,6,9
    assert s["removed"] == (2, 0, 1)
    assert s["added"] == (2, 10, 11)
    assert s["changed"] == (3, 3, 9)
    assert s["unchanged"] == (5, 2, 8)
