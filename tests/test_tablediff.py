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


def test_separator_injection_is_detected(spark):
    # values CONTAINING the \x1f separator must not shift bytes across
    # column boundaries: under plain presence-tagging ('a\x1f1b','c')
    # and ('a','b\x1f1c') encode to the identical joined string; the
    # length-prefix code keeps them distinct
    schema = "k INT, v STRING, w STRING"
    a = spark.createDataFrame([(1, "a\x1f1b", "c")], schema)
    b = spark.createDataFrame([(1, "a", "b\x1f1c")], schema)
    d = {r.k: r.change_type
         for r in table_diff(a, b, ["k"], ["v", "w"]).collect()}
    assert d == {1: "changed"}


def test_row_hash_sql_twin_matches_spark_on_hostile_values(spark):
    # the DuckDB twin must produce byte-identical hashes for every
    # hard case: separator injection, null vs empty, unicode (length
    # counts CHARACTERS in both engines), digits-and-colon values that
    # could fake a length prefix
    import duckdb

    from algorithmproject_spark_spark.operators.checksum import (
        row_hash,
        sql_row_hash_expr,
    )

    rows = [
        (1, "a\x1f1b", "c"),
        (2, "a", "b\x1f1c"),
        (3, None, ""),
        (4, "", None),
        (5, "héllo", "x:y"),
        (6, "2:", "1"),
    ]
    schema = "k INT, v STRING, w STRING"
    df = spark.createDataFrame(rows, schema)
    got = {
        r.k: r.h
        for r in df.select("k", row_hash(["v", "w"]).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k INT, v VARCHAR, w VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT k, {sql_row_hash_expr(['v', 'w'])} FROM t"
        ).fetchall()
    )
    assert got == want
    assert len(set(got.values())) == len(rows)


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
