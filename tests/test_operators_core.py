"""Unit tests for the composable operator library (operators/core.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from algorithmproject_spark_spark.operators.core import (
    anti_join_ids,
    approx_percentile_threshold,
    dedup_exact,
    frequency_topk,
    min_max_normalize,
    outer_coalesce_join,
    positional_split,
    quota_per_class,
    semi_join_ids,
    topk_per_group,
    union_all,
    zip_with_index,
)


def test_anti_and_semi_join(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    ids = spark.createDataFrame([(2,), (3,), (3,)], ["id"])
    assert [r.id for r in anti_join_ids(df, ids, "id").collect()] == [1]
    assert sorted(r.id for r in semi_join_ids(df, ids, "id").collect()) == [2, 3]


def test_zip_with_index_dense_and_ordered(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], ["v"])
    out = {r.v: r.idx for r in zip_with_index(df, "v").collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("x", 3), ("x", 1), ("x", 2), ("y", 9)], ["g", "s"]
    )
    out = topk_per_group(df, "g", F.desc("s"), 2)
    got = sorted((r.g, r.s, r.rk) for r in out.collect())
    assert got == [("x", 2, 2), ("x", 3, 1), ("y", 9, 1)]


def test_quota_per_class_one_pass(spark):
    df = spark.createDataFrame([("a", i) for i in range(5)] + [("b", 9)], ["c", "i"])
    out = quota_per_class(df, "c", "i", 3)
    assert out.filter(F.col("c") == "a").count() == 3
    assert out.filter(F.col("c") == "b").count() == 1
    assert "__rk" not in out.columns


def test_dedup_exact_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [("t", 5), ("t", 2), ("u", 1)], ["text", "id"]
    )
    out = dedup_exact(df, "text", keep_min_of="id")
    assert {(r.text, r.id) for r in out.collect()} == {("t", 2), ("u", 1)}


def test_outer_coalesce_join(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "av"])
    b = spark.createDataFrame([(2, "y")], ["k", "bv"])
    out = outer_coalesce_join(a, b, ["k"]).orderBy("k").collect()
    assert [(r.k, r.av, r.bv) for r in out] == [(1, "x", None), (2, None, "y")]


def test_union_all(spark):
    fs = [spark.createDataFrame([(i,)], ["x"]) for i in range(4)]
    assert union_all(fs).count() == 4


def test_percentile_threshold(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
    t = approx_percentile_threshold(df, "v", 0.5)
    assert 45.0 <= t <= 55.0


def test_frequency_topk_deterministic_ties(spark):
    df = spark.createDataFrame([("b",), ("b",), ("a",), ("a",), ("c",)], ["w"])
    out = frequency_topk(df, "w", 2).collect()
    assert [(r.w, r["count"]) for r in out] == [("a", 2), ("b", 2)]


def test_positional_split(spark):
    df = spark.createDataFrame([("a\x01b\x01c",)], ["value"])
    out = positional_split(df, "value", ["f1", "f2", "f3"], "\x01").collect()[0]
    assert (out.f1, out.f2, out.f3) == ("a", "b", "c")


def test_min_max_normalize(spark):
    df = spark.createDataFrame([(0,), (5,), (10,)], ["v"])
    out = {r.v: r.n for r in min_max_normalize(df, "v", "n").collect()}
    assert out == {0: 0.0, 5: 0.5, 10: 1.0}
    const = spark.createDataFrame([(3,), (3,)], ["v"])
    assert all(r.n == 1.0 for r in min_max_normalize(const, "v", "n").collect())


def test_bucketed_interval_join_half_open_boundaries(spark):
    import datetime as dt

    from algorithmproject_spark_spark.operators.rangejoin import (
        bucketed_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    points = spark.createDataFrame(
        [(1, ts(0)), (2, ts(59)), (3, ts(60)), (4, ts(200))], ["pid", "ts"]
    )
    intervals = spark.createDataFrame(
        [("w", ts(0), ts(60))], ["name", "s", "e"]
    )
    got = sorted(
        r.pid
        for r in bucketed_interval_join(points, intervals, "ts", "s", "e").collect()
    )
    # start inclusive, end exclusive; far point excluded by bucket join
    assert got == [1, 2]


def test_connected_components_collapse_transitive_chains(spark):
    from algorithmproject_spark_spark.operators.components import (
        connected_components_min_label,
    )

    # chain 10-11-12-13 (one component), pair 20-21, pair order reversed
    pairs = spark.createDataFrame(
        [(11, 10), (11, 12), (12, 13), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r.v: r.lbl for r in connected_components_min_label(pairs).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_connected_components_survivor_is_unique_per_cluster(spark):
    from algorithmproject_spark_spark.operators.components import (
        connected_components_min_label,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (3, 4)], "doc_a long, doc_b long"
    )
    labels = connected_components_min_label(pairs)
    comps = {}
    for r in labels.collect():
        comps.setdefault(r.lbl, set()).add(r.v)
    assert set(comps) == {1, 5}
    assert comps[1] == {1, 2, 3, 4} and comps[5] == {5, 6}


def test_adaptive_cc_collapses_long_chain(spark):
    """A diameter-12 path would defeat the fixed-5-round variant; the
    adaptive pointer-jumping loop must collapse it to one component
    (convergence is O(log d) rounds, not d)."""
    from algorithmproject_spark_spark.operators.components import (
        connected_components,
        connected_components_min_label,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = {r.v: r.lbl for r in connected_components(pairs).collect()}
    assert got == {v: 0 for v in range(13)}
    # and the fixed-5 variant really is diameter-bounded (the reason
    # the adaptive loop exists): the far end keeps a split label
    fixed = {
        r.v: r.lbl for r in connected_components_min_label(pairs).collect()
    }
    assert fixed[12] != 0


def test_adaptive_cc_matches_fixed_on_forests(spark):
    """On mixed short components (what LSH-verified dedup pairs look
    like) both variants agree exactly."""
    import random

    from algorithmproject_spark_spark.operators.components import (
        connected_components,
        connected_components_min_label,
    )

    rng = random.Random(3)
    edges = []
    base = 0
    for _ in range(30):  # 30 clusters, sizes 2-5, random internal wiring
        size = rng.randint(2, 5)
        vs = list(range(base, base + size))
        for v in vs[1:]:
            edges.append((rng.choice([u for u in vs if u < v]), v))
        base += size + 3
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = sorted((r.v, r.lbl) for r in connected_components(pairs).collect())
    b = sorted(
        (r.v, r.lbl) for r in connected_components_min_label(pairs).collect()
    )
    assert a == b


def test_driver_cc_query_is_converged_at_sf001(spark):
    """Guard for the registered dedup_cluster_reps: the fixed-round CC
    it pins must be at its fixed point on the REAL verified-pair graph
    (if data ever produces a chain deeper than CC_ITERS, this fails
    before the driver ships a silently-split cluster)."""
    from algorithmproject_spark_spark.operators.components import (
        connected_components,
        connected_components_min_label,
    )
    from algorithmproject_spark_spark.queries.dedup import jaccard_verified_pairs

    pairs = jaccard_verified_pairs(spark, "/root/testdata/sf0.01").select(
        "doc_a", "doc_b"
    )
    fixed = sorted(
        (r.v, r.lbl) for r in connected_components_min_label(pairs).collect()
    )
    exact = sorted((r.v, r.lbl) for r in connected_components(pairs).collect())
    assert fixed == exact


def test_table_checksum_detects_any_change(spark):
    """Checksums must be partition-order independent, and any single
    value change, row loss, or duplicate-parity trick must move at
    least one witness column."""
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.checksum import table_checksum

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "v"]
    )
    base = table_checksum(df, ["k", "v"]).first()
    same = table_checksum(df.repartition(7), ["k", "v"]).first()
    assert tuple(base) == tuple(same)

    mutated = table_checksum(
        df.withColumn("v", F.when(F.col("k") == 3, "X").otherwise(F.col("v"))),
        ["k", "v"],
    ).first()
    assert mutated["xor_hash"] != base["xor_hash"]

    dropped = table_checksum(df.filter(F.col("k") != 2), ["k", "v"]).first()
    assert tuple(dropped) != tuple(base)

    # a row duplicated twice XORs itself away — n_rows/n_distinct catch it
    doubled = table_checksum(
        df.unionAll(df.filter(F.col("k") == 1)).unionAll(
            df.filter(F.col("k") == 1)
        ),
        ["k", "v"],
    ).first()
    assert doubled["xor_hash"] == base["xor_hash"]  # the xor blind spot...
    assert doubled["n_rows"] != base["n_rows"]      # ...closed by counts


def test_overlap_join_counts_each_pair_once(spark):
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.rangejoin import (
        bucketed_overlap_join,
    )

    H = 3_600_000_000  # 1h in micros
    # a0 spans 5 buckets; b0 overlaps it across 3 shared buckets — the
    # first-shared-bucket rule must yield exactly ONE output row
    a = spark.createDataFrame(
        [(0, 0, 5 * H), (1, 10 * H, 11 * H)], ["a_id", "a_s", "a_e"]
    )
    b = spark.createDataFrame(
        [
            (100, 2 * H, 8 * H),    # overlaps a0 in buckets 2,3,4
            (101, 5 * H, 6 * H),    # touches a0 at its end — NOT overlap
            (102, 10 * H + 5, 10 * H + 6),  # inside a1
        ],
        ["b_id", "b_s", "b_e"],
    )
    out = bucketed_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e")
    pairs = sorted((r.a_id, r.b_id) for r in out.collect())
    assert pairs == [(0, 100), (1, 102)]


def test_overlap_join_ignores_empty_and_inverted_intervals(spark):
    """Half-open NON-EMPTY contract: an empty interval [x, x) sitting
    inside the other side must not match (the strict overlap predicate
    alone would pass it), and an inverted interval must be dropped
    rather than explode a descending bucket sequence."""
    from algorithmproject_spark_spark.operators.rangejoin import (
        bucketed_overlap_join,
    )

    H = 3_600_000_000
    a = spark.createDataFrame(
        [
            (0, 0, 2 * H),       # real interval
            (1, 5 * H, 5 * H),   # empty — overlaps nothing
            (2, 9 * H, 7 * H),   # inverted — dropped
        ],
        ["a_id", "a_s", "a_e"],
    )
    b = spark.createDataFrame([(100, 0, 10 * H)], ["b_id", "b_s", "b_e"])
    out = bucketed_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e")
    assert sorted((r.a_id, r.b_id) for r in out.collect()) == [(0, 100)]
    # empty interval on the b side likewise never matches
    b2 = spark.createDataFrame([(200, H, H)], ["b_id", "b_s", "b_e"])
    assert bucketed_overlap_join(a, b2, "a_s", "a_e", "b_s", "b_e").count() == 0


def test_overlap_join_matches_naive_on_random_intervals(spark):
    from algorithmproject_spark_spark.operators.rangejoin import (
        bucketed_overlap_join,
    )

    H = 3_600_000_000
    # deterministic pseudo-random intervals with varied widths/offsets
    a_rows = [
        (i, (i * 7919) % 50 * H // 4, (i * 7919) % 50 * H // 4
         + ((i * 104729) % 10 + 1) * H // 3)
        for i in range(40)
    ]
    b_rows = [
        (j, (j * 15485863) % 50 * H // 4, (j * 15485863) % 50 * H // 4
         + ((j * 32452843) % 8 + 1) * H // 2)
        for j in range(40)
    ]
    expected = sorted(
        (ai, bj)
        for ai, as_, ae in a_rows
        for bj, bs, be in b_rows
        if as_ < be and bs < ae
    )
    a = spark.createDataFrame(a_rows, ["a_id", "a_s", "a_e"])
    b = spark.createDataFrame(b_rows, ["b_id", "b_s", "b_e"])
    out = bucketed_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e")
    assert sorted((r.a_id, r.b_id) for r in out.collect()) == expected


def test_global_index_is_dense_under_range_sampling_jitter(spark):
    """zip_with_global_index must produce a DENSE 0..n-1 index: the
    range partitioner derives boundaries from job-time sampling, so
    without pinning the partitioned relation the counts job and the
    output job can see different partitions — observed at sf0.1 as a
    gapped index (max 5178 over 5000 rows) before the localCheckpoint
    fix. Large enough input that boundary sampling is partial."""
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.core import (
        zip_with_global_index,
    )

    n = 50_000
    df = spark.range(n).select(
        ((F.col("id") * 48271) % F.lit(1_000_003)).alias("k")
    ).distinct()
    expect = df.count()
    out = zip_with_global_index(df, "k", "idx", num_partitions=16)
    agg = out.agg(
        F.min("idx"), F.max("idx"), F.count("*"), F.countDistinct("idx")
    ).first()
    assert tuple(agg) == (0, expect - 1, expect, expect)
    # and the index respects the key order
    bad = out.join(
        zip_with_global_index(df, "k", "idx2", num_partitions=16),
        "k",
    ).filter("idx != idx2")
    assert bad.count() == 0
