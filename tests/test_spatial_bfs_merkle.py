"""Unit tests for the grid spatial join, BFS levels, Merkle bucket
checksums, and argmax aggregates on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from algorithmproject_spark_spark.operators.bfs import bfs_levels
from algorithmproject_spark_spark.operators.checksum import (
    bucket_checksums,
    table_checksum,
)
from algorithmproject_spark_spark.queries.advanced import (
    orders_argmax_by_priority,
)
from algorithmproject_spark_spark.queries.spatial import (
    grid_closest_pairs_2d,
)


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def _vec(vid, x, y):
    return Row(vec_id=vid, embedding=[float(x), float(y), 0.0, 0.0], label=0)


def test_grid_pairs_cross_cell_and_radius_cut(spark, tmp_path):
    # a=(0,0), b=(0.001,0) same-ish cell; e=(-0.001,0) sits in the
    # ADJACENT cell (negative side) — only the 3x3 expansion finds
    # (a,e) and (b,e); far=(0.2,0) is beyond the radius entirely
    sf = _write(
        spark,
        tmp_path,
        "embeddings",
        [_vec(1, 0.0, 0.0), _vec(2, 0.001, 0.0), _vec(3, -0.001, 0.0),
         _vec(4, 0.2, 0.0)],
    )
    rows = [
        (r.vec_i, r.vec_j, r.d2)
        for r in grid_closest_pairs_2d(spark, sf).collect()
    ]
    # fixed-point: 0.001*2^20 = 1048.576 → 1049 either side
    assert rows == [
        (1, 2, 1049 * 1049),
        (1, 3, 1049 * 1049),
        (2, 3, 2098 * 2098),
    ]


def test_bfs_levels_chain_caps_at_depth(spark):
    # chain 1-2-3-4-5-6: source is min vertex 1; node 6 is 5 hops out
    # and must be absent at max_level=4
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "a long, b long"
    )
    got = {r.v: r.level for r in bfs_levels(edges).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_levels_min_hop_not_path_order(spark):
    # triangle 1-2, 2-3, 1-3 plus tail 3-4: node 3 is reachable in 2
    # hops via 2 but MUST report the direct 1-hop level
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    got = {r.v: r.level for r in bfs_levels(edges).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def _order(ok, price, prio="1-URGENT"):
    return Row(
        o_orderkey=ok,
        o_custkey=1,
        o_orderstatus="O",
        o_totalprice=price,
        o_orderdate=dt.datetime(2024, 1, 1),
        o_orderpriority=prio,
    )


def test_merkle_buckets_locate_single_row_change(spark):
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    a = spark.createDataFrame([_order(i, 10.0) for i in range(1, 9)])
    b = spark.createDataFrame(
        [_order(i, 10.0) for i in range(1, 8)] + [_order(8, 10.0, "5-LOW")]
    )
    ca = {r.bucket: r.xor_hash for r in bucket_checksums(a, cols, "o_orderkey").collect()}
    cb = {r.bucket: r.xor_hash for r in bucket_checksums(b, cols, "o_orderkey").collect()}
    diff = [k for k in ca if ca[k] != cb.get(k)]
    assert diff == [8 % 64]
    # bucket xors compose to the global checksum (same hash family)
    glob = table_checksum(a, cols).collect()[0].xor_hash
    acc = 0
    for v in ca.values():
        acc ^= v
    assert acc == glob


def test_argmax_ties_resolve_to_larger_key(spark, tmp_path):
    sf = _write(
        spark,
        tmp_path,
        "orders",
        [_order(1, 50.0), _order(2, 50.0), _order(3, 10.0)],
    )
    r = orders_argmax_by_priority(spark, sf).collect()[0]
    # equal top prices: composite (cents, orderkey) picks key 2; the
    # bottom side picks key 3 outright
    assert (r.top_orderkey, r.top_cents, r.bottom_orderkey, r.bottom_cents, r.n_orders) == (2, 5000, 3, 1000, 3)


def test_argmax_guard_raises_on_oversized_orderkey(spark, tmp_path):
    import pytest

    sf = _write(
        spark, tmp_path, "orders", [_order((1 << 31) + 5, 10.0)]
    )
    with pytest.raises(Exception, match="composite bound"):
        orders_argmax_by_priority(spark, sf).collect()


from algorithmproject_spark_spark.queries.advanced import (  # noqa: E402
    events_nearest_view_per_error,
)
from algorithmproject_spark_spark.queries.spatial import (  # noqa: E402
    FEAT_OFFSET,
    graph_message_passing_2hop,
)


def _vec4(vid, x, y, f):
    return Row(
        vec_id=vid, embedding=[float(x), float(y), 0.0, float(f)], label=0
    )


def test_message_passing_matches_python_fold(spark, tmp_path):
    # triangle: all three mutually within the grid radius; features
    # chosen to exercise negative fixed-point values
    feats = {1: 1.0, 2: 0.5, 3: -0.25}
    sf = _write(
        spark,
        tmp_path,
        "embeddings",
        [_vec4(1, 0.0, 0.0, feats[1]), _vec4(2, 0.001, 0.0, feats[2]),
         _vec4(3, 0.0, 0.001, feats[3])],
    )
    import math

    h = {v: math.floor(f * (1 << 20) + 0.5) for v, f in feats.items()}
    neigh = {1: [2, 3], 2: [1, 3], 3: [1, 2]}
    for _ in range(2):
        h = {
            v: (sum(h[u] + FEAT_OFFSET for u in ns) // len(ns))
            - FEAT_OFFSET
            for v, ns in neigh.items()
        }
    got = {
        r.vec_id: r.h2_q20
        for r in graph_message_passing_2hop(spark, sf).collect()
    }
    assert got == h


def _evt2(eid, uid, typ, sec):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 1, 0, 0, sec),
        user_id=uid,
        event_type=typ,
        value=1.0,
        props="{}",
    )


def test_nearest_view_direction_and_tie(spark, tmp_path):
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            _evt2(1, 1, "view", 0),
            _evt2(2, 1, "error", 10),   # prev d=10 < next d=20 → view@0
            _evt2(3, 1, "error", 25),   # prev d=25 > next d=5  → view@30
            _evt2(4, 1, "view", 30),
            _evt2(5, 2, "view", 0),
            _evt2(6, 2, "error", 5),    # tie d=5 both ways → EARLIER view
            _evt2(7, 2, "view", 10),
            _evt2(8, 3, "error", 0),    # no views at all → excluded
        ],
    )
    base = int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    got = {
        r.error_event_id: (r.nearest_view_us - base, r.dist_us)
        for r in events_nearest_view_per_error(spark, sf).collect()
    }
    s = 10**6
    assert got == {2: (0, 10 * s), 3: (30 * s, 5 * s), 6: (0, 5 * s)}
