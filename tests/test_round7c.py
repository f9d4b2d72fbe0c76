"""Unit tests for the round-7c query families — Pareto skyline, exact
OLS trend slope, recency-decayed score, gaps-and-islands, trigram
sequences, RA link prediction — on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from algorithmproject_spark_spark.queries.behavior import (
    events_state_islands,
    events_trigram_sequences,
)
from algorithmproject_spark_spark.queries.reco import (
    supplier_ra_link_prediction,
)
from algorithmproject_spark_spark.queries.skyline import part_pareto_frontier
from algorithmproject_spark_spark.queries.trend import (
    events_trend_slope_per_type,
    user_recency_weighted_value,
)


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def _ev(eid, uid, typ, day=1, sec=0, value=1.0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day, 0, 0, sec),
        user_id=uid,
        event_type=typ,
        value=value,
        props="{}",
    )


def _part(pk, price, size):
    return Row(
        p_partkey=pk,
        p_name=f"part{pk}",
        p_brand="B",
        p_type="T",
        p_size=size,
        p_retailprice=price,
    )


def test_pareto_frontier_hand_computed(spark, tmp_path):
    # (4.00, 10) ×2 on frontier (mutual ties survive); (5.00, 10)
    # dominated by cheaper-equal-size; (5.00, 8) dominated;
    # (6.00, 12) frontier (biggest size)
    sf = _write(
        spark,
        tmp_path,
        "part",
        [
            _part(1, 5.00, 10),
            _part(2, 5.00, 8),
            _part(3, 4.00, 10),
            _part(4, 6.00, 12),
            _part(5, 4.00, 10),
        ],
    )
    rows = [
        (r.p_partkey, r.price_c, r.p_size)
        for r in part_pareto_frontier(spark, sf).collect()
    ]
    assert rows == [(3, 400, 10), (5, 400, 10), (4, 600, 12)]


def test_trend_slope_exact_unit_slope(spark, tmp_path):
    # type A: 1, 2, 3 events on 3 consecutive days → slope exactly 1
    # (num = den = 6 for any day offset); type B: single day → dropped
    evs = [_ev(i, 1, "A", day=1) for i in range(1)]
    evs += [_ev(10 + i, 1, "A", day=2) for i in range(2)]
    evs += [_ev(20 + i, 1, "A", day=3) for i in range(3)]
    evs += [_ev(90, 2, "B", day=1)]
    sf = _write(spark, tmp_path, "events", evs)
    rows = {
        r.event_type: (r.n_days, r.slope_num, r.slope_den, r.total_events)
        for r in events_trend_slope_per_type(spark, sf).collect()
    }
    assert rows == {"A": (3, 6, 6, 6)}


def test_recency_weighted_halving(spark, tmp_path):
    # user 1: 1.00 on the anchor day (shift 0) + 1.00 fourteen days
    # earlier (2 half-lives, shift 2); non-positive values excluded
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            _ev(1, 1, "A", day=15, value=1.0),
            _ev(2, 1, "A", day=1, value=1.0),
            _ev(3, 2, "A", day=15, value=0.0),
        ],
    )
    rows = {
        r.user_id: r.score_q20
        for r in user_recency_weighted_value(spark, sf).collect()
    }
    base = 100 * (1 << 20)
    assert rows == {1: base + base // 4}


def test_state_islands_run_collapse(spark, tmp_path):
    # user 1: A A B A → islands (A,2) (B,1) (A,1)
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            _ev(1, 1, "A", sec=0),
            _ev(2, 1, "A", sec=1),
            _ev(3, 1, "B", sec=2),
            _ev(4, 1, "A", sec=3),
        ],
    )
    rows = [
        (r.user_id, r.event_type, r.n_events)
        for r in events_state_islands(spark, sf).collect()
    ]
    assert rows[0] == (1, "A", 2)
    assert sorted(rows) == [(1, "A", 1), (1, "A", 2), (1, "B", 1)]
    # interval bounds of the 2-event island
    top = events_state_islands(spark, sf).collect()[0]
    assert top.end_us - top.start_us == 1_000_000


def test_trigram_sequences(spark, tmp_path):
    # A B C D → ABC, BCD; user 2's lone pair contributes nothing
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            _ev(1, 1, "A", sec=0),
            _ev(2, 1, "B", sec=1),
            _ev(3, 1, "C", sec=2),
            _ev(4, 1, "D", sec=3),
            _ev(5, 2, "A", sec=0),
            _ev(6, 2, "B", sec=1),
        ],
    )
    rows = {
        (r.t1, r.t2, r.t3): r.cnt
        for r in events_trigram_sequences(spark, sf).collect()
    }
    assert rows == {("A", "B", "C"): 1, ("B", "C", "D"): 1}


def _li(pk, sk):
    return Row(
        l_orderkey=1,
        l_partkey=pk,
        l_suppkey=sk,
        l_linenumber=1,
        l_quantity=1.0,
        l_extendedprice=1.0,
        l_discount=0.0,
        l_tax=0.0,
        l_returnflag="N",
        l_linestatus="O",
        l_shipdate=dt.datetime(2024, 1, 1),
    )


def test_ra_link_prediction_weights(spark, tmp_path):
    # part 10 ⊃ {1,2} (deg 2 → 5e8); part 20 ⊃ {1,2,3} (deg 3 →
    # 333333333); duplicate lineitem rows collapse before scoring
    sf = _write(
        spark,
        tmp_path,
        "lineitem",
        [
            _li(10, 1),
            _li(10, 2),
            _li(10, 2),
            _li(20, 1),
            _li(20, 2),
            _li(20, 3),
        ],
    )
    rows = {
        (r.supp_i, r.supp_j): (r.common_parts, r.ra_e9)
        for r in supplier_ra_link_prediction(spark, sf).collect()
    }
    assert rows == {
        (1, 2): (2, 500_000_000 + 333_333_333),
        (1, 3): (1, 333_333_333),
        (2, 3): (1, 333_333_333),
    }


def test_islands_same_ts_burst_tie_includes_end_us(spark, tmp_path):
    # same-second burst A,B,A then A one second later: the trailing
    # A-run spans two timestamps while the leading 1-event islands all
    # share start==end — regression for the LIMIT-boundary tiebreak
    # (sort key must be unique up to full-row identity, so end_us is
    # part of the ORDER BY)
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            _ev(1, 1, "A", sec=0),
            _ev(2, 1, "B", sec=0),
            _ev(3, 1, "A", sec=0),
            _ev(4, 1, "A", sec=1),
        ],
    )
    rows = [
        (r.user_id, r.event_type, r.start_us, r.end_us, r.n_events)
        for r in events_state_islands(spark, sf).collect()
    ]
    assert len(rows) == 3
    # deterministic order: the 2-event A island (spanning 1s) first
    assert rows[0][4] == 2 and rows[0][1] == "A"
    assert rows[0][3] - rows[0][2] == 1_000_000
    # the two 1-event same-ts islands sort after; both start==end
    assert all(r[2] == r[3] for r in rows[1:])
