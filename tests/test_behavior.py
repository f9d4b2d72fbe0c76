"""Unit tests for queries/behavior.py — Markov transitions, behavioral
entropy, Benford digit audit — on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row

from algorithmproject_spark_spark.queries.behavior import (
    events_benford_digits,
    events_markov_transitions,
    user_event_entropy,
)


def _events(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _ev(eid, uid, typ, sec, value=1.0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 1, 0, 0, sec),
        user_id=uid,
        event_type=typ,
        value=value,
        props="{}",
    )


def test_markov_transitions_hand_computed(spark, tmp_path):
    # user 1 timeline: A B A B  → A→B ×2, B→A ×1
    sf = _events(
        spark,
        tmp_path,
        [_ev(1, 1, "A", 0), _ev(2, 1, "B", 1), _ev(3, 1, "A", 2),
         _ev(4, 1, "B", 3)],
    )
    rows = {
        (r.src, r.dst): (r.cnt, r.p_e6)
        for r in events_markov_transitions(spark, sf).collect()
    }
    assert rows == {("A", "B"): (2, 1_000_000), ("B", "A"): (1, 1_000_000)}


def test_markov_ts_ties_break_on_event_id(spark, tmp_path):
    # same-second events: order must follow event_id, so A(1) B(2) C(3)
    sf = _events(
        spark,
        tmp_path,
        [_ev(2, 1, "B", 0), _ev(1, 1, "A", 0), _ev(3, 1, "C", 0)],
    )
    rows = {(r.src, r.dst) for r in events_markov_transitions(spark, sf).collect()}
    assert rows == {("A", "B"), ("B", "C")}


def test_entropy_extremes(spark, tmp_path):
    # user 1: two types once each → H = ln 2; user 2: monoculture → 0
    sf = _events(
        spark,
        tmp_path,
        [_ev(1, 1, "A", 0), _ev(2, 1, "B", 1),
         _ev(3, 2, "A", 0), _ev(4, 2, "A", 1), _ev(5, 2, "A", 2)],
    )
    rows = {
        r.user_id: (r.n_events, r.n_types, r.entropy_e6)
        for r in user_event_entropy(spark, sf).collect()
    }
    ln2_e6 = math.floor(math.log(2.0) * 1e6 + 0.5)
    assert rows == {1: (2, 2, ln2_e6), 2: (3, 1, 0)}


def test_benford_digits_from_exact_cents(spark, tmp_path):
    # values 1.00, 19.99, 2.00 → cents 100, 1999, 200 → digits 1,1,2;
    # 0 and negative values are excluded
    sf = _events(
        spark,
        tmp_path,
        [_ev(1, 1, "A", 0, 1.00), _ev(2, 1, "A", 1, 19.99),
         _ev(3, 1, "A", 2, 2.00), _ev(4, 1, "A", 3, 0.0),
         _ev(5, 1, "A", 4, -5.0)],
    )
    rows = {
        r.digit: (r.n_obs, r.obs_permille, r.benford_permille)
        for r in events_benford_digits(spark, sf).collect()
    }
    assert rows == {1: (2, 666, 301), 2: (1, 333, 176)}


# ---------------------------------------------------------------------------
# Position-based multi-touch attribution
# ---------------------------------------------------------------------------
from algorithmproject_spark_spark.queries.behavior import (  # noqa: E402
    events_position_attribution,
)


def test_attribution_u_shape_and_segments(spark, tmp_path):
    # user 1: v,v,c → P(id 90); then v → P(id 91). First conversion has
    # k=3 (400k/200k/400k), second k=1 (1e6). Purchase ids are NOT
    # timeline-monotone (90 before 91 in time but after touch ids) —
    # the segment key must come from timeline order, not id order.
    sf = _events(
        spark,
        tmp_path,
        [
            _ev(1, 1, "view", 1),
            _ev(2, 1, "view", 2),
            _ev(3, 1, "click", 3),
            _ev(90, 1, "purchase", 4),
            _ev(4, 1, "view", 5),
            _ev(91, 1, "purchase", 6),
            # user 2: two touches then purchase with a SMALLER id than
            # a later purchase of user 1 — and a trailing view that
            # never converts (must be absent from the output)
            _ev(5, 2, "view", 1),
            _ev(6, 2, "click", 2),
            _ev(50, 2, "purchase", 3),
            _ev(7, 2, "view", 4),
        ],
    )
    got = {
        r.touch_id: (r.conv_id, r.pos, r.k_touches, r.credit_e6)
        for r in events_position_attribution(spark, sf).collect()
    }
    assert got == {
        1: (90, 1, 3, 400_000),
        2: (90, 2, 3, 200_000),
        3: (90, 3, 3, 400_000),
        4: (91, 1, 1, 1_000_000),
        5: (50, 1, 2, 500_000),
        6: (50, 2, 2, 500_000),
        # touch 7 unattributed → excluded
    }


def test_attribution_next_purchase_beats_smaller_later_id(spark, tmp_path):
    # Adversarial id ordering: the SECOND purchase in time has the
    # SMALLER event_id. A min-id assignment would send touch 1 to
    # purchase 10; timeline order sends it to purchase 20.
    sf = _events(
        spark,
        tmp_path,
        [
            _ev(1, 1, "view", 1),
            _ev(20, 1, "purchase", 2),
            _ev(2, 1, "view", 3),
            _ev(10, 1, "purchase", 4),
        ],
    )
    got = {
        r.touch_id: r.conv_id
        for r in events_position_attribution(spark, sf).collect()
    }
    assert got == {1: 20, 2: 10}


# ---------------------------------------------------------------------------
# Activity bitmask streaks
# ---------------------------------------------------------------------------
from algorithmproject_spark_spark.queries.behavior import (  # noqa: E402
    user_activity_bitmask,
)


def test_bitmask_streaks_hand_computed(spark, tmp_path):
    # max day = Jan 10. user 1 active on days 10,9,8,5,4 (offsets
    # 0,1,2,5,6): mask 0b1100111, current streak 3, longest 3, n=5.
    # user 2 active only day 3 (offset 7): current 0, longest 1.
    # user 3 active every day 1..10: current=longest=10.
    def _day_ev(eid, uid, day):
        return Row(
            event_id=eid,
            ts=dt.datetime(2024, 1, day),
            user_id=uid,
            event_type="view",
            value=1.0,
            props="{}",
        )

    evs, eid = [], 0
    for day in (10, 9, 8, 5, 4):
        eid += 1
        evs.append(_day_ev(eid, 1, day))
    eid += 1
    evs.append(_day_ev(eid, 2, 3))
    for day in range(1, 11):
        eid += 1
        evs.append(_day_ev(eid, 3, day))
    sf = _events(spark, tmp_path, evs)
    got = {
        r.user_id: (r.n_active, r.longest_streak, r.current_streak, r.mask)
        for r in user_activity_bitmask(spark, sf).collect()
    }
    assert got[1] == (5, 3, 3, 0b1100111)
    assert got[2] == (1, 1, 0, 1 << 7)
    assert got[3] == (10, 10, 10, (1 << 10) - 1)


def test_bitmask_full_window_does_not_overflow(spark, tmp_path):
    # A user active on EVERY day of the 63-day window packs mask =
    # 2^63-1 (BIGINT max) — the naive trailing-ones identity computes
    # mask+1 and raises on ANSI overflow; the full window must instead
    # report a 63-day streak.
    evs = []
    for i, day_off in enumerate(range(63)):
        evs.append(Row(
            event_id=i + 1,
            ts=dt.datetime(2024, 1, 1) + dt.timedelta(days=day_off),
            user_id=1,
            event_type="view",
            value=1.0,
            props="{}",
        ))
    sf = _events(spark, tmp_path, evs)
    [r] = user_activity_bitmask(spark, sf).collect()
    assert r.mask == (1 << 63) - 1
    assert (r.n_active, r.longest_streak, r.current_streak) == (63, 63, 63)

    from algorithmproject_spark_spark.queries.churn import (
        user_churn_features,
    )

    [c] = user_churn_features(spark, sf).collect()
    assert (c.current_streak, c.longest_streak) == (63, 63)
    assert (c.tenure_days, c.recency_days, c.n_active_days) == (63, 0, 63)
