"""Unit tests for CUSUM change points, activation-time survival, A/B
split rates, and KWIC snippets on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from algorithmproject_spark_spark.functions.numeric import (
    HASH_MULT,
    HASH_REDUCE,
)
from algorithmproject_spark_spark.queries.product import (
    events_ab_split_rates,
    events_signup_to_purchase_survival,
)
from algorithmproject_spark_spark.queries.search import doc_kwic_snippets
from algorithmproject_spark_spark.queries.trend import (
    events_changepoint_cusum,
)


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def _ev(eid, uid, typ, day=1, sec=0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day, 0, 0, sec),
        user_id=uid,
        event_type=typ,
        value=1.0,
        props="{}",
    )


def test_cusum_level_shift_detected_at_step(spark, tmp_path):
    # counts 1,1,5,5 over 4 days: n-scaled deviations −8,−8,+8,+8 →
    # CUSUM −8,−16,−8,0 peaks (|·|) on day 2, value −16
    evs, eid = [], 0
    for day, cnt in [(1, 1), (2, 1), (3, 5), (4, 5)]:
        for _ in range(cnt):
            eid += 1
            evs.append(_ev(eid, 1, "A", day=day))
    sf = _write(spark, tmp_path, "events", evs)
    r = events_changepoint_cusum(spark, sf).collect()
    assert len(r) == 1
    d2 = (dt.date(2024, 1, 2) - dt.date(1970, 1, 1)).days
    assert (r[0].event_type, r[0].change_day, r[0].cusum_n_scaled, r[0].n_days) == ("A", d2, -16, 4)


def test_survival_counts_censoring_and_order(spark, tmp_path):
    # u1 converts 10s after signup; u2 never purchases; u3 purchased
    # only BEFORE signing up (must count as censored)
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            _ev(1, 1, "signup", sec=0),
            _ev(2, 1, "purchase", sec=10),
            _ev(3, 2, "signup", sec=0),
            _ev(4, 3, "purchase", sec=0),
            _ev(5, 3, "signup", sec=30),
        ],
    )
    r = events_signup_to_purchase_survival(spark, sf).collect()[0]
    assert (r.n_signups, r.n_converted, r.n_censored) == (3, 1, 2)
    assert (r.p25_s, r.p50_s, r.p75_s) == (10, 10, 10)


def test_ab_split_matches_hash_formula(spark, tmp_path):
    uids = [1, 2, 3, 4, 5, 6, 7, 8]
    arm = lambda u: ((u % HASH_REDUCE) * HASH_MULT) % 2
    evs = [_ev(i, u, "view") for i, u in enumerate(uids)]
    # users 1 and 2 convert
    evs += [_ev(100, 1, "purchase"), _ev(101, 2, "purchase")]
    sf = _write(spark, tmp_path, "events", evs)
    got = {
        r.arm: (r.n_users, r.n_converters, r.conv_ppm)
        for r in events_ab_split_rates(spark, sf).collect()
    }
    for a in (0, 1):
        users = [u for u in uids if arm(u) == a]
        conv = [u for u in (1, 2) if arm(u) == a]
        assert got[a] == (
            len(users),
            len(conv),
            len(conv) * 1_000_000 // len(users),
        )


def test_kwic_clamps_left_context(spark, tmp_path):
    sf = _write(
        spark,
        tmp_path,
        "documents",
        [
            Row(doc_id=1, text="a join b", lang="en", source="s", n_chars=8),
            Row(doc_id=2, text="no match here", lang="en", source="s", n_chars=13),
        ],
    )
    rows = {r.doc_id: (r.pos, r.snippet) for r in doc_kwic_snippets(spark, sf).collect()}
    # term at pos 3 < radius: snippet starts at char 1
    assert rows == {1: (3, "a join b")}
