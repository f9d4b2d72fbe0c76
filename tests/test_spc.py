"""Unit tests for the SPC/merchandising family — dow profile, p-chart,
ABC classes, spend-band migration — on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from algorithmproject_spark_spark.queries.spc import (
    customer_band_migration,
    events_dow_profile,
    events_error_pchart_days,
    part_abc_classes,
)


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def _ev(eid, typ, day):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day),
        user_id=1,
        event_type=typ,
        value=1.0,
        props="{}",
    )


def test_dow_profile_shares(spark, tmp_path):
    # 3 views on Jan 1 + 1 view on Jan 2 → shares 750/250 permille
    sf = _write(
        spark,
        tmp_path,
        "events",
        [_ev(1, "view", 1), _ev(2, "view", 1), _ev(3, "view", 1),
         _ev(4, "view", 2)],
    )
    d1 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days % 7
    d2 = (dt.date(2024, 1, 2) - dt.date(1970, 1, 1)).days % 7
    got = {
        (r.dow): (r.n, r.share_permille)
        for r in events_dow_profile(spark, sf).collect()
    }
    assert got == {d1: (3, 750), d2: (1, 250)}


def test_pchart_flags_only_the_spike(spark, tmp_path):
    # 100 events/day; errors 20,20,20,50 → P=275 permille; normal days
    # d^2*n = 562500 < 9*275*725 = 1794375 (in control); spike day
    # d^2*n = 5062500 > threshold (out of control)
    evs, eid = [], 0
    for day, n_err in [(1, 20), (2, 20), (3, 20), (4, 50)]:
        for i in range(100):
            eid += 1
            evs.append(_ev(eid, "error" if i < n_err else "view", day))
    sf = _write(spark, tmp_path, "events", evs)
    got = {
        r.day: (r.p_hat_permille, r.out_of_control)
        for r in events_error_pchart_days(spark, sf).collect()
    }
    d = lambda day: (dt.date(2024, 1, day) - dt.date(1970, 1, 1)).days
    assert got == {
        d(1): (200, 0),
        d(2): (200, 0),
        d(3): (200, 0),
        d(4): (500, 1),
    }


def _li(pk, price):
    return Row(
        l_orderkey=1,
        l_partkey=pk,
        l_suppkey=1,
        l_linenumber=pk,
        l_quantity=1.0,
        l_extendedprice=price,
        l_discount=0.0,
        l_tax=0.0,
        l_returnflag="N",
        l_linestatus="O",
        l_shipdate=dt.datetime(2024, 1, 1),
    )


def test_abc_classes_80_15_5(spark, tmp_path):
    # revenues 80/15/5: cumulative 80% → A, 95% → B, 100% → C
    sf = _write(
        spark,
        tmp_path,
        "lineitem",
        [_li(1, 80.0), _li(2, 15.0), _li(3, 5.0)],
    )
    got = {
        r.abc: (r.n_parts, r.revenue_cents, r.min_part_cents)
        for r in part_abc_classes(spark, sf).collect()
    }
    assert got == {
        "A": (1, 8000, 8000),
        "B": (1, 1500, 1500),
        "C": (1, 500, 500),
    }


def _order(ok, cust, price, day):
    return Row(
        o_orderkey=ok,
        o_custkey=cust,
        o_orderstatus="O",
        o_totalprice=price,
        o_orderdate=dt.datetime(2024, 1, day),
        o_orderpriority="1",
    )


def test_band_migration_with_churn_and_new(spark, tmp_path):
    # half 1 (median cut = day 1): custs 1,2,3 spend 10/20/30 → bands
    # 1/2/3; half 2: custs 3,4,2 spend 10/20/30 → bands 1/2/3.
    # cust 1 churns (→0), cust 4 is new (0→).
    sf = _write(
        spark,
        tmp_path,
        "orders",
        [
            _order(1, 1, 10.0, 1),
            _order(2, 2, 20.0, 1),
            _order(3, 3, 30.0, 1),
            _order(4, 3, 10.0, 2),
            _order(5, 4, 20.0, 2),
            _order(6, 2, 30.0, 2),
        ],
    )
    got = {
        (r.band_then, r.band_now): r.n_customers
        for r in customer_band_migration(spark, sf).collect()
    }
    assert got == {(1, 0): 1, (2, 3): 1, (3, 1): 1, (0, 2): 1}


def test_udtf_first_occurrence_state(spark, tmp_path):
    from algorithmproject_spark_spark.queries.udtf_demo import (
        doc_token_positions_udtf,
    )

    # doc 1: "a b a" → a: n=2, firsts=1, min_pos=1; b: n=1, firsts=1
    # doc 2: "b b"   → b: n=2, firsts=1 (second b is NOT first)
    sf = _write(
        spark,
        tmp_path,
        "documents",
        [
            Row(doc_id=1, text="a b a", lang="en", source="s", n_chars=5),
            Row(doc_id=2, text="b b", lang="en", source="s", n_chars=3),
        ],
    )
    got = {
        r.tok: (r.n_total, r.n_first_docs, r.min_pos)
        for r in doc_token_positions_udtf(spark, sf).collect()
    }
    assert got == {"a": (2, 1, 1), "b": (3, 2, 1)}


# ---------------------------------------------------------------------------
# Seasonally-adjusted robust outliers
# ---------------------------------------------------------------------------
from algorithmproject_spark_spark.queries.spc import (  # noqa: E402
    events_dow_adjusted_outliers,
)


def test_dow_adjusted_flags_only_the_seasonal_break(spark, tmp_path):
    # Two full weeks: weekdays carry 10 events, the two weekend dows
    # carry 100 — a raw-count detector would flag every weekend. Week 2
    # has ONE weekday spiking to 40: after dow-mean removal it is the
    # only large residual.
    evs, eid = [], 0
    for day in range(1, 15):
        dow = (dt.date(2024, 1, day) - dt.date(1970, 1, 1)).days % 7
        n = 100 if dow in (2, 3) else 10
        if day == 10 and dow not in (2, 3):
            n = 40
        for _ in range(n):
            eid += 1
            evs.append(_ev(eid, "view", day))
    sf = _write(spark, tmp_path, "events", evs)
    rows = {r.day: r for r in events_dow_adjusted_outliers(spark, sf).collect()}
    spike_day = (dt.date(2024, 1, 10) - dt.date(1970, 1, 1)).days
    assert rows[spike_day].is_outlier == 1
    # with 2 observations per dow the spike also shifts its OWN dow
    # mean, so its partner day legitimately deviates too — but no day
    # of any OTHER dow may be flagged (raw-count detectors would flag
    # every 100-event weekend)
    spike_dow = rows[spike_day].dow
    for r in rows.values():
        if r.dow != spike_dow:
            assert r.is_outlier == 0
    # weekend days sit exactly on their dow mean → residual 0
    weekend = [r for r in rows.values() if r.dow in (2, 3)]
    assert weekend and all(r.r_e6 == 0 for r in weekend)
