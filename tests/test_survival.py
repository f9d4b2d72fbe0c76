"""Survival family (queries/survival.py) — Kaplan-Meier, log-rank and
RMST checked against an independently-coded plain-Python reference
built from the raw events (not from the queries' own intermediates).
"""

from __future__ import annotations

import math

import pytest

from algorithmproject_spark_spark.functions.numeric import (
    HASH_MULT,
    HASH_REDUCE,
)
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.survival import (
    HOUR_US,
    N_ARMS,
    PURCHASE,
    SIGNUP,
)
from algorithmproject_spark_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
E6 = 1_000_000


@pytest.fixture(scope="module")
def py_life_table(spark):
    """{(arm, dur_h): [d, c]} built in plain Python from raw events."""
    rows = (
        load_table(spark, SF, "events")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    )
    first_signup: dict[int, int] = {}
    mx_us = max(r["us"] for r in rows)
    for r in rows:
        if r["event_type"] == SIGNUP:
            u = r["user_id"]
            if u not in first_signup or r["us"] < first_signup[u]:
                first_signup[u] = r["us"]
    first_purch: dict[int, int] = {}
    for r in rows:
        if r["event_type"] == PURCHASE and r["user_id"] in first_signup:
            u = r["user_id"]
            if r["us"] >= first_signup[u] and (
                u not in first_purch or r["us"] < first_purch[u]
            ):
                first_purch[u] = r["us"]
    lt: dict[tuple[int, int], list[int]] = {}
    for u, s_us in first_signup.items():
        arm = ((u % HASH_REDUCE) * HASH_MULT) % N_ARMS
        p_us = first_purch.get(u)
        dur = ((p_us if p_us is not None else mx_us) - s_us) // HOUR_US
        cell = lt.setdefault((arm, dur), [0, 0])
        cell[0 if p_us is not None else 1] += 1
    assert lt, "fixture produced an empty cohort"
    return lt


def _py_km(lt, arm):
    """[(dur_h, n_risk, d, c, s_e6)] ascending for one arm."""
    rows = sorted(
        (dur, d, c) for (a, dur), (d, c) in lt.items() if a == arm
    )
    remaining = sum(d + c for _, d, c in rows)
    s, out = E6, []
    for dur, d, c in rows:
        n_risk = remaining
        if d > 0:
            s = (s * (n_risk - d)) // n_risk
        out.append((dur, n_risk, d, c, s))
        remaining -= d + c
    return out


def test_kaplan_meier_matches_python(spark, py_life_table):
    out = REGISTRY["events_kaplan_meier"].fn(spark, SF).collect()
    got = {
        (r["arm"], r["dur_h"]): (
            r["n_risk"],
            r["n_events"],
            r["n_censored"],
            r["s_e6"],
        )
        for r in out
    }
    want = {}
    for arm in range(N_ARMS):
        for dur, n_risk, d, c, s in _py_km(py_life_table, arm):
            want[(arm, dur)] = (n_risk, d, c, s)
    assert got == want


def test_km_curve_invariants(spark):
    out = REGISTRY["events_kaplan_meier"].fn(spark, SF).collect()
    by_arm: dict[int, list] = {}
    for r in out:
        by_arm.setdefault(r["arm"], []).append(r)
    assert set(by_arm) <= set(range(N_ARMS))
    for arm, rows in by_arm.items():
        rows.sort(key=lambda r: r["dur_h"])
        s_prev, risk_prev = E6, None
        for r in rows:
            assert 0 <= r["s_e6"] <= s_prev, f"S(t) not non-increasing @{arm}"
            s_prev = r["s_e6"]
            assert r["n_risk"] >= r["n_events"] + r["n_censored"] >= 1
            if risk_prev is not None:
                assert r["n_risk"] < risk_prev
            risk_prev = r["n_risk"]


def test_logrank_matches_python(spark, py_life_table):
    # python reference: grid over all durations, reverse-cum at-risk
    durs = sorted({dur for _, dur in py_life_table})
    at_risk = {}
    for arm in range(N_ARMS):
        rem = sum(
            d + c for (a, _), (d, c) in py_life_table.items() if a == arm
        )
        for dur in durs:
            at_risk[(arm, dur)] = rem
            d, c = py_life_table.get((arm, dur), (0, 0))
            rem -= d + c
    o1 = e1 = v = npts = 0
    for dur in durs:
        d1 = py_life_table.get((0, dur), (0, 0))[0]
        d = d1 + py_life_table.get((1, dur), (0, 0))[0]
        n1 = at_risk[(0, dur)]
        n = n1 + at_risk[(1, dur)]
        if d == 0 or n == 0:
            continue
        npts += 1
        o1 += d1
        cnt = d * n1
        q = cnt * 1000 // n
        e1_t = q * 1000 + (cnt * 1000 % n) * 1000 // n  # exact ppm()
        e1 += e1_t
        if n > 1:
            v += (e1_t * (n - n1)) // n * (n - d) // (n - 1)
    r = REGISTRY["events_logrank_test"].fn(spark, SF).collect()[0]
    assert (r["n_timepoints"], r["o1"], r["e1_e6"], r["v_e6"]) == (
        npts,
        o1,
        e1,
        v,
    )
    if v > 0:
        z = (o1 * E6 - e1) / (1000.0 * math.sqrt(float(v)))
        assert r["z_micros"] == math.floor(z * E6 + 0.5)
    else:
        assert r["z_micros"] is None


def test_rmst_matches_km_area(spark, py_life_table):
    tau = max(dur for _, dur in py_life_table)
    out = {
        r["arm"]: r
        for r in REGISTRY["events_rmst_per_arm"].fn(spark, SF).collect()
    }
    for arm in range(N_ARMS):
        curve = _py_km(py_life_table, arm)
        if not curve:
            assert arm not in out
            continue
        rmst = curve[0][0] * E6  # S=1e6 on [0, first duration)
        for (dur, *_rest, s), nxt in zip(
            curve, [c[0] for c in curve[1:]] + [tau]
        ):
            rmst += s * (nxt - dur)
        r = out[arm]
        assert (r["tau_h"], r["rmst_e6h"]) == (tau, rmst)
        assert r["rmst_e6h"] <= tau * E6
