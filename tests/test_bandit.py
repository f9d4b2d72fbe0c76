"""Offline bandit replay evaluation (queries/bandit.py)."""

from __future__ import annotations

import math

from algorithmproject_spark_spark.functions.numeric import (
    HASH_MULT,
    HASH_REDUCE,
)
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.bandit import N_ARMS, POLICIES

SF = "/root/testdata/sf0.001"


def _hm(key: int, mod: int) -> int:
    return ((key % HASH_REDUCE) * HASH_MULT) % mod


def _ppm(count: int, total: int) -> int:
    q, r = divmod(count * 1000, total)
    return q * 1000 + r * 1000 // total


def test_replay_matches_python(spark):
    from algorithmproject_spark_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "value")
        .collect()
    )
    assert rows

    def pol_arm(policy, r):
        if policy == "always_0":
            return 0
        if policy == "user_hash":
            return _hm(r["user_id"], N_ARMS)
        # engines use TRUNC division + pmod-style double-% (r9 advice)
        f = math.floor(r["value"])
        q = f // 100 if f >= 0 else -((-f) // 100)
        return ((q % N_ARMS) + N_ARMS) % N_ARMS

    want = {}
    for p in POLICIES:
        matched = [
            r for r in rows if pol_arm(p, r) == _hm(r["event_id"], N_ARMS)
        ]
        rew = sum(
            math.floor(r["value"] * 1_000_000.0 + 0.5) for r in matched
        )
        want[p] = (
            len(rows),
            len(matched),
            _ppm(len(matched), len(rows)),
            rew // len(matched) if matched else None,
        )
    got = {
        r["policy"]: (
            r["n_events"],
            r["n_matched"],
            r["match_ppm"],
            r["value_micros"],
        )
        for r in REGISTRY["events_bandit_replay_eval"].fn(spark, SF).collect()
    }
    assert got == want
    # a uniform logging policy matches any fixed/deterministic policy
    # on ~1/K of events — sanity-check the replay keeps a real sample
    for p, (n, m, *_rest) in want.items():
        assert 0 < m < n, p


def test_value_band_arm_in_range_for_negative_values(spark):
    """r9 advice: value <= -100 produced a NEGATIVE band under trunc
    division + sign-preserving %, an arm id that can never match a
    logged arm — those events were silently excluded. The pmod form
    must land every value in [0, N_ARMS), identically in Spark and
    DuckDB."""
    import duckdb

    from algorithmproject_spark_spark.queries.bandit import (
        _policy_arm,
        _sql_policy_arm,
    )

    vals = [-450.5, -250.0, -100.0, -99.9, -0.5, 0.0, 99.9, 100.0, 350.2]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = [
        r.arm
        for r in df.select(_policy_arm("value_band").alias("arm")).collect()
    ]
    assert all(0 <= a < N_ARMS for a in got)
    sql_got = [
        row[0]
        for row in duckdb.sql(
            f"SELECT {_sql_policy_arm('value_band')} FROM "
            "(SELECT unnest($v) AS value)",
            params={"v": vals},
        ).fetchall()
    ]
    assert sql_got == got
