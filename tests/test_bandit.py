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
        return (math.floor(r["value"]) // 100) % N_ARMS

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
