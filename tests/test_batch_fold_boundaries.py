"""Arrow-batch-boundary safety of the vectorized batch-twin folds.

VERDICT r12 #6: the markov/profile batch twins used to concat the
whole shuffle partition into one pandas frame; r13 replaced that with
incremental per-batch folds (carry row for adjacency, additive
partials + running distinct pairs for the profile). These tests force
MANY tiny Arrow batches per partition (maxRecordsPerBatch=3 over
dozens of rows) and pin the results to a pure-Python re-derivation —
if a fold ever drops or double-counts a batch-boundary pair, this is
the test that goes red.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    yield spark
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _events(spark, n_users: int = 4, n_per_user: int = 13):
    rows = []
    eid = 0
    for u in range(n_users):
        for i in range(n_per_user):
            rows.append(
                (u, f"e{(i * (u + 1)) % 5}", i, eid, 1.0 + 0.07 * eid)
            )
            eid += 1
    return rows, spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long, value double"
    )


def test_markov_twin_counts_across_many_arrow_batches(tiny_batches):
    spark = tiny_batches
    from algorithmproject_spark_spark.streaming.markov import (
        transition_counts_batch,
    )

    rows, df = _events(spark)
    got = {
        (r.user_id, r.src, r.dst): r.cnt
        for r in transition_counts_batch(df).collect()
    }
    # expected: per user, sort by (ts, event_id), count adjacent pairs
    expected: dict = defaultdict(int)
    by_user: dict = defaultdict(list)
    for u, et, ts, eid, _v in rows:
        by_user[u].append((ts, eid, et))
    for u, seq in by_user.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            expected[(u, a, b)] += 1
    assert got == dict(expected)


def test_profile_twin_aggregates_across_many_arrow_batches(tiny_batches):
    spark = tiny_batches
    from algorithmproject_spark_spark.streaming.stateful import (
        user_profile_batch,
    )

    rows, df = _events(spark)
    got = {
        r.user_id: (r.n_events, r.value_cents, r.n_types)
        for r in user_profile_batch(df).collect()
    }
    expected: dict = {}
    by_user: dict = defaultdict(list)
    for u, et, _ts, _eid, v in rows:
        by_user[u].append((et, v))
    for u, seq in by_user.items():
        cents = sum(int(math.floor(v * 100 + 0.5)) for _, v in seq)
        expected[u] = (len(seq), cents, len({et for et, _ in seq}))
    assert got == expected
