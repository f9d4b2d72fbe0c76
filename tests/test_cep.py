"""CEP pattern detection (queries/cep.py) on handmade sequences."""

from __future__ import annotations

from datetime import datetime, timedelta

from algorithmproject_spark_spark.queries.cep import error_burst_recovery

T0 = datetime(2024, 1, 1)
H = timedelta(hours=1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, i, t, et) for i, (u, t, et) in enumerate(rows)],
        ["user_id", "event_id", "ts", "event_type"],
    )


def test_burst_then_purchase_within_bound_is_recovered(spark):
    rows = [
        (1, T0, "error"),
        (1, T0 + 10 * H, "error"),
        (1, T0 + 20 * H, "error"),        # burst spans 20h ≤ 48h
        (1, T0 + 30 * H, "purchase"),     # 10h after burst end ≤ 24h
    ]
    out = {r.user_id: r for r in error_burst_recovery(_ev(spark, rows)).collect()}
    assert out[1].n_bursts == 1
    assert out[1].n_recovered == 1
    assert out[1].min_burst_span_us == 20 * 3600 * 1_000_000


def test_slow_errors_are_not_a_burst(spark):
    rows = [
        (2, T0, "error"),
        (2, T0 + 30 * H, "error"),
        (2, T0 + 60 * H, "error"),        # 60h > 48h — no burst
        (2, T0 + 61 * H, "purchase"),
    ]
    assert error_burst_recovery(_ev(spark, rows)).count() == 0


def test_late_purchase_is_not_a_recovery(spark):
    rows = [
        (3, T0, "error"),
        (3, T0 + 1 * H, "error"),
        (3, T0 + 2 * H, "error"),
        (3, T0 + 2 * H + 25 * H, "purchase"),   # 25h > 24h bound
    ]
    out = error_burst_recovery(_ev(spark, rows)).first()
    assert out.n_bursts == 1 and out.n_recovered == 0


def test_purchase_between_errors_does_not_count(spark):
    # the closing symbol must follow the burst's END, not its middle
    rows = [
        (4, T0, "error"),
        (4, T0 + 1 * H, "purchase"),
        (4, T0 + 2 * H, "error"),
        (4, T0 + 3 * H, "error"),
    ]
    out = error_burst_recovery(_ev(spark, rows)).first()
    assert out.n_bursts == 1 and out.n_recovered == 0


def test_overlapping_bursts_each_counted(spark):
    rows = [
        (5, T0, "error"),
        (5, T0 + 1 * H, "error"),
        (5, T0 + 2 * H, "error"),
        (5, T0 + 3 * H, "error"),   # errors 0-2 and 1-3 both bursts
        (5, T0 + 4 * H, "purchase"),
    ]
    out = error_burst_recovery(_ev(spark, rows)).first()
    assert out.n_bursts == 2 and out.n_recovered == 2


def test_general_pattern_matcher_strict_contiguity(spark):
    """operators/pattern.py: A B C matches only when the three symbols
    are CONSECUTIVE among relevant events; an intervening relevant
    event breaks the match, an irrelevant one does not."""
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import (
        match_contiguous_pattern,
    )

    rows = [
        # user 1: clean A B C (signup events are irrelevant — ignored)
        (1, 0, T0, "view"),
        (1, 1, T0 + 1 * H, "signup"),
        (1, 2, T0 + 2 * H, "click"),
        (1, 3, T0 + 3 * H, "purchase"),
        # user 2: A B (extra view) C — the intervening view breaks it
        (2, 4, T0, "view"),
        (2, 5, T0 + 1 * H, "click"),
        (2, 6, T0 + 2 * H, "view"),
        (2, 7, T0 + 3 * H, "purchase"),
        # user 3: A B C but the last step exceeds the gap bound
        (3, 8, T0, "view"),
        (3, 9, T0 + 1 * H, "click"),
        (3, 10, T0 + 30 * H, "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    out = match_contiguous_pattern(
        ev,
        "user_id",
        "ts",
        "event_id",
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        [24 * 3600 * 1_000_000, 24 * 3600 * 1_000_000],
    ).collect()
    assert [(r.key, r.span_us) for r in out] == [(1, 3 * 3600 * 1_000_000)]


def test_general_pattern_matcher_rejects_bad_gap_list(spark):
    import pytest
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import (
        match_contiguous_pattern,
    )

    ev = spark.createDataFrame(
        [(1, 0, T0, "view")], ["user_id", "event_id", "ts", "event_type"]
    )
    with pytest.raises(ValueError):
        match_contiguous_pattern(
            ev, "user_id", "ts", "event_id",
            [F.col("event_type") == "view"], [1],
        )


def _skev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")


def test_skip_funnel_allows_intervening_events(spark):
    """view .. (noise, error, extra view) .. click .. noise .. purchase
    still matches — the strict-contiguity matcher rejects this."""
    import datetime as dt

    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import (
        match_contiguous_pattern,
        match_skip_to_next,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (1, 1, s(0), "view"),
        (1, 2, s(10), "error"),
        (1, 3, s(20), "view"),      # relevant intervening symbol
        (1, 4, s(30), "click"),
        (1, 5, s(40), "signup"),
        (1, 6, s(50), "purchase"),
    ]
    ev = _skev(spark, rows)
    syms = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    gaps = [3600 * 1_000_000] * 2
    skip = match_skip_to_next(ev, "user_id", "ts", "event_id", syms, gaps)
    # BOTH views anchor a match (click binds to the first click after
    # each); the strict matcher only matches the second view (view at
    # t0 is followed by another relevant 'view' row -> broken)
    got = sorted((r.t_start, r.t_end) for r in skip.collect())
    us = lambda sec: int(s(sec).timestamp() * 1_000_000)
    assert got == [(us(0), us(50)), (us(20), us(50))]
    strict = match_contiguous_pattern(ev, "user_id", "ts", "event_id", syms, gaps)
    assert [(r.t_start, r.t_end) for r in strict.collect()] == [(us(20), us(50))]


def test_skip_funnel_greedy_first_binding_no_backtracking(spark):
    """Step binds to the FIRST next occurrence; if the rest of the
    pattern then times out, the anchor does NOT retry a later
    occurrence (FlinkCEP followedBy, not followedByAny)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import match_skip_to_next

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    # click@10 binds; purchase@5000 is 4990s after it -> exceeds the
    # 1000s bound. click@4500 would give purchase-click=500s (a match
    # under skip-till-ANY), but greedy binding fails the anchor.
    rows = [
        (7, 1, s(0), "view"),
        (7, 2, s(10), "click"),
        (7, 3, s(4500), "click"),
        (7, 4, s(5000), "purchase"),
    ]
    ev = _skev(spark, rows)
    out = match_skip_to_next(
        ev,
        "user_id",
        "ts",
        "event_id",
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        [1_000_000_000, 1_000_000_000],  # 1000 s each step
    ).collect()
    assert out == []


def test_skip_funnel_tie_breaks_by_order_col(spark):
    """Two clicks at the SAME timestamp: the binding takes the lower
    event_id (strictly-after in (ts, event_id) lexicographic order)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import match_skip_to_next

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (3, 1, s(0), "view"),
        (3, 5, s(10), "click"),
        (3, 4, s(10), "click"),   # same ts, lower id -> binds
        (3, 9, s(20), "purchase"),
    ]
    ev = _skev(spark, rows)
    out = match_skip_to_next(
        ev,
        "user_id",
        "ts",
        "event_id",
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        [3600 * 1_000_000] * 2,
    ).collect()
    assert len(out) == 1
    # a view at the same (ts, id) as a click must not bind itself:
    # strictness is over the (t, o) pair, checked implicitly above


def test_skip_funnel_gap_bounds_each_step(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import match_skip_to_next

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (5, 1, s(0), "view"),
        (5, 2, s(2000), "click"),     # 2000s > 1000s bound -> no match
        (5, 3, s(2100), "purchase"),
    ]
    ev = _skev(spark, rows)
    out = match_skip_to_next(
        ev,
        "user_id",
        "ts",
        "event_id",
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        [1_000_000_000, 1_000_000_000],
    ).collect()
    assert out == []


def test_pattern_matchers_reject_single_symbol(spark):
    """k=1 would crash deep in column construction; both matchers
    refuse it up front (code-review r7 finding)."""
    import pytest
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.operators.pattern import (
        match_contiguous_pattern,
        match_skip_to_next,
    )

    ev = _skev(spark, [(1, 1, __import__("datetime").datetime(2024, 1, 1), "view")])
    for fn in (match_contiguous_pattern, match_skip_to_next):
        with pytest.raises(ValueError, match="at least 2 symbols"):
            fn(ev, "user_id", "ts", "event_id", [F.col("event_type") == "view"], [])
