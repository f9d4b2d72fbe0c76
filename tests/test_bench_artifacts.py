"""Committed bench records must be COMPLETE per-query dicts.

VERDICT r9 #2: rounds 5–9 committed the COMPACT stdout line (top-39
slowest + ``n_queries``) as BENCH_LOCAL_r{N}.json / BENCH_SF1_r{N}.json,
so per-query ratios could not be independently recomputed from
artifacts. bench.py writes the full record to its OUT file — that file
is what gets committed. This gate pins the contract from round 10 on:
a committed record either carries every query it claims
(``len(queries) == n_queries``) or carries no ``n_queries`` marker at
all (the full payload never has one).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Rounds whose committed records are known-compact (pre-dates this
# gate; the full sf1 records no longer exist on any disk to backfill).
_GRANDFATHERED_MAX_ROUND = 9


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else 0


def test_committed_bench_records_are_complete():
    paths = glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")) + glob.glob(
        os.path.join(REPO, "BENCH_SF1_r*.json")
    )
    assert paths, "no committed bench records found"
    checked = 0
    for path in sorted(paths):
        if _round_of(path) <= _GRANDFATHERED_MAX_ROUND:
            continue
        with open(path, encoding="utf-8") as fh:
            rec = json.load(fh)
        n = rec.get("n_queries", len(rec["queries"]))
        assert len(rec["queries"]) == n, (
            f"{os.path.basename(path)} is a truncated compact line: "
            f"{len(rec['queries'])} of {n} queries"
        )
        # a complete record's total must be the sum of its parts
        assert abs(sum(rec["queries"].values()) - rec["value"]) < 0.01, (
            f"{os.path.basename(path)}: value != sum(queries)"
        )
        checked += 1
    # vacuous until the round-10 records land; real from then on
    if checked == 0:
        import pytest

        pytest.skip("no post-r9 bench records committed yet")


def test_stdout_line_fits_driver_tail_window():
    """VERDICT r10 #8: the driver keeps only a 2000-char stdout tail
    (BENCH_r05/r06 tails are exactly 2000 with the full line
    head-truncated and parsed=null), so a 250+-query dict can never
    ride stdout. The contract instead: the printed line always fits
    the window, parses, carries the full count as ``n_queries`` and
    points at the committed complete record via ``full_record``."""
    import sys

    sys.path.insert(0, REPO)
    from bench import STDOUT_LINE_BUDGET, compact_stdout_line

    timings = {f"query_name_number_{i:03d}": i * 0.137 for i in range(300)}
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "reps": 3,
        "spread": {k: [v, v] for k, v in timings.items()},
    }
    line = compact_stdout_line(payload, timings, "BENCH_LOCAL.json")
    assert len(line) <= STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["n_queries"] == 300
    assert parsed["full_record"] == "BENCH_LOCAL.json"
    assert parsed["value"] == payload["value"]
    # the trimmed sample is the SENTINEL set first (stable cross-round
    # comparison surface, VERDICT r12 #2), then the slowest remainder
    from bench import SENTINELS

    kept = set(parsed["queries"])
    sent_present = [n for n in SENTINELS if n in timings]
    assert set(sent_present) <= kept or not sent_present
    non_sent = kept - set(SENTINELS)
    slowest = sorted(
        (k for k in timings if k not in SENTINELS),
        key=lambda k: -timings[k],
    )[: len(non_sent)]
    assert non_sent == set(slowest)

    # a small payload passes through verbatim, full dict included
    small_t = {"q1": 1.0, "q2": 2.0}
    small = dict(payload, queries=small_t)
    small.pop("spread")
    small.pop("reps")
    sline = compact_stdout_line(small, small_t, "BENCH_LOCAL.json")
    assert json.loads(sline)["queries"] == small_t


def test_stdout_line_guard_on_pathological_record_name():
    """ADVICE r11: even with a record name long enough that the minimal
    compact object exceeds the budget, the printed line must stay
    within the window and keep the contract fields parseable."""
    import sys

    sys.path.insert(0, REPO)
    from bench import STDOUT_LINE_BUDGET, compact_stdout_line

    timings = {f"q{i}": float(i) for i in range(50)}
    payload = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }
    line = compact_stdout_line(payload, timings, "R" * 3000)
    assert len(line) <= STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 1.0
