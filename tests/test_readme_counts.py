"""README/SURVEY registry counts must track the actual registry.

The counts in prose drifted twice (round-7 advice: README said 246 when
the registry held 248) because they were hand-edited. This gate makes
the documented numbers derived-by-assertion: change the registry, and
these tests name every stale line.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry_counts() -> tuple[int, int, int]:
    from algorithmproject_spark_spark.queries import REGISTRY

    total = len(REGISTRY)
    oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    return total, oracle, total - oracle


def test_readme_counts_match_registry():
    total, oracle, rows_only = _registry_counts()
    text = (REPO / "README.md").read_text(encoding="utf-8")
    m = re.search(
        r"(\d+) named, driver-checkable\s+queries.*?"
        r"(\d+) DuckDB-oracle-checked,\s+(\d+) rows-only",
        text,
        re.S,
    )
    assert m, "README.md registry-count sentence not found"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        total,
        oracle,
        rows_only,
    ), f"README says {m.groups()}, registry is {(total, oracle, rows_only)}"


def test_survey_closing_counts_match_registry():
    total, oracle, _ = _registry_counts()
    text = (REPO / "SURVEY.md").read_text(encoding="utf-8")
    # Historical round-close sentences stay in the narrative; only the
    # LAST one must track the live registry.
    matches = re.findall(
        r"closes at (\d+)\s+registered\s+queries — (\d+) hash-pass", text
    )
    assert matches, "SURVEY.md closing-count sentence not found"
    last = matches[-1]
    assert (int(last[0]), int(last[1])) == (total, oracle), (
        f"SURVEY closing says {last}, registry is {(total, oracle)}"
    )
