"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, and every query executes at sf0.001."""

from __future__ import annotations

import importlib

from tests.conftest import SF_SMOKE


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["word", "n"]


def test_registry_consistency():
    mod = _entry_mod()
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_all_queries_run_smoke(spark):
    mod = _entry_mod()
    for name, fn in mod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_ordered_names_rotation():
    """Driver-check rotation: names with no green driver row sort first
    (new queries get checked the round they land), and already-green
    names follow least-recently-checked first so a capped pass rotates
    through the whole registry (VERDICT r8 #5)."""
    import glob
    import json
    import os

    import __spark_entry__ as entry
    from algorithmproject_spark_spark.queries import REGISTRY

    names = entry._ordered_names()
    assert sorted(names) == sorted(REGISTRY)

    here = os.path.dirname(os.path.abspath(entry.__file__))
    files = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if len(files) < 2:
        return
    last: dict[str, int] = {}
    green: set[str] = set()
    for rnd, path in enumerate(files, start=1):
        rows = json.load(open(path))
        for n, row in rows.items():
            last[n] = rnd
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and row.get("err") is None
            ):
                green.add(n)
    # fresh (never-green) names all precede green names
    first_green = next(i for i, n in enumerate(names) if n in green)
    assert all(n in green for n in names[first_green:])
    # among green names, last-checked rounds are non-decreasing
    rounds = [last[n] for n in names if n in green]
    assert rounds == sorted(rounds), "green names not least-recently-checked"
