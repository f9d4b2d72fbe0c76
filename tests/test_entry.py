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
