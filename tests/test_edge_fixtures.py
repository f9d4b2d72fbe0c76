"""CI slice of the edge-fixture sweep (tools/edge_fixture_sweep.py).

The full registry × {empty, mini} sweep runs per round and is committed
as EDGE_SWEEP_r{N}.json; this keeps the formerly-divergent queries (and
the failure classes they represent) gated between sweeps: every query
here must produce the SAME value multiset as its DuckDB oracle on a
corpus of EMPTY tables — no ANSI divide-by-zero where DuckDB NULLs, no
NULL list() vs [] collect_list, no grand-total-row grouping-set
disagreement, no driver-side ZeroDivisionError."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.sources.catalog import TABLES, load_table

SF = "/root/testdata/sf0.001"

# One representative per formerly-divergent failure class + the scalar
# composites most exposed to empty-input arithmetic.
SAMPLE = (
    "rollup_returnflag_status",    # grouping-set grand-total semantics
    "cube_status_priority",
    "events_kmv_merged_global",    # NULL list() vs [] collect_list
    "events_kmv_type_intersection",
    "corpus_pagerank_topk",        # driver-side base division
    "corpus_datacard",             # ANSI div-by-zero vs DuckDB NULL
    "langid_cohens_kappa",
    "user_churn_features",
)


def _norm_cell(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, SF, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="module")
def con(empty_sf):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{empty_sf}/{t}.parquet/*.parquet'"
        )
    return c


@pytest.mark.parametrize("name", SAMPLE)
def test_empty_tables_agree_with_oracle(spark, empty_sf, con, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, empty_sf)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert _normalize(srows, scols) == _normalize(drows, dcols)
