"""CI lint over every registered DuckDB oracle's RESULT SCHEMA.

The external driver hashes (column-name-sorted) result values from both
engines; two artifact classes have produced red driver rows across two
consecutive rounds despite value-identical results:

1. DuckDB ``sum(BIGINT)`` returns HUGEINT (int128). Spark's sum of a
   long is BIGINT, and the driver's value hash distinguishes the types.
   (r01: q1 / window_running_total / events_multires_rollup; r02:
   product_score_per_class, media_meta_stats.)
2. List-typed result columns crash the driver's pandas canonicalizer
   (``TypeError: unhashable type: 'list'``). (r02: lang_doc_ids_salted.)

DECIMAL is banned for the same reason as HUGEINT: Spark has no query
emitting DecimalType, so a DECIMAL oracle column is always a latent
hash mismatch.

This test executes every oracle against DuckDB at the smoke SF (cheap:
schema only needs LIMIT 0 after planning, but we run the full query so
type inference on aggregates is exact) and fails with the offending
query + column names, ending the bug class at commit time instead of a
round later in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import pytest

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.sources.catalog import TABLES
from tests.conftest import SF_SMOKE

BANNED_TYPE_FRAGMENTS = ("HUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield c
    c.close()


ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_result_schema_is_driver_hashable(con, name):
    rel = con.sql(REGISTRY[name].oracle)
    offenders = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(frag in t for frag in BANNED_TYPE_FRAGMENTS):
            offenders.append(f"{col}: {t} (wrap in CAST(... AS BIGINT/DOUBLE))")
        if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
            offenders.append(
                f"{col}: {t} (driver canonicalizer cannot hash nested cells — "
                "digest with md5(array_to_string(...)))"
            )
    assert not offenders, f"oracle '{name}' emits driver-unhashable columns: {offenders}"


def test_all_oracles_covered():
    # Guard against the parametrize list silently going empty.
    assert len(ORACLED) >= 70
