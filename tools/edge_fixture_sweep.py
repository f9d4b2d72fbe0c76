"""Edge-fixture sweep — the full registry against EMPTY and MINIMAL
tables, cross-engine.

Production tables are sometimes empty (a new partition, a filtered
branch, a feed outage) and sometimes tiny (one straggler row). The
standard-fixture oracle never exercises those regimes, and the bug
class that lives there is *divergent failure behavior*: Spark under
ANSI mode raises on integer division by zero while DuckDB's ``//``
returns NULL, `element_at` on an empty array raises vs NULL, a
max-normalizer meets an empty relation, a fold meets an empty list.
(The round-6 advisor's kmv_merge finding — INVALID_INDEX_OF_ZERO on an
empty events table — is exactly this class; this tool makes the whole
registry face it.)

For every registered query × {empty, mini} fixture the sweep records:

- ``match``            — both engines returned the same value multiset
- ``both_empty``       — both returned zero rows (the usual good case)
- ``both_error``       — both failed (acceptable loud behavior, but
                         recorded so the classes can be reviewed)
- ``spark_error_only`` / ``duck_error_only`` — DIVERGENT failure: one
                         engine errors where the other returns rows —
                         the finding class this sweep exists for
- ``mismatch``         — both returned rows, values differ
- ``rows_only``        — no oracle; Spark ran (row count recorded)
- ``rows_only_error``  — no oracle; Spark raised

Fixtures: ``empty`` = every table written with its real schema and
zero rows; ``mini`` = the first 3 rows of each table by its leading
column (referential integrity intentionally broken — joins must
tolerate dangling keys).

Usage: python tools/edge_fixture_sweep.py [query ...]
Set EDGE_SWEEP_JSON=<path> to write the artifact (EDGE_SWEEP_r{N}.json).
Exit code 1 only on mismatch / one-sided error (divergences); both_error
and empty results are recorded, not failed — the gate is agreement, not
non-emptiness.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from algorithmproject_spark_spark.cacheutil import release_caches
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark
from algorithmproject_spark_spark.sources.catalog import TABLES, load_table

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import _normalize  # noqa: E402

BASE = "/root/testdata/sf0.001"
EDGE_ROOT = "/tmp/spark_graft_edge"


def build_fixtures(spark) -> dict[str, str]:
    out = {}
    for kind, n in (("empty", 0), ("mini", 3)):
        d = os.path.join(EDGE_ROOT, kind)
        marker = os.path.join(d, ".complete")
        out[kind] = d
        if os.path.exists(marker):
            continue
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            df = load_table(spark, BASE, t)
            part = df.limit(0) if n == 0 else df.orderBy(df.columns[0]).limit(n)
            part.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, f"{t}.parquet")
            )
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("ok\n")
    return out


def main() -> int:
    names = sys.argv[1:]
    targets = {n: REGISTRY[n] for n in names} if names else REGISTRY
    spark = get_spark("edge-sweep")
    fixtures = build_fixtures(spark)

    record: dict[str, dict[str, dict]] = {}
    n_diverge = 0
    counts: dict[str, int] = {}

    for kind, sf_dir in fixtures.items():
        con = duckdb.connect()
        for t in TABLES:
            # Spark writes <table>.parquet as a DIRECTORY of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet/*.parquet'"
            )
        for name, spec in targets.items():
            s_err = d_err = None
            srows = scols = None
            try:
                sdf = spec.fn(spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as exc:  # noqa: BLE001
                s_err = f"{type(exc).__name__}: {str(exc)[:160]}"
            if spec.oracle is None:
                st = "rows_only" if s_err is None else "rows_only_error"
                entry = {"status": st}
                if s_err:
                    entry["spark_error"] = s_err
                else:
                    entry["rows"] = len(srows)
                record.setdefault(name, {})[kind] = entry
                counts[st] = counts.get(st, 0) + 1
                continue
            drows = dcols = None
            try:
                res = con.execute(spec.oracle)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
            except Exception as exc:  # noqa: BLE001
                d_err = f"{type(exc).__name__}: {str(exc)[:160]}"
            if s_err and d_err:
                st = "both_error"
            elif s_err:
                st = "spark_error_only"
            elif d_err:
                st = "duck_error_only"
            else:
                ca, ra = _normalize(srows, scols)
                cb, rb = _normalize(drows, dcols)
                if ca != cb or ra != rb:
                    st = "mismatch"
                elif not ra:
                    st = "both_empty"
                else:
                    st = "match"
            entry = {"status": st}
            if s_err:
                entry["spark_error"] = s_err
            if d_err:
                entry["duck_error"] = d_err
            if st in ("match", "both_empty"):
                entry["rows"] = len(ra)
            record.setdefault(name, {})[kind] = entry
            counts[st] = counts.get(st, 0) + 1
            if st in ("mismatch", "spark_error_only", "duck_error_only"):
                n_diverge += 1
                print(f"DIVERGE [{kind}] {name}: {entry}")
        con.close()
        release_caches()

    print(f"\nstatus counts: {json.dumps(counts, sort_keys=True)}")
    print(f"divergences: {n_diverge}")
    out = os.environ.get("EDGE_SWEEP_JSON")
    if out:
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "base": BASE,
                    "counts": counts,
                    "n_divergences": n_diverge,
                    "queries": record,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    spark.stop()
    return 1 if n_diverge else 0


if __name__ == "__main__":
    raise SystemExit(main())
