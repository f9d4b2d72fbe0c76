"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at the given
scale factor, then compares row count, column names, and the full
multiset of values (columns sorted by name, rows sorted) EXACTLY —
stricter than a value hash, and it prints the first differing rows on
mismatch instead of a bare hash.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
Set ORACLE_CHECK_JSON=<path> to also write a machine-readable artifact
({query: {"status": pass|fail|rows_only, "rows": N, "sec": s}, ...})
— committed per round as ORACLE_FULL_r{N}.json, this closes the
driver's 50-query-per-round rotation blind spot.
"""

from __future__ import annotations

import datetime
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark
from algorithmproject_spark_spark.sources.catalog import TABLES


def _norm_cell(v):
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we demand bit-exactness
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    targets = {n: REGISTRY[n] for n in names} if names else REGISTRY

    if os.environ.get("ORACLE_CHECK_VANILLA"):
        # Driver-parity mode: a bare session with none of session.py's
        # confs, exactly like the external correctness gate builds it.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "oracle-check-vanilla"
        ).getOrCreate()
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    record: dict[str, dict] = {}

    def _rec(name, status, rows, t0, detail=None):
        entry = {"status": status, "rows": rows, "sec": round(time.time() - t0, 2)}
        if detail:
            entry["detail"] = detail
        record[name] = entry

    for name, spec in targets.items():
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            _rec(name, "fail", 0, t0, f"spark error: {exc}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            _rec(name, "rows_only", len(srows), t0)
            n_noracle += 1
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            _rec(name, "fail", len(srows), t0, f"duckdb error: {exc}")
            n_fail += 1
            continue
        scols_n, srows_n = _normalize([tuple(r) for r in srows], scols)
        dcols_n, drows_n = _normalize(drows, dcols)
        if scols_n != dcols_n:
            print(f"FAIL  {name}: columns differ spark={scols_n} duck={dcols_n}")
            _rec(name, "fail", len(srows), t0, "columns differ")
            n_fail += 1
            continue
        if len(srows_n) != len(drows_n):
            print(f"FAIL  {name}: rowcount spark={len(srows_n)} duck={len(drows_n)}")
            _rec(name, "fail", len(srows), t0, "rowcount differs")
            n_fail += 1
            continue
        bad = [
            (s, d) for s, d in zip(srows_n, drows_n) if s != d
        ]
        if bad:
            print(f"FAIL  {name}: {len(bad)} differing rows; first: spark={bad[0][0]} duck={bad[0][1]}")
            _rec(name, "fail", len(srows), t0, f"{len(bad)} differing rows")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows_n)} rows [{time.time()-t0:.1f}s]")
        _rec(name, "pass", len(srows_n), t0)
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    out = os.environ.get("ORACLE_CHECK_JSON")
    if out:
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_noracle,
                    "queries": record,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
