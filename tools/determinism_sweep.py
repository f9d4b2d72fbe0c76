"""Registry-wide determinism sweep — same results under perturbed execution.

The oracle gate proves each query agrees with DuckDB on ONE physical
layout of the input. This tool proves the harder invariant a 100 TB
deployment actually relies on: the result is a pure function of the
DATA, not of how the data happens to be laid out or how many reducers
the session was given. Every registered query runs twice:

- **A (pristine)**: the original sf_dir, the engine session's normal
  ``spark.sql.shuffle.partitions`` (32).
- **B (perturbed)**: a rewritten copy of every table — round-robin
  ``repartition()`` into a different file count with rows permuted
  within files by an xxhash64 sort — read with
  ``spark.sql.shuffle.partitions=7`` (prime, ≠32) and
  ``spark.sql.files.maxPartitionBytes`` shrunk 16× so even the scan
  splits differently.

The full value multisets (oracle_check normalization: columns sorted
by name, rows sorted, floats at full repr precision) must be EQUAL.
This catches the bug classes the DuckDB oracle is structurally blind
to because both engines read the same file order: collect_list /
first / last without an explicit sort, LIMIT over a non-total order,
float aggregation-order sensitivity, partition-index leakage
(spark_partition_id, monotonically_increasing_id arithmetic), and
sample/split logic keyed on physical row position.

Rows-only (no-oracle) ML queries are held to rowcount equality only —
Word2Vec/LDA negative sampling is legitimately partition-dependent;
their seeded-determinism contract is pinned separately by
tests/test_golden_ml.py.

Usage: python tools/determinism_sweep.py [sf_dir] [query ...]
Set DETERMINISM_JSON=<path> to write the per-query artifact
({query: {"status": match|count_only|mismatch|fail, "rows": N}}) —
committed per round as DETERMINISM_r{N}.json.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from algorithmproject_spark_spark.cacheutil import release_caches
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark
from algorithmproject_spark_spark.sources.catalog import TABLES, load_table

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import _normalize  # noqa: E402  (shared comparator)

PERTURB_ROOT = "/tmp/spark_graft_perturb"
# B-side knobs: prime reducer count ≠ the session's 32; scan splits
# shrunk so file-partitioning changes even for single-file tables.
B_SHUFFLE_PARTITIONS = "7"
B_MAX_PARTITION_BYTES = str(8 * 1024 * 1024)


def build_perturbed(spark, sf_dir: str) -> str:
    """Rewrite every table with a different physical layout.

    Round-robin repartition moves rows across files; the
    xxhash64-of-all-columns sortWithinPartitions permutes row order
    WITHIN each file deterministically but completely unlike the
    source order. Values are untouched — load_table's type
    normalization (events.ts nanos→micros) applies identically to
    both sides because both go through the same reader.
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(PERTURB_ROOT, tag)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        (
            df.repartition(5)
            .sortWithinPartitions(F.xxhash64(*df.columns))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{t}.parquet"))
        )
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write("ok\n")
    return out_dir


def main() -> int:
    args = sys.argv[1:]
    sf_dir = (
        args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    )
    names = args[1:] if args and os.path.isdir(args[0]) else args
    targets = {n: REGISTRY[n] for n in names} if names else REGISTRY

    spark = get_spark("determinism-sweep")
    perturbed = build_perturbed(spark, sf_dir)

    n_match = n_count = n_mismatch = n_fail = 0
    record: dict[str, dict] = {}

    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    base_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")

    def run(spec, d):
        df = spec.fn(spark, d)
        return df.columns, [tuple(r) for r in df.collect()]

    for name, spec in targets.items():
        t0 = time.time()
        try:
            cols_a, rows_a = run(spec, sf_dir)
            spark.conf.set(
                "spark.sql.shuffle.partitions", B_SHUFFLE_PARTITIONS
            )
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", B_MAX_PARTITION_BYTES
            )
            try:
                cols_b, rows_b = run(spec, perturbed)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
                spark.conf.set("spark.sql.files.maxPartitionBytes", base_mpb)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: {exc}")
            record[name] = {"status": "fail", "detail": str(exc)[:300]}
            n_fail += 1
            continue
        el = time.time() - t0
        if spec.oracle is None:
            ok = len(rows_a) == len(rows_b)
            st = "count_only" if ok else "mismatch"
            print(
                f"{'rows' if ok else 'DIFF'}  {name}: "
                f"A={len(rows_a)} B={len(rows_b)} rows-only [{el:.1f}s]"
            )
            record[name] = {"status": st, "rows": len(rows_a)}
            if ok:
                n_count += 1
            else:
                n_mismatch += 1
            continue
        ca, ra = _normalize(rows_a, cols_a)
        cb, rb = _normalize(rows_b, cols_b)
        if ca != cb or ra != rb:
            # zip_longest so a row-count mismatch still surfaces the
            # first extra/missing row, not just the two lengths
            bad = [
                (x, y)
                for x, y in itertools.zip_longest(ra, rb)
                if x != y
            ]
            first = bad[0] if bad else (ca, cb)
            print(f"DIFF  {name}: A≠B; first delta: {first}")
            record[name] = {"status": "mismatch", "rows": len(ra)}
            n_mismatch += 1
            continue
        print(f"OK    {name}: {len(ra)} rows [{el:.1f}s]")
        record[name] = {"status": "match", "rows": len(ra)}
        n_match += 1

    release_caches()
    print(
        f"\n{n_match} match, {n_count} count-only, "
        f"{n_mismatch} MISMATCH, {n_fail} fail"
    )
    out = os.environ.get("DETERMINISM_JSON")
    if out:
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "perturbed_dir": perturbed,
                    "b_shuffle_partitions": int(B_SHUFFLE_PARTITIONS),
                    "b_max_partition_bytes": int(B_MAX_PARTITION_BYTES),
                    "n_match": n_match,
                    "n_count_only": n_count,
                    "n_mismatch": n_mismatch,
                    "n_fail": n_fail,
                    "queries": record,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    spark.stop()
    return 1 if (n_mismatch or n_fail) else 0


if __name__ == "__main__":
    raise SystemExit(main())
