"""Solo-query bench — bench.py's exact timing discipline for a named
subset of registered queries.

Round-close directives are phrased as per-query targets ("sf1 solo
median <= 7 s") and bench.py only runs the full HEADLINE sweep; this
tool runs just the named queries with the identical discipline (same
session config, same warmup, noop-write materialization, cache
isolation between reps, median-of-N with spread) so a directive target
can be verified in minutes instead of a 55-minute sweep.

Usage: python tools/bench_solo.py [sf_dir] query [query ...]
Env:   SPARK_GRAFT_BENCH_REPS (default 3)
Prints one line per query: `name: median s [min, max]` and a final
JSON line with the full map.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else "/root/testdata/sf0.1"
    )
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        print("usage: bench_solo.py [sf_dir] query [query ...]")
        return 2
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Same steady-state warmup as bench.py: JVM/codegen/parquet-footer
    # init is a once-per-cluster cost, not a per-query one.
    spark.range(100).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from algorithmproject_spark_spark.cacheutil import release_caches
    from algorithmproject_spark_spark.queries.itemsets import (
        clear_itemset_cache,
    )

    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            release_caches()
            clear_itemset_cache()
        med = round(statistics.median(samples), 3)
        out[name] = {"median": med, "spread": [min(samples), max(samples)]}
        print(f"{name}: {med}s {out[name]['spread']}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
