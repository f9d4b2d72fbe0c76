"""Per-query cost split: DataFrame construction (py4j/driver) vs
plan optimization vs execution.

The bench's timed window covers fn() + noop write; this tool splits
that window so optimization effort lands on the right phase:

- build: Python-side fn(spark, sf_dir) — py4j expression construction
  plus any eager work the query does at build time (localCheckpoint).
- plan:  queryExecution().executedPlan() — analysis + optimization +
  physical planning in the JVM (AQE final re-plan still happens at
  exec).
- exec:  the noop write.

Usage: python tools/profile_split.py [sf_dir] [query ...]
(no queries = the full bench HEADLINE set). Writes one JSON line per
query to stdout and a summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        from bench import HEADLINE  # noqa: the bench headline set

        names = list(HEADLINE)

    spark = get_spark("profile-split")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from algorithmproject_spark_spark.cacheutil import release_caches
    from algorithmproject_spark_spark.queries.itemsets import clear_itemset_cache

    out = {}
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        rec = {
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec": round(t3 - t2, 3),
            "total": round(t3 - t0, 3),
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
        release_caches()
        clear_itemset_cache()

    tb = sum(r["build"] for r in out.values())
    tp = sum(r["plan"] for r in out.values())
    te = sum(r["exec"] for r in out.values())
    print(
        f"TOTAL build={tb:.1f}s plan={tp:.1f}s exec={te:.1f}s "
        f"all={tb + tp + te:.1f}s over {len(out)} queries",
        file=sys.stderr,
    )
    with open("/tmp/profile_split.json", "w") as fh:
        json.dump(out, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
