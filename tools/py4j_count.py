"""Deterministic py4j round-trip counter for query BUILDS.

Wall-clock on this host fluctuates with contention windows, but the
number of py4j `send_command` round-trips a query build performs is a
deterministic property of the code (r12 batch 5 used it as the
committed evidence for driver-boundary work). This tool patches
`ClientServerConnection.send_command`, calls `spec.fn(spark, sf_dir)`
for each named query (NO action — build only; eager builds count their
eager job's driver calls too, which is the point), and prints one line
per query plus a JSON tail.

Usage: python tools/py4j_count.py [sf_dir] [query ...]
(no queries = the whole registry, sorted by count descending).
"""

from __future__ import annotations

import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        names = sorted(REGISTRY)

    spark = get_spark("py4j-count")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from algorithmproject_spark_spark.cacheutil import release_caches
    from algorithmproject_spark_spark.queries.itemsets import clear_itemset_cache

    from py4j.clientserver import ClientServerConnection

    counter = {"n": 0}
    orig = ClientServerConnection.send_command

    def counting(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    ClientServerConnection.send_command = counting

    out: dict[str, int] = {}
    for name in names:
        spec = REGISTRY[name]
        # GC fence (r13): py4j JavaObject finalizers send MEMORY_DEL
        # commands; cycle-collected objects die at arbitrary gc
        # thresholds, charging one query's DEL traffic to a later
        # query's window. Draining the collector OUTSIDE the counting
        # window makes per-query counts reproducible.
        ClientServerConnection.send_command = orig
        gc.collect()
        ClientServerConnection.send_command = counting
        counter["n"] = 0
        try:
            df = spec.fn(spark, sf_dir)
            del df
            ClientServerConnection.send_command = orig
            gc.collect()
            ClientServerConnection.send_command = counting
        except Exception as exc:  # keep sweeping; report the failure
            out[name] = -1
            print(f"{name}: BUILD FAILED: {exc}", flush=True)
            continue
        out[name] = counter["n"]
        # release outside the count so each build is standalone
        ClientServerConnection.send_command = orig
        release_caches()
        clear_itemset_cache()
        ClientServerConnection.send_command = counting
        print(f"{name}: {out[name]}", flush=True)

    ClientServerConnection.send_command = orig
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps(ranked))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
