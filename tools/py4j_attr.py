"""Attribute py4j round-trips to repo code sites.

Companion to py4j_count.py: walks the Python stack on every
`send_command` and charges the round-trip to the innermost repo frame
(module:function). The output histogram names the helper towers worth
converting to one-parse SQL text — a shared helper charged 20k sends
across the registry is worth more than one 3k-send query.

Usage: python tools/py4j_attr.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        names = sorted(REGISTRY)

    spark = get_spark("py4j-attr")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from algorithmproject_spark_spark.cacheutil import release_caches
    from algorithmproject_spark_spark.queries.itemsets import clear_itemset_cache

    from py4j.clientserver import ClientServerConnection

    hist: Counter = Counter()
    orig = ClientServerConnection.send_command

    def attributing(self, *a, **kw):
        f = sys._getframe(1)
        site = "<other>"
        while f is not None:
            fn = f.f_code.co_filename
            if fn.startswith(REPO) and "/tools/" not in fn:
                rel = os.path.relpath(fn, REPO)
                site = f"{rel}:{f.f_code.co_name}"
                break
            f = f.f_back
        hist[site] += 1
        return orig(self, *a, **kw)

    ClientServerConnection.send_command = attributing
    for name in names:
        try:
            REGISTRY[name].fn(spark, sf_dir)
        except Exception as exc:
            print(f"{name}: BUILD FAILED: {exc}", flush=True)
        ClientServerConnection.send_command = orig
        release_caches()
        clear_itemset_cache()
        ClientServerConnection.send_command = attributing
    ClientServerConnection.send_command = orig

    for site, n in hist.most_common(80):
        print(f"{n:8d}  {site}")
    print(json.dumps(dict(hist.most_common())))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
