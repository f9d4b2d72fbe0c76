"""Driver-contract simulation — a VANILLA SparkSession (none of
session.py's defaults), exactly like the external driver builds one,
driving __spark_entry__'s three contract functions.

Catches accidental reliance on engine session confs (UTC timezone,
AQE, Arrow, python filter pushdown): anything a registered query needs
must be set inside the query path itself.

Usage: python tools/driver_sim.py [query ...]
       (default: entry() + a timestamp-sensitive sample)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

DEFAULT_SAMPLE = (
    "events_tumbling_hourly",
    "window_lag_session_gap",
    "stream_click_attribution_batch_twin",
    "pyds_synthetic_events_agg",
    "grouped_agg_weighted_median",
    # round-6 families with their own conf-sensitive surfaces:
    # timestamp math (zorder/CEP), call_function div (ppm consumers),
    # the Python stateful twin's batch form
    "zorder_pruning_stats",
    "events_error_burst_recovery",
    "corpus_token_drift",
    "stream_anomaly_batch_twin",
)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod

    rows = mod.entry(spark).collect()
    print(f"entry rows: {len(rows)}")
    assert rows, "entry() must return >= 1 row"

    qs = mod.queries()
    names = sys.argv[1:] or [n for n in DEFAULT_SAMPLE if n in qs]
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.01")
        print(f"{name}: {df.count()} rows")
    print("DRIVER_SIM_OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
