"""SparkSession factory with scale-ready defaults.

The reference hardcodes per-job tuning (``spark.sql.shuffle.partitions``
1024/2048/2400, ``repartition(512)`` after reads — SURVEY.md §6 /
``label/UserTextLabelDriver.scala:37``). Here we rely on AQE to size
shuffles at runtime, which is the strategy that survives a 100× scale-up
without re-tuning every job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Driver-heap default: 8g, env-overridable. Round 12 investigated
# raising it (the long-session bench degradation looked GC-shaped and a
# 24g A/B appeared to fix it), but GC MXBean instrumentation refuted
# the hypothesis: the slow reps spend ~0 ms in GC at 8g, 16g, and 24g
# alike — the stalls are host-level CPU contention, invisible to the
# JVM, and a machine-sized heap measurably hurt one fresh-session query
# (dedup_triangle_counts 2.7 -> 4.1 s median-of-6 at 31g). Kept at 8g;
# see OPTIMIZATION_r12.md "What was tried and reverted".


def get_spark(
    app_name: str = "algorithmproject-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are chosen for correctness-vs-oracle and cluster posture:

    - AQE on (coalesce + skew-join): replaces the reference's fixed
      shuffle widths; on a real cluster AQE re-plans from runtime stats.
    - UTC session timezone: parquet timestamps compare bit-for-bit with
      the DuckDB oracle.
    - Arrow enabled: pandas_udf / toPandas go through columnar batches.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else 32),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # NOT enabled: runtime bloom-filter join pruning
        # (spark.sql.optimizer.runtime.bloomFilter.enabled). Measured
        # here: the injected filter re-executes its build side, and this
        # engine's join build sides are often expensive DERIVED
        # relations (shingle/signature/band tables), not bare scans —
        # enabling it sent the 46-query bench from ~80 s to >500 s.
        # Worth revisiting per-query on a cluster where the build side
        # is a selective scan of a fact table; wrong as a global
        # default for this workload.
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
