"""Table catalog over the driver-generated parquet testdata.

Replaces the reference's per-job ad-hoc reads with glob-path pruning
(``mongodb/ArticleInfoProcess.scala:62-67`` reads
``.../dt=2018-11-2[2-6]`` by hand) with plain partition-pruned parquet
reads: filter on the partition column and let Catalyst prune.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# One resolved DataFrame per (session, file, mtime): creating a parquet
# DataFrame is EAGER driver work (file listing + footer read + schema
# inference, ~0.15-0.5 s per table), and every registered query rebuilds
# its inputs from scratch — across a 262-query bench that is minutes of
# pure metadata re-inference (r12, guide §5/§6: this is what a real
# catalog/metastore amortizes; the DATA is still scanned from parquet at
# every execution, so no result is ever reused). The mtime in the key
# invalidates the memo whenever the file changes (tests that regenerate
# fixtures in place get a fresh read); dead-session entries are pruned
# on every lookup, the same self-cleaning discipline as
# queries/itemsets._DTOK_MEMO.
_TABLE_MEMO: dict = {}


def _prune_dead_tables() -> None:
    for key in [k for k, v in _TABLE_MEMO.items() if v[1]._jsc is None]:
        del _TABLE_MEMO[key]


def clear_table_memo() -> None:
    """Drop every memoized table DataFrame (test teardown hook)."""
    _TABLE_MEMO.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Columnar parquet scan: Catalyst pushes
    filters and prunes columns at this boundary, so callers should NOT
    pre-select/pre-filter here (SURVEY.md §4).

    ``events.ts`` has shipped in two physical forms across testdata
    generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects — read as raw nanos via ``nanosAsLong`` and truncate to
    micros, matching DuckDB's TIMESTAMP_NS materialization) and plain
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
    Normalize both to a session-UTC TimestampType so every downstream
    query and oracle sees one stable type with identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    _prune_dead_tables()
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    key = (spark.sparkContext.applicationId, path, mtime)
    hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit[0]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    _TABLE_MEMO[key] = (df, spark.sparkContext)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every catalog table as a temp view for the SQL API."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
