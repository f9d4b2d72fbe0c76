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
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if ts_type != "timestamp":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every catalog table as a temp view for the SQL API."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
