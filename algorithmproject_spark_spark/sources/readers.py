"""Batch reader facade — SURVEY.md §2.1 S1-S11.

One typed entry point per source format the reference touches, replacing
its per-job ad-hoc reads. MongoDB (S1/S2) is behind an interface: the
connector jar isn't in this environment, so ``read_mongo`` raises with
the exact production configuration documented — any parquet path stands
in for tests, matching how the reference's own jobs were smoke-tested.

Scale notes baked in:
- parquet/orc/csv/json readers take an optional explicit schema —
  schema inference is a full extra scan at 100 TB;
- ``read_delimited`` parses positional ``\\u0001``/tab logs with ONE
  split per row (the reference calls ``split(col, sep).getItem(i)``
  per FIELD — re-splitting the line once per column,
  ``article/ReadPushData.scala:20-32``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    base_path: str | None = None,
) -> DataFrame:
    """S3: parquet scan. Partition pruning comes from FILTERING on the
    partition column, not from hand-built path globs like the
    reference's ``.../dt=2018-11-2[2-6]`` (ArticleInfoProcess.scala:63)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    return reader.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """S5. Always pass a schema in production — inference scans twice.

    ``mode``: PERMISSIVE (default — malformed rows become nulls),
    DROPMALFORMED, or FAILFAST. At 100 TB a crawl feed ALWAYS contains
    malformed lines; pass ``corrupt_col`` (with the column declared
    STRING in ``schema``) to quarantine raw bad records into a column
    instead of silently nulling them — the audit-friendly setup."""
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    sep: str = ",",
    schema: StructType | None = None,
) -> DataFrame:
    """S7: built-in csv (reference used the databricks spark-csv
    package, DataLoader.scala:20-27 — superseded since Spark 2.0)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S11: one string column ``value`` per line."""
    return spark.read.text(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S8 (short_video/ReadContent.scala:108)."""
    return spark.read.orc(path)


def read_libsvm(
    spark: SparkSession, path: str, num_features: int | None = None
) -> DataFrame:
    """S9: (label, features sparse-vector) frame
    (nlp/NewsLDAModel.scala:25 reads with numFeatures=15984963)."""
    reader = spark.read.format("libsvm")
    if num_features is not None:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)


def read_delimited(
    spark: SparkSession,
    path: str,
    fields: Sequence[str],
    sep: str = "",
) -> DataFrame:
    """S6: positional delimited wide-row logs (``\\u0001``/tab), e.g.
    11-field push logs (ReadPushData.scala:20-32) or 181-field content
    rows (short_video/ReadContent.scala:25-28).

    Splits each line ONCE into an array, then projects by index —
    the reference re-splits per field, doing O(fields) regex passes
    per row.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), sep)
    return lines.select(
        *[parts.getItem(i).alias(name) for i, name in enumerate(fields)]
    )


def read_sql(spark: SparkSession, sql: str) -> DataFrame:
    """S10: SQL over registered tables/views
    (URLandSearchwordExtractorDriver.scala:38 queried Hive directly)."""
    return spark.sql(sql)


def mongo_read_options(
    uri: str, database: str, collection: str, partition_size_mb: int = 32
) -> dict[str, str]:
    """S1 option contract (mongodb/ReadMongodb.scala:27-32,
    video/ReadVideoMongodb.scala:29-35): paginate-by-size partitioner so
    scan parallelism tracks collection bytes, not document count.
    Exposed separately so tests pin the production shape without a
    connector jar or a live cluster."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "partitioner": "PaginateBySizePartitioner",
        "partitioner.options.partitionSizeMB": str(partition_size_mb),
    }


def read_mongo(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    partition_size_mb: int = 32,
) -> DataFrame:
    """S1: MongoDB scan. Connector jar not present in this environment.

    Production config (mongodb/ReadMongodb.scala:27-32,
    video/ReadVideoMongodb.scala:29-35): paginate-by-size partitioner
    with 32 MB partitions, readPreference=secondary.
    """
    try:
        return (
            spark.read.format("mongodb")
            .options(**mongo_read_options(uri, database, collection, partition_size_mb))
            .load()
        )
    except Exception as exc:  # pragma: no cover - connector not installed
        raise NotImplementedError(
            "MongoDB connector jar not available in this environment; "
            "use read_parquet on an exported snapshot instead"
        ) from exc
