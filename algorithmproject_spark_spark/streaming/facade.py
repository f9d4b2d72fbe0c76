"""Structured Streaming source/sink facade — SURVEY.md §2.1 S13-S17,
mirroring ``label/DataLoader.scala:96-253`` (the reference's streaming
library: socket/kafka in, memory/console/parquet/kafka out, processing-
time triggers, checkpointing — but no watermarks or event-time windows;
those live in ``streaming/windows.py`` as the extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def socket_source_options(host: str, port: int) -> dict[str, str]:
    """S13 option contract (DataLoader.scala:96-99) — exposed separately
    so the connector contract is pinned by tests without a live socket."""
    return {"host": host, "port": str(port)}


def stream_read_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S13 (DataLoader.scala:96-99)."""
    return (
        spark.readStream.format("socket")
        .options(**socket_source_options(host, port))
        .load()
    )


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """S14 option contract (DataLoader.scala:118-131): subscription +
    offset posture + loss tolerance; ``minPartitions`` decouples Spark
    task parallelism from Kafka partition count at scale."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": subscribe,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def stream_read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """S14 (DataLoader.scala:118-131): key/value cast to string."""
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(
            bootstrap_servers,
            subscribe,
            starting_offsets,
            min_partitions,
            fail_on_data_loss,
        )
    )
    return reader.load().selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
    )


def stream_read_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source (schema mandatory for streams).

    ``max_files_per_trigger`` caps each micro-batch — tests use 1 to
    force state to carry across batches instead of one catch-all batch.
    """
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def stream_read_rate(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Built-in rate source — deterministic local testing."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def stream_write_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    processing_time: str | None = None,
) -> StreamingQuery:
    """S15 memory sink (DataLoader.scala:140-150) — test/debug only:
    the sink collects to the driver."""
    writer = df.writeStream.format("memory").queryName(query_name).outputMode(output_mode)
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_write_console(
    df: DataFrame,
    output_mode: str = "append",
    processing_time: str | None = None,
) -> StreamingQuery:
    """S15 console sink (DataLoader.scala:152-162)."""
    writer = df.writeStream.format("console").outputMode(output_mode)
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_write_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = (),
    processing_time: str | None = None,
) -> StreamingQuery:
    """S16 (DataLoader.scala:225-240): append-mode parquet files with
    exactly-once via checkpointed file-sink log."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """S17 option contract (DataLoader.scala:242-253): topic + the
    checkpoint that makes the sink's delivery exactly-once-per-epoch."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def stream_write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
) -> StreamingQuery:
    """S17 (DataLoader.scala:242-253): expects ``key``/``value`` string
    columns, like the reference's ``(key, value)`` dataset contract."""
    return (
        df.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, checkpoint))
        .start()
    )
