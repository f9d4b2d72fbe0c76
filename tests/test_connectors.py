"""Contract tests for the environment-blocked connectors (S1/S2 Mongo,
S13 socket, S14/S17 Kafka).

No Mongo/Kafka service or connector jar exists in this sandbox, so the
testable surface is the CONFIGURATION each builder hands to Spark — the
exact option shapes the reference jobs use (cited per function). Pinning
them here means a production deployment gets the documented posture
(partitioner, offsets, loss tolerance, checkpointing) by construction,
and any drift in the builders fails CI rather than a cluster rollout.
The socket source is built into Spark and connects lazily, so its plan
really is constructed and type-checked.
"""

from __future__ import annotations

import pytest

from algorithmproject_spark_spark.sources.readers import mongo_read_options
from algorithmproject_spark_spark.sources.writers import mongo_write_options
from algorithmproject_spark_spark.streaming.facade import (
    kafka_sink_options,
    kafka_source_options,
    socket_source_options,
)

URI = "mongodb://rs0.example.internal:27017"


def test_mongo_read_contract():
    opts = mongo_read_options(URI, "articles", "article_info")
    # ReadMongodb.scala:27-32 posture: size-based partitioning so scan
    # parallelism follows bytes, 32 MB default splits.
    assert opts == {
        "connection.uri": URI,
        "database": "articles",
        "collection": "article_info",
        "partitioner": "PaginateBySizePartitioner",
        "partitioner.options.partitionSizeMB": "32",
    }
    assert mongo_read_options(URI, "a", "b", partition_size_mb=64)[
        "partitioner.options.partitionSizeMB"
    ] == "64"


def test_mongo_write_contract():
    assert mongo_write_options(URI, "articles", "article_out") == {
        "connection.uri": URI,
        "database": "articles",
        "collection": "article_out",
    }


def test_kafka_source_contract():
    opts = kafka_source_options("k1:9092,k2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "k1:9092,k2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }
    # minPartitions only appears when requested, as a string (Spark
    # option values must be strings), decoupling task parallelism from
    # topic partition count.
    opts = kafka_source_options(
        "k1:9092", "events", starting_offsets="earliest", min_partitions=128,
        fail_on_data_loss=True,
    )
    assert opts["minPartitions"] == "128"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "true"


def test_kafka_sink_contract():
    assert kafka_sink_options("k1:9092", "out", "/chk/out") == {
        "kafka.bootstrap.servers": "k1:9092",
        "topic": "out",
        "checkpointLocation": "/chk/out",
    }


def test_socket_source_builds_streaming_plan(spark):
    """The socket source ships with Spark and connects only at start(),
    so the reader contract is exercised for real: a streaming frame with
    the documented value:string schema."""
    from algorithmproject_spark_spark.streaming.facade import stream_read_socket

    df = stream_read_socket(spark, "localhost", 19099)
    assert df.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("value", "string")
    ]
    assert socket_source_options("localhost", 19099) == {
        "host": "localhost",
        "port": "19099",
    }


def test_mongo_read_raises_documented_error_without_connector(spark):
    """In this sandbox the connector jar is absent: the builder must
    fail with the documented NotImplementedError escape hatch, not an
    opaque Java stack."""
    from algorithmproject_spark_spark.sources.readers import read_mongo

    with pytest.raises(NotImplementedError, match="snapshot"):
        read_mongo(spark, URI, "articles", "article_info")
