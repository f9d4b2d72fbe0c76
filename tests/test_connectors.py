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


def test_pyds_batch_reader_partitions_and_determinism(spark):
    """synthetic_events batch read: planned range partitions land 1:1 as
    task partitions, and the relation is identical under different
    partition counts (executor-side generation is a pure function of
    row index, no partition-dependent state)."""
    from algorithmproject_spark_spark.sources.pydatasource import register_datasource

    register_datasource(spark)

    def read(nparts):
        return (
            spark.read.format("synthetic_events")
            .option("n_rows", 1000)
            .option("n_partitions", nparts)
            .load()
        )

    df8 = read(8)
    assert df8.rdd.getNumPartitions() == 8
    rows8 = sorted(df8.collect())
    rows3 = sorted(read(3).collect())
    assert rows8 == rows3
    assert len(rows8) == 1000
    first = rows8[0]
    assert first.event_id == 0 and first.user_id == 0
    assert str(first.ts) == "2024-01-01 00:00:00"


def test_pyds_writer_two_phase_commit(spark, tmp_path):
    """The jsonlines writer must leave ONLY committed part files — no
    _attempt leftovers — and the union of files must hold every row."""
    import json as _json

    from algorithmproject_spark_spark.sources.pydatasource import register_datasource

    register_datasource(spark)
    out = str(tmp_path / "out")
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 100)
        .option("n_partitions", 4)
        .load()
    )
    df.write.format("synthetic_events").option("path", out).mode("append").save()

    files = sorted(p.name for p in (tmp_path / "out").iterdir())
    assert files and all(f.startswith("part-") for f in files), files
    got = []
    for p in (tmp_path / "out").iterdir():
        with open(p, encoding="utf-8") as fh:
            got.extend(_json.loads(line)["event_id"] for line in fh)
    assert sorted(got) == list(range(100))


def test_pyds_stream_reader_microbatches(spark, tmp_path):
    """Streaming read through the same connector: availableNow-style
    drain via processAllAvailable, offsets advance by rows_per_batch,
    and the drained rows equal the batch relation."""
    from algorithmproject_spark_spark.sources.pydatasource import register_datasource

    register_datasource(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 500)
        .option("rows_per_batch", 100)
        .option("n_partitions", 4)
        .load()
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT count(*) AS n, min(event_id) AS a, max(event_id) AS b FROM pyds_stream").collect()[0]
    assert (rows.n, rows.a, rows.b) == (500, 0, 499)


def test_pyds_filter_pushdown_narrows_partitions(spark):
    """event_id range predicates must reach the reader and shrink the
    planned row range — correctness identical either way, but the
    pushed path generates only the matching slice."""
    from algorithmproject_spark_spark.sources.pydatasource import (
        SyntheticEventsReader,
        register_datasource,
    )
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    # unit level: the reader consumes supported filters and narrows
    r = SyntheticEventsReader({"n_rows": "10000", "n_partitions": "4"})
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("event_id",), 9000), LessThan(("event_id",), 9500)]
        )
    )
    assert leftover == []
    assert (r.lo, r.hi) == (9000, 9500)
    spans = [(p.start, p.end) for p in r.partitions()]
    assert spans[0][0] == 9000 and spans[-1][1] == 9500
    assert sum(e - s for s, e in spans) == 500

    # end to end: filtered read returns exactly the slice
    register_datasource(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 10000)
        .load()
        .filter("event_id >= 9000 AND event_id < 9500")
    )
    got = df.agg({"event_id": "min"}).collect()[0][0], df.count()
    assert got == (9000, 500)
