"""Streaming facade tests: file-stream → watermarked window agg →
memory sink, asserting batch/stream plan equivalence (SURVEY.md §3.4
extension)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from algorithmproject_spark_spark.sources.catalog import load_table
from algorithmproject_spark_spark.streaming import (
    stream_read_parquet,
    stream_write_memory,
    stream_write_parquet,
    windowed_value_agg,
)

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch" / "stream_tests"


@pytest.fixture()
def scratch():
    SCRATCH.mkdir(parents=True, exist_ok=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


@pytest.fixture()
def events_dir(spark, scratch):
    """Materialize events (micros timestamps) as a file-stream source dir."""
    path = scratch / "events_in"
    load_table(spark, "/root/testdata/sf0.001", "events").write.mode("overwrite").parquet(
        str(path)
    )
    return path


def test_windowed_agg_stream_equals_batch(spark, events_dir):
    batch_events = spark.read.parquet(str(events_dir))
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
        for r in windowed_value_agg(batch_events).collect()
    }

    stream = stream_read_parquet(spark, str(events_dir), batch_events.schema)
    assert stream.isStreaming
    q = stream_write_memory(
        windowed_value_agg(stream), "win_agg", output_mode="complete"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
            for r in spark.sql("SELECT * FROM win_agg").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_parquet_sink_checkpointed(spark, events_dir, scratch):
    stream = stream_read_parquet(
        spark, str(events_dir), spark.read.parquet(str(events_dir)).schema
    )
    out, ckpt = scratch / "out", scratch / "ckpt"
    q = stream_write_parquet(
        stream.select("event_id", "event_type"), str(out), str(ckpt)
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(str(out)).count() == 1000
    assert (ckpt / "offsets").exists()  # exactly-once bookkeeping present

def test_stateful_user_profile_stream(spark, events_dir):
    """applyInPandasWithState: final per-user profile equals the batch
    aggregate (after the stream drains, the last update per key wins)."""
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.streaming import user_profile_stateful
    from algorithmproject_spark_spark.streaming.facade import (
        stream_read_parquet,
        stream_write_memory,
    )

    batch = spark.read.parquet(str(events_dir))
    expected = {
        r["user_id"]: (r["n"], r["cents"], r["nt"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
            F.countDistinct("event_type").alias("nt"),
        )
        .collect()
    }

    stream = stream_read_parquet(spark, str(events_dir), batch.schema)
    q = stream_write_memory(
        user_profile_stateful(stream), "user_profiles", output_mode="update"
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_events"], r["value_cents"], r["n_types"])
            for r in spark.sql(
                "SELECT * FROM user_profiles ORDER BY user_id"
            ).collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_session_window_stream_equals_batch(spark, events_dir):
    from algorithmproject_spark_spark.streaming import (
        sessionized_counts,
        stream_read_parquet,
        stream_write_memory,
    )

    batch_events = spark.read.parquet(str(events_dir))
    expected = {
        (r["session_start"], r["session_end"], r["user_id"]): r["n_events"]
        for r in sessionized_counts(batch_events).collect()
    }
    assert expected  # non-degenerate fixture

    stream = stream_read_parquet(spark, str(events_dir), batch_events.schema)
    q = stream_write_memory(
        sessionized_counts(stream), "sess_counts", output_mode="complete"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["session_start"], r["session_end"], r["user_id"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sess_counts").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_dedup_drops_cross_batch_duplicates(spark, scratch):
    from algorithmproject_spark_spark.streaming import (
        dedup_stream,
        stream_read_parquet,
        stream_write_memory,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = scratch / "dup_events_in"
    # two files -> duplicates arrive across micro-batches, not only
    # within one: the state store must carry keys between batches.
    events.write.mode("overwrite").parquet(str(path))
    events.write.mode("append").parquet(str(path))

    batch = spark.read.parquet(str(path))
    assert batch.count() == 2 * events.count()  # fixture really duplicated
    expected = batch.dropDuplicates(["event_id"]).count()
    assert expected == events.count()

    stream = stream_read_parquet(
        spark, str(path), batch.schema, max_files_per_trigger=1
    )
    q = stream_write_memory(
        dedup_stream(stream), "dedup_out", output_mode="append"
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    finally:
        q.stop()
    assert got.n == expected  # every duplicate dropped...
    assert got.d == expected  # ...and each key emitted exactly once
