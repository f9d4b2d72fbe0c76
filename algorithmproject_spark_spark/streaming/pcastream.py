"""Streaming PCA moment sketch — the 16th stateful twin (round 12,
VERDICT r11 #6).

The batch PCA chain (operators/pca.py) reduces the corpus to an
EMB_DIM×EMB_DIM integer second-moment matrix plus component sums and a
row count — a (i, j, v) relation of ~4k BIGINT rows. Those moments are
ADDITIVE: the moments of a union are the cell-wise sums of the parts.
That makes the streaming form trivial-by-design, which is exactly why
it ships: per micro-batch, run the SAME Arrow Gram kernel over the
batch's embeddings and write the batch's aggregated partials to a
``batch_id=N`` partition (the idempotent per-batch pattern from
streaming/neardup.py — a retried batch overwrites exactly its own
partition, so a crash between write and commit can never double-count
a batch). The SNAPSHOT at any point is one groupBy(i, j) SUM over the
state directory — and after all batches it equals the batch
``embedding_moments`` relation EXACTLY (integer addition is
associative and commutative; no float drift seam), which the
cross-batch seam test pins cell by cell.

State size: #batches × ~4k rows of 3 BIGINTs — KB-scale per batch at
ANY corpus size; compaction (rewriting the store as its own snapshot)
is a maintenance no-op left to the operator because the read-side
groupBy already tolerates unbounded batch counts.

The downstream eigensolve (principal_direction) reads the snapshot
exactly like the batch relation, so a stream-maintained moment store
gives incremental PCA refresh without ever re-scanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from algorithmproject_spark_spark.operators.pca import _moment_batches
from algorithmproject_spark_spark.streaming.neardup import (
    _has_parquet,
    _write_batch_partition,
)

MOMENT_SCHEMA = "i int, j int, v long"


def moment_partials(embeddings: DataFrame) -> DataFrame:
    """Aggregated (i, j, v) moments of ONE embedding frame — the shared
    Arrow Gram kernel (operators/pca.py::_moment_batches) plus the
    map-side-combined cell sum. Works on a batch frame or inside
    ``foreachBatch``."""
    partials = embeddings.select("embedding").mapInPandas(
        _moment_batches, schema=MOMENT_SCHEMA
    )
    return partials.groupBy("i", "j").agg(
        F.sum("v").cast("long").alias("v")
    )


def process_moment_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id=None,
) -> None:
    """One micro-batch: aggregate the batch's moments and (over)write
    its own ``batch_id=N`` partition. Pure accumulation — no read of
    prior state is needed because moments are additive."""
    _write_batch_partition(moment_partials(batch_df), state_dir, batch_id)


def moment_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """(i, j, v) — the accumulated moment relation over every batch
    written so far; equals batch ``embedding_moments`` over the union
    of all batch inputs, exactly. An empty/unwritten store yields zero
    rows (the caller's grid totalization, if any, supplies the empty
    shape — same contract as the batch relation on an empty corpus)."""
    if not _has_parquet(state_dir):
        return spark.createDataFrame([], MOMENT_SCHEMA)
    acc = spark.read.parquet(state_dir)
    return acc.groupBy("i", "j").agg(F.sum("v").cast("long").alias("v"))


def moment_sketch_stream(
    embeddings_stream: DataFrame,
    state_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain the moment store over a streaming embedding frame."""
    spark = embeddings_stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_moment_batch(spark, batch_df, state_dir, batch_id=batch_id)

    return (
        embeddings_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
