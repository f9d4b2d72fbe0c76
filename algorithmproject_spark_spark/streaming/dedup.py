"""Streaming exact deduplication — the incremental twin of the batch
dedup family (queries/dedup.py, operators/core.py dedup_keep_first).

The reference dedups only in batch (``dropDuplicates`` in
``nlp/NewsDeduplication.scala``); a pipeline ingesting a firehose needs
the same guarantee incrementally. ``dropDuplicatesWithinWatermark``
keeps per-key state only until the event-time watermark passes the
key's timestamp — bounded state, exactly-once emission of the first
arrival, duplicates dropped across micro-batches. At 100 TB/day the
state store holds only keys newer than the watermark horizon, not the
corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-arrival-wins dedup on ``key_cols`` with bounded state.

    Works on a batch OR streaming DataFrame: on a stream Catalyst plans
    a stateful dedup whose state expires at the watermark; on a batch
    frame Spark REJECTS ``dropDuplicatesWithinWatermark`` outright, so
    the batch degenerate is the explicit semantic twin — plain
    ``dropDuplicates`` over the keys (a finite input has no late data,
    so the watermark bound changes nothing about which keys survive).
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(key_cols))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
