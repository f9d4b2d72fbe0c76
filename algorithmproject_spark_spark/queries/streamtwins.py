"""Driver-checkable BATCH TWINS of the streaming operators.

The streaming family (streaming/dedup.py, windows.py, stateful.py) is
pytest-verified by driving real file-streams, but the external driver's
correctness gate runs batch queries only. Structured Streaming's core
guarantee — a streaming query computes the same answer as the batch
query over the same (finite) input — makes the batch-degenerate form of
each operator a faithful, oracle-checkable stand-in: these queries call
the SAME operator functions on a batch frame, so a green row here
certifies the shared logical plan, with tests/test_streaming.py
covering the incremental execution of that plan.

Reference has no stateful streaming at all (SURVEY.md §3.4); this
family is engine extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table
from algorithmproject_spark_spark.streaming.dedup import dedup_stream
from algorithmproject_spark_spark.streaming.stateful import user_profile_batch
from algorithmproject_spark_spark.streaming.windows import sessionized_counts

SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "stream_dedup_batch_twin",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="batch twin of watermark-bounded streaming exact dedup "
    "(dropDuplicatesWithinWatermark): the key set that survives "
    "first-arrival-wins dedup, projected to the (deterministic) keys",
)
def stream_dedup_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Project to the dedup keys: WHICH row survives per key is
    # arbitrary in the batch degenerate (and timing-dependent in the
    # stream), but the surviving KEY SET is exact and deterministic.
    return dedup_stream(ev, key_cols=("user_id", "event_type")).select(
        "user_id", "event_type"
    )


@register(
    "stream_session_windows_batch_twin",
    oracle=f"""
    WITH m AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts
                    ) >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               sum(brk) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM m
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + {SESSION_GAP_US} AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="batch twin of gap-based session windows (session_window agg): "
    "oracle re-derives sessions via the lag-gap islands idiom — "
    "[first_event, last_event + gap) with a strict-< gap merge, "
    "matching session_window's half-open semantics",
)
def stream_session_windows_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sessionized_counts(ev, gap=SESSION_GAP).select(
        "user_id",
        F.unix_micros(F.col("session_start")).alias("session_start_us"),
        F.unix_micros(F.col("session_end")).alias("session_end_us"),
        "n_events",
    )


@register(
    "stream_user_profile_batch_twin",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents,
           count(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
    doc="batch twin of the applyInPandasWithState per-user profile: the "
    "same Arrow/numpy merge kernel folds each key's full history in one "
    "applyInPandas pass (exact integer cents, so state merge order can "
    "never perturb the streaming result either)",
)
def stream_user_profile_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return user_profile_batch(ev.select("user_id", "event_type", "value"))
