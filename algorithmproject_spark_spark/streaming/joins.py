"""Stream-stream interval join — click-to-view attribution.

The last Structured Streaming feature family the engine lacked: two
watermarked streams joined on an equi-key PLUS an event-time range
constraint. The time bound is what makes unbounded state finite: with
both sides watermarked and ``click_ts`` bounded to
``[view_ts, view_ts + max_gap)``, the state store can evict any view
older than ``watermark + max_gap`` and any click older than
``watermark`` — state is O(arrival rate × horizon), not O(stream).

The same function runs on batch DataFrames (the registered driver twin
below): with the user equi-key present, Catalyst plans a shuffled
hash/sort-merge join on ``user_id`` with the time bound as a
post-filter — never a nested-loop theta join, so the batch shape is
scale-safe too.

Reference parity: the reference's push/click correlation jobs
(``article/ReadPushClickData.scala``) join event logs in batch only;
stream-stream attribution is a beyond-reference extension
(SURVEY.md §3.4 notes its streaming entry is library-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

MAX_GAP = "30 minutes"
WATERMARK = "1 hour"


def click_view_attribution(
    views: DataFrame,
    clicks: DataFrame,
    max_gap: str = MAX_GAP,
    watermark: str = WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Attribute each click to every view by the same user within
    ``[view_ts, view_ts + max_gap)``. Works on streaming inputs (state
    bounded by watermark + gap) and batch inputs (same logical plan).

    ``how="left_outer"`` is the OUTER stream-stream join: a view with
    no matching click is emitted with null click columns — but only
    once the watermark guarantees no match can still arrive (the
    engine holds the view in state until ``watermark`` passes
    ``view_ts + max_gap``, then emits the null row and evicts). Outer
    stream-stream joins REQUIRE both the watermark and the time bound;
    without them unmatched rows could never be finalized."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if views.isStreaming or clicks.isStreaming:
        v = v.withWatermark("view_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    return v.join(
        c,
        F.expr(
            "v_user = c_user AND click_ts >= view_ts "
            f"AND click_ts < view_ts + INTERVAL {max_gap}"
        ),
        how,
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


@register(
    "stream_click_attribution_batch_twin",
    oracle="""
    SELECT v.user_id,
           count(*) AS n_pairs,
           count(DISTINCT v.event_id) AS n_views,
           count(DISTINCT c.event_id) AS n_clicks,
           max(epoch_us(c.ts) - epoch_us(v.ts)) AS max_gap_us
    FROM events v
    JOIN events c
      ON c.user_id = v.user_id
     AND c.ts >= v.ts
     AND c.ts < v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    GROUP BY v.user_id
    """,
    doc="batch twin of the watermarked stream-stream interval join "
    "(click-to-view attribution); equi-key on user keeps the batch "
    "plan a hash join, the time bound keeps streaming state finite",
)
def stream_click_attribution_batch_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = click_view_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("view_id").alias("n_views"),
        F.countDistinct("click_id").alias("n_clicks"),
        F.max("gap_us").alias("max_gap_us"),
    )


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against
    the CURRENT state of the static (batch) side — Spark re-plans the
    static side per batch, so a dimension refreshed in place is picked
    up without restarting the query, and no streaming state is kept
    for the join at all (the static side is broadcast when small).

    This is the streaming face of the reference's dictionary joins
    (tag/category lookups): the batch jobs broadcast the same dims
    (SURVEY §2.3 J6); here the lookup rides every micro-batch."""
    return stream.join(F.broadcast(dim), key, how)


@register(
    "stream_unattributed_views_batch_twin",
    oracle="""
    WITH pairs AS (
        SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = v.user_id
         AND c.ts >= v.ts
         AND c.ts < v.ts + INTERVAL 30 MINUTE
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT view_id) AS BIGINT) AS n_views,
           CAST(COUNT(DISTINCT CASE WHEN click_id IS NULL THEN view_id END)
                AS BIGINT) AS n_unattributed
    FROM pairs GROUP BY user_id
    """,
    doc="batch twin of the LEFT OUTER stream-stream interval join: "
    "views with no click within 30 min emit null click columns — in "
    "streaming, only after the watermark passes view_ts + gap "
    "(finalized-and-evicted), asserted by the execution test",
)
def stream_unattributed_views_batch_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = click_view_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        how="left_outer",
    )
    return pairs.groupBy("user_id").agg(
        F.countDistinct("view_id").alias("n_views"),
        F.countDistinct(
            F.when(F.col("click_id").isNull(), F.col("view_id"))
        ).alias("n_unattributed"),
    )
