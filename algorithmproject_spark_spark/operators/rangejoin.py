"""Range (interval-containment) join — point-in-interval matching at
scale.

Spark has no native range join: ``ON t BETWEEN s AND e`` compiles to a
BroadcastNestedLoopJoin (O(points × intervals), broadcast-bound) — the
classic scale cliff. The standard fix, implemented here: quantize time
into fixed-width buckets, explode each interval into the buckets it
covers, equi-join points to interval-buckets on the bucket id, then
re-check exact containment. The shuffle is keyed on bucket — linear in
``points + Σ(interval_width / bucket_width)`` — and AQE handles hot
buckets like any skewed equi-join key.

Bucket width trades expansion factor against join selectivity; pick it
near the median interval width so each interval explodes into O(1)
buckets. All bucket math is exact integer micros (no float time
arithmetic), so results are engine-portable and oracle-checkable.

The reference has no range/theta joins at all (SURVEY.md §2.3); this
is a north-star custom-operator extension, same family as the as-of
join in ``queries/advanced.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

BUCKET_US = 3_600_000_000  # 1 hour


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int = BUCKET_US,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where
    ``start <= ts < end`` (half-open), via bucket equi-join.

    Returns points columns + intervals columns (caller disambiguates
    names beforehand). ``how`` only supports inner (the scale path);
    outer variants re-add unmatched rows with a cheap anti-join.
    """
    if how != "inner":
        raise NotImplementedError("only inner range join is implemented")
    p = points.withColumn(
        "__bkt", F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us))
    )
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(bucket_us)),
                F.floor(
                    (F.unix_micros(F.col(end_col)) - F.lit(1)) / F.lit(bucket_us)
                ),
            )
        ),
    )
    return (
        p.join(iv, "__bkt")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bkt")
    )


@register(
    "range_join_type_windows",
    oracle="""
    WITH iv AS (
        SELECT event_type AS window_type,
               min(ts) AS w_start,
               min(ts) + INTERVAL 4 HOUR AS w_end
        FROM events GROUP BY event_type
    )
    SELECT window_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events e JOIN iv
      ON e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY window_type
    """,
    doc="range join: events falling in each type's first-4-hours window "
    "— bucketed equi-join instead of Spark's nested-loop theta join",
)
def range_join_type_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.groupBy(F.col("event_type").alias("window_type"))
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 4 HOURS"))
    )
    joined = bucketed_interval_join(
        ev.select("event_id", "user_id", "ts"), iv, "ts", "w_start", "w_end"
    )
    return joined.groupBy("window_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
