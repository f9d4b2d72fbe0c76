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
    # empty/inverted intervals (end <= start) contain nothing under the
    # half-open contract; dropped up front so the bucket explode never
    # sees a descending F.sequence (start-bucket > end-bucket)
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
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


def bucketed_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_us: int = BUCKET_US,
) -> DataFrame:
    """Interval × interval OVERLAP join (half-open: ``a.s < b.e AND
    b.s < a.e``) — the second theta-join Spark lacks natively.

    Both sides explode into the integer-micro buckets they cover and
    equi-join on the bucket id. A pair overlapping k shared buckets
    would match k times; instead of a distinct (a full extra shuffle
    of the result), each pair is kept only in its FIRST shared bucket
    — the bucket containing ``max(a.s, b.s)`` — which every true
    overlap has exactly one of. Start/end columns must be BIGINT
    epoch micros (exact integer bucket math, engine-portable).

    Intervals are HALF-OPEN AND NON-EMPTY by contract: rows with
    ``end <= start`` are dropped up front on both sides. Without the
    guard an inverted interval feeds ``F.sequence(hi, lo)`` a
    DESCENDING bucket list (buckets it does not cover), and an EMPTY
    interval ``[x, x)`` sitting inside the other side would still
    satisfy the strict overlap predicate (``a.s < b.e AND b.s <
    a.e``) — a spurious match, since the empty set overlaps nothing.
    """
    a = a.filter(F.col(a_end) > F.col(a_start))
    b = b.filter(F.col(b_end) > F.col(b_start))
    ea = a.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(a_start) / F.lit(bucket_us)),
                F.floor((F.col(a_end) - F.lit(1)) / F.lit(bucket_us)),
            )
        ),
    )
    eb = b.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(b_start) / F.lit(bucket_us)),
                F.floor((F.col(b_end) - F.lit(1)) / F.lit(bucket_us)),
            )
        ),
    )
    return (
        ea.join(eb, "__bkt")
        .filter(
            (F.col(a_start) < F.col(b_end))
            & (F.col(b_start) < F.col(a_end))
        )
        .filter(
            F.col("__bkt")
            == F.floor(
                F.greatest(F.col(a_start), F.col(b_start)) / F.lit(bucket_us)
            )
        )
        .drop("__bkt")
    )


STORM_ERRORS = 7  # errors/hour that make an "error storm"


@register(
    "user_day_overlap_error_storms",
    oracle=f"""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(epoch_us(ts)) AS a_s, MAX(epoch_us(ts)) + 1 AS a_e
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    storm AS (
        SELECT epoch_us(date_trunc('hour', ts)) AS b_s,
               epoch_us(date_trunc('hour', ts)) + 3600000000 AS b_e
        FROM events WHERE event_type = 'error'
        GROUP BY date_trunc('hour', ts) HAVING COUNT(*) >= {STORM_ERRORS}
    )
    SELECT ud.user_id, ud.day, CAST(COUNT(*) AS BIGINT) AS n_storms
    FROM ud JOIN storm ON ud.a_s < storm.b_e AND storm.b_s < ud.a_e
    GROUP BY ud.user_id, ud.day
    """,
    doc="Interval-overlap join (bucketed, first-shared-bucket dedup — "
    "no distinct shuffle): per-user daily activity spans × "
    "high-error-rate storm hours; which user-days were exposed to a "
    "storm and to how many",
)
def user_day_overlap_error_storms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min(F.unix_micros("ts")).alias("a_s"),
        (F.max(F.unix_micros("ts")) + F.lit(1)).alias("a_e"),
    )
    storm = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= STORM_ERRORS)
        .select(
            F.unix_micros("h").alias("b_s"),
            (F.unix_micros("h") + F.lit(3_600_000_000)).alias("b_e"),
        )
    )
    joined = bucketed_overlap_join(ud, storm, "a_s", "a_e", "b_s", "b_e")
    return joined.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_storms")
    )
