"""Corpus drift — exact distribution comparison between two corpus
slices.

The data-quality question behind every corpus refresh: did the token
distribution MOVE? Comparing two 50-TB crawls can't use χ²/KL
directly (logs and float sums diverge across engines); the
total-variation contribution per token is exact in integers:

    drift_ppm(t) = | ppm(c_A(t), N_A) - ppm(c_B(t), N_B) |

where ppm is the overflow-bounded exact parts-per-million helper
(functions/numeric.py — counts over ~9.2e12 would wrap the naive
c*1e6). Σ drift_ppm / 2e6 IS the total-variation distance between
the two unigram distributions; the per-token rows rank WHAT moved.

Spark shape: one map-only side split (deterministic hash-mod on
doc_id — reproducible, partition-independent), one (tok, side) keyed
count collapsed to per-token A/B columns via conditional aggregation
(single shuffle, never a pivot of unknown width), totals as a
broadcast 1-row aggregate, top-k via TakeOrderedAndProject (bounded
driver result, no global sort stage).

Reference parity: none — the reference has no distribution-comparison
op; this extends the quality family (operators/quality.py) with the
drift primitive batch curation needs before swapping a corpus in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.functions.numeric import (
    hash_mod,
    ppm,
    sql_hash_mod,
    sql_ppm,
)
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

TOP_N = 50


def token_drift(docs: DataFrame, top_n: int = TOP_N) -> DataFrame:
    """Top-``top_n`` drifted tokens between the two hash-mod halves of
    ``docs``: ``(tok, c_a, c_b, ppm_a, ppm_b, drift_ppm)``, ordered by
    (drift desc, tok) with the ordering made deterministic.

    Degenerate input contract: an EMPTY side (all docs hashing to one
    half — only possible for a near-empty corpus) makes the ppm
    denominator 0, which raises loudly under ANSI mode in both engines
    rather than fabricating a drift of 0."""
    toks = docs.select(
        hash_mod("doc_id", 2).alias("side"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c_b"),
    )
    totals = counts.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            "c_a",
            "c_b",
            ppm(F.col("c_a"), F.col("n_a")).alias("ppm_a"),
            ppm(F.col("c_b"), F.col("n_b")).alias("ppm_b"),
        )
        .withColumn(
            "drift_ppm", F.abs(F.col("ppm_a") - F.col("ppm_b"))
        )
    )
    return ranked.orderBy(F.col("drift_ppm").desc(), "tok").limit(top_n)


def _register() -> None:
    @register(
        "corpus_token_drift",
        plan=("scalar_cross",),
        oracle=f"""
        WITH cd_t AS (
            SELECT {sql_hash_mod('doc_id', 2)} AS side,
                   unnest(string_split(text, chr(32))) AS tok
            FROM documents
        ),
        cd_c AS (
            SELECT tok,
                   CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
                   CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
            FROM cd_t GROUP BY tok
        ),
        cd_n AS (SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM cd_c)
        SELECT tok, c_a, c_b,
               {sql_ppm('c_a', 'n_a')} AS ppm_a,
               {sql_ppm('c_b', 'n_b')} AS ppm_b,
               abs({sql_ppm('c_a', 'n_a')} - {sql_ppm('c_b', 'n_b')}) AS drift_ppm
        FROM cd_c, cd_n
        ORDER BY drift_ppm DESC, tok LIMIT {TOP_N}
        """,
        doc="Corpus drift between the two hash-mod halves of the "
        "corpus: per-token exact ppm frequencies and |Δppm| (the "
        "total-variation contribution), overflow-bounded two-step "
        "integer scaling, top-50 movers — the distribution-shift "
        "gate a corpus refresh runs before swapping sources",
    )
    def corpus_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        return token_drift(load_table(spark, sf_dir, "documents"))


_register()


def _register_daily() -> None:
    @register(
        "events_daily_drift_tv",
        oracle=f"""
        WITH dd_c AS (
            SELECT CAST(ts AS DATE) AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY day, event_type
        ),
        dd_n AS (
            SELECT day, CAST(SUM(c) AS BIGINT) AS n FROM dd_c GROUP BY day
        ),
        dd_p AS (
            SELECT c.day, c.event_type, {sql_ppm('c.c', 'n.n')} AS p
            FROM dd_c c JOIN dd_n n USING (day)
        ),
        dd_b AS (
            -- CAST back to DATE: DuckDB's date + INTERVAL promotes to
            -- TIMESTAMP, which would type-mismatch the Spark column
            SELECT CAST(day + INTERVAL 1 DAY AS DATE) AS day,
                   event_type, p AS p_prev
            FROM dd_p
        ),
        -- FULL join: a type present only yesterday still contributes
        -- |0 - p_prev| (a left join would under-count the distance)
        dd_j AS (
            SELECT COALESCE(a.day, b.day) AS day,
                   abs(COALESCE(a.p, 0) - COALESCE(b.p_prev, 0)) AS d
            FROM dd_p a
            FULL JOIN dd_b b
              ON b.day = a.day AND b.event_type = a.event_type
        )
        SELECT j.day, CAST(SUM(j.d) // 2 AS BIGINT) AS tv_ppm
        FROM dd_j j
        WHERE EXISTS (SELECT 1 FROM dd_n x
                      WHERE CAST(x.day + INTERVAL 1 DAY AS DATE) = j.day)
          AND EXISTS (SELECT 1 FROM dd_n y WHERE y.day = j.day)
        GROUP BY j.day
        """,
        doc="day-over-day distribution shift monitor: total-variation "
        "distance (exact ppm, Σ|Δppm| div 2) between each day's and "
        "the previous day's event-type mix — the alerting primitive "
        "behind 'did the traffic mix change overnight'; one keyed "
        "count + a self-join on the tiny (day, type) relation",
    )
    def events_daily_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
        from algorithmproject_spark_spark.functions.numeric import floordiv

        ev = load_table(spark, sf_dir, "events")
        c = ev.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("c"))
        n = c.groupBy("day").agg(F.sum("c").alias("n"))
        p = c.join(n, "day").select(
            "day", "event_type", ppm(F.col("c"), F.col("n")).alias("p")
        )
        prev = p.select(
            F.date_add("day", 1).alias("day"),
            F.col("event_type"),
            F.col("p").alias("p_prev"),
        )
        # FULL join over the union of both days' type sets: a type
        # present only yesterday still contributes |0 - p_prev| (a
        # left join would under-count the distance)
        joined = p.join(prev, ["day", "event_type"], "full_outer").select(
            "day",
            F.abs(
                F.coalesce("p", F.lit(0)) - F.coalesce("p_prev", F.lit(0))
            ).alias("d"),
        )
        # keep only days where BOTH sides exist (first/last day have
        # no pair — no distribution to compare against)
        today_days = n.select("day")
        prev_days = n.select(F.date_add("day", 1).alias("day")).distinct()
        return (
            joined.join(today_days, "day", "left_semi")
            .join(prev_days, "day", "left_semi")
            .groupBy("day")
            .agg(floordiv(F.sum("d"), F.lit(2)).alias("tv_ppm"))
        )


_register_daily()
