"""Exact duplicated-substring span detection (ExactSubstr-style).

The public-paper op (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better") removes *verbatim repeated substrings*
— spans that occur more than once anywhere in the corpus — rather
than whole near-duplicate documents. The paper builds a corpus-wide
suffix array; a suffix array is inherently sequential and does not
shard. The Spark-first equivalent that preserves the semantics at the
chosen granularity:

1. hash every width-K token window with the engine-portable rolling
   hash (functions/hashing.py) — map-only, linear in corpus tokens;
2. count window-hash occurrences corpus-wide (one keyed groupBy with
   map-side partial aggregation; output is ~distinct-gram-sized);
3. semi-join the window relation against the duplicated hashes (gh-
   keyed equi-join — AQE broadcasts the dup set when it is small);
4. merge each document's overlapping/adjacent duplicated windows into
   maximal spans with a per-doc gaps-and-islands window (state is
   bounded by document length, never corpus size);
5. aggregate per-doc span stats.

Nothing is all-pairs and no stage holds more than one document's
positions in a window frame, so the plan survives a 100× scale-up:
the expensive relation (one row per token window) is linear in corpus
tokens and only ever shuffles keyed (by gh, then by doc_id). At 100 TB
the production knob is K (larger K → fewer, more selective duplicated
windows; the paper uses 50 BPE tokens).

Reference parity: none — the reference (whole-doc MD5 dedup,
data_work/is_duplicated.scala) has no substring-level dedup at all;
this is a beyond-reference training-data operator.

Oracle: DuckDB computes the identical rolling-hash windows and the
identical islands merge; all arithmetic is exact BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from algorithmproject_spark_spark.cacheutil import tracked_cache
from algorithmproject_spark_spark.functions.hashing import (
    sql_gram_hash_array,
    sql_token_hash_array,
    ss_bind,
    ss_gram_hash_array,
    ss_token_hash_array,
)
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

SPAN_K = 8  # token-window width (the paper's 50-BPE-token analogue)


def merge_spans(hits: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of width-``k`` windows at ``(doc_id,
    pos)`` into maximal spans ``(doc_id, iid, s, e)``: a window starts
    a new span iff it begins after every previous window's end. State
    per frame = one doc's hits. Shared by the duplicated-span detector
    here and the span-corruption mask generator (queries/maskgen.py)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hits.withColumn(
        "new_isl",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn("iid", F.sum("new_isl").over(w))
    return isl.groupBy("doc_id", "iid").agg(
        F.min("pos").alias("s"), (F.max("pos") + F.lit(k)).alias("e")
    )


def sql_merge_spans(hits_cte: str, k: int) -> str:
    """DuckDB twin of :func:`merge_spans` over a CTE with (doc_id,
    pos); yields a CTE chain ending in ``ms_spans(doc_id, iid, s, e)``."""
    return f"""
    ms_isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(MAX(pos + {k}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                    THEN 1 ELSE 0 END AS new_isl
        FROM {hits_cte}
    ),
    ms_isl2 AS (
        SELECT doc_id, pos,
               SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS iid
        FROM ms_isl
    ),
    ms_spans AS (
        SELECT doc_id, iid, MIN(pos) AS s, MAX(pos) + {k} AS e
        FROM ms_isl2 GROUP BY doc_id, iid
    )
    """


def dup_span_stats(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Per-doc duplicated-span summary over ``docs(doc_id, text)``.

    Returns ``(doc_id, n_tokens, n_dup_spans, dup_tokens,
    dup_permille)`` where spans are maximal merged runs of width-``k``
    token windows whose hash occurs ≥2 times corpus-wide.
    """
    # cache(): the gram relation feeds BOTH the duplicate count and the
    # join-back; uncached, Catalyst computes the (interpreted-HOF)
    # token-hash fold twice — measured 12.7s → 5.5s at sf0.1. Same
    # trade as the dedup family's shingle cache; at 100 TB this is a
    # DISK-backed persist, still linear. The window-count single-pass
    # alternative (count over partition-by-gh) measures the same but
    # sorts the full relation by gh and cannot AQE-split a hot gram.
    grams = docs.select(
        "doc_id",
        # one-parse text twin (r12): token fold bound once, same grams
        F.posexplode(
            F.expr(
                ss_bind(
                    ss_token_hash_array("split(text, ' ')"),
                    "th_",
                    ss_gram_hash_array("th_", k),
                )
            )
        ).alias("pos", "gh"),
    )
    grams = tracked_cache(grams)
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "left_semi")
    per_doc = merge_spans(hits, k).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s")).alias("dup_tokens"),
    )
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
        F.expr("1000 * coalesce(dup_tokens, 0L) div n_tokens").alias(
            "dup_permille"
        ),
    )


def _sql_dup_span_stats(k: int = SPAN_K) -> str:
    th = sql_token_hash_array("string_split(text, chr(32))")
    return f"""
    WITH th AS (SELECT doc_id, {th} AS th FROM documents),
    ga AS (SELECT doc_id, {sql_gram_hash_array('th', k)} AS gha FROM th),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, gha[i] AS gh
        FROM ga, LATERAL (SELECT unnest(range(1, len(gha) + 1)) AS i) u
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
    {sql_merge_spans('hits', k)},
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
               CAST(SUM(e - s) AS BIGINT) AS dup_tokens
        FROM ms_spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, chr(32))) AS BIGINT) AS n_tokens,
           COALESCE(p.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
           COALESCE(p.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
           (1000 * COALESCE(p.dup_tokens, CAST(0 AS BIGINT)))
               // CAST(len(string_split(d.text, chr(32))) AS BIGINT)
               AS dup_permille
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


@register(
    "doc_dup_span_stats",
    oracle=_sql_dup_span_stats(),
    doc=(
        "Exact duplicated-substring spans (Lee et al. 2022 style): "
        "width-8 token windows duplicated corpus-wide, merged to "
        "maximal per-doc spans; per-doc span count / token coverage"
    ),
)
def doc_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_span_stats(load_table(spark, sf_dir, "documents"))
