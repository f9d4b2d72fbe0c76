"""Fuzzy matching — edit-distance-1 joins via deletion-neighborhood
blocking (FastSS / SymSpell family), fully relational.

The naive fuzzy join is O(n²) levenshtein calls; the scalable form
generates, for each string, its |w|+1 deletion variants ({w} ∪ one-
char deletions) as blocking keys. Two strings within edit distance 1
(insert / delete / substitute) always share a key, so an equi-join on
the key set finds every true pair; a cheap levenshtein verify on the
candidates removes the (bounded) false positives — e.g. transposition
pairs like "abcd"/"bacd" share a deletion but are distance 2. Key
volume is Σ(|w|+1) ≈ corpus size × avg length — linear, and the join
shuffles hashes of short strings, never the cross product.

Reference parity: nothing — the reference has no fuzzy matching at
all; this is the typo-tolerant entity-resolution primitive a content
pipeline needs for merging near-identical tags/titles (SURVEY §2.9's
candidate-phrase and label-combine stages assume exact string
equality).

Oracle: DuckDB generates the identical deletion keys with a LATERAL
range unnest and verifies with its levenshtein() — both engines agree
exactly because the candidate predicate is integer edit distance, not
a float score.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.cacheutil import tracked_cache
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

def deletion_keys(col: Column) -> Column:
    """Array of blocking keys for edit-distance-1 matching: the string
    itself plus every one-character deletion — pure codegen'd
    transform over a length sequence, no UDF."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, F.lit(1), i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.concat(F.array(col), dels)


def edit1_pairs(strings: DataFrame, col: str) -> DataFrame:
    """All distinct unordered pairs of `col` values within edit
    distance 1. `strings` must be distinct on `col`. One equi-join on
    the exploded deletion keys + a levenshtein verify on candidates."""
    # rename first: aliasing "w" and referencing the source column of
    # the same name in one select trips lateral-column-alias resolution
    src = strings.select(F.col(col).alias("__fz_w"))
    # cache: the self-join reads the exploded deletion-key relation on
    # BOTH sides — uncached, the distinct + key generation runs twice
    # (r12, the ngram_jaccard/excerpt posting-pin discipline)
    keyed = tracked_cache(
        src.select(
            F.col("__fz_w").alias("w"),
            F.explode(deletion_keys(F.col("__fz_w"))).alias("k"),
        )
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k")) & (F.col("a.w") < F.col("b.w")),
        )
        .select(
            F.col("a.w").alias("word_a"), F.col("b.w").alias("word_b")
        )
        .distinct()
        .withColumn("dist", F.levenshtein("word_a", "word_b"))
        .filter(F.col("dist") <= 1)
    )


@register(
    "fuzzy_name_edit1_pairs",
    oracle="""
    WITH vocab AS (SELECT DISTINCT c_name AS w FROM customer),
    keys AS (
        SELECT w, w AS k FROM vocab
        UNION ALL
        SELECT v.w, substr(v.w, 1, CAST(t.i AS INTEGER) - 1)
                    || substr(v.w, CAST(t.i AS INTEGER) + 1) AS k
        FROM vocab v, LATERAL unnest(range(1, len(v.w) + 1)) AS t(i)
    ),
    cand AS (
        SELECT DISTINCT a.w AS word_a, b.w AS word_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.w < b.w
    ),
    verified AS (
        SELECT word_a, word_b,
               CAST(levenshtein(word_a, word_b) AS INTEGER) AS dist
        FROM cand
        WHERE levenshtein(word_a, word_b) <= 1
    )
    SELECT * FROM (
        SELECT word_a, word_b, dist FROM verified
        ORDER BY word_a, word_b LIMIT 200
    )
    UNION ALL
    SELECT 'TOTAL', 'TOTAL', CAST(count(*) AS INTEGER) FROM verified
    """,
    doc="Fuzzy entity resolution over customer names: every distinct "
    "name pair within edit distance 1, found by deletion-neighborhood "
    "blocking (linear key volume, one equi-join on short-string "
    "hashes) instead of the O(n²) all-pairs levenshtein. The output "
    "pins the first 200 pairs plus a TOTAL row carrying the full "
    "verified-pair count (19.5k at sf0.01), so the oracle checks the "
    "whole relation's cardinality, not just the sample",
)
def fuzzy_name_edit1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    vocab = cust.select(F.col("c_name").alias("w")).distinct()
    verified = tracked_cache(edit1_pairs(vocab, "w"))
    sample = verified.orderBy("word_a", "word_b").limit(200)
    total = verified.agg(F.count(F.lit(1)).cast("int").alias("dist")).select(
        F.lit("TOTAL").alias("word_a"),
        F.lit("TOTAL").alias("word_b"),
        "dist",
    )
    return sample.unionAll(total)
