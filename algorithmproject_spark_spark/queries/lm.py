"""Unigram language-model scoring — perplexity-style quality filtering.

The CCNet recipe (Wenzek et al., LREC 2020) ranks web documents by
their perplexity under a language model trained on trusted text; docs
with extreme perplexity are boilerplate/gibberish candidates. The
reference's quality stack stops at rule scores (its quality checks are
length/ratio heuristics); this adds the distributional half: a unigram
LM fit on the corpus itself, and per-document cross-entropy under it.

    xent(d) = -(1/n_d) Σ_t c_dt · ln(c_t / N)
            =  (1/n_d) Σ_t c_dt · (ln N − ln c_t)

Determinism discipline (functions/numeric.py): float SUMS are
partition-order dependent, so every per-(doc,token) term is converted
to exact micro-nat integers FIRST — floor(x·10⁶ + 0.5) is pure IEEE,
bit-identical in any engine — then summed as BIGINTs and floor-divided
by the token count. The result is identical across partitionings,
re-runs, and engines. (ln itself is the one library call both engines
evaluate on identical doubles; a term landing within 1e-10 of a
rounding boundary could in principle differ by 1 micro-nat — the same
accepted exposure as the TF-IDF family, hash-green since round 1.)

Plan shape: one explode + (doc,token) count shuffle; vocabulary agg of
the cached count relation; corpus total as a broadcast 1-row scalar;
vocabulary joined BACK via broadcast (vocab-sized dimension, the
tfidf_top_terms precedent); one doc_id agg. No self-joins, no windows,
no Python. Overflow: Σ term_e6 ≤ n_d · ln(N) · 10⁶ — a 10⁹-token doc
under a 10¹⁸-token corpus stays < 5e16, far inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.cacheutil import tracked_cache
from algorithmproject_spark_spark.functions.numeric import floordiv, micros
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

TOPK_SURPRISING = 20
# 0.02-nat histogram bands: the synthetic corpus' xent spread is a few
# tenths of a nat, so nat-sized bands would collapse to one bucket;
# banding floor-divides EXACT integer micro-nats, so band membership
# carries zero float-boundary risk at any width
BAND_NATS_E6 = 20_000

# Shared CTE prefix for both oracles — the SQL twin of _doc_xent.
_XENT_CTES = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    dtc AS (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c_dt
        FROM tok GROUP BY doc_id, t
    ),
    vocab AS (
        SELECT t, CAST(sum(c_dt) AS BIGINT) AS c_t
        FROM dtc GROUP BY t
    ),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM vocab),
    terms AS (
        SELECT doc_id,
               CAST(floor(
                   c_dt * (ln(n) - ln(c_t)) * 1000000.0 + 0.5
               ) AS BIGINT) AS term_e6,
               c_dt
        FROM dtc JOIN vocab USING (t) CROSS JOIN tot
    ),
    perdoc AS (
        SELECT doc_id,
               CAST(sum(term_e6) AS BIGINT) AS s_e6,
               CAST(sum(c_dt) AS BIGINT) AS n_tok
        FROM terms GROUP BY doc_id
    ),
    xent AS (
        SELECT doc_id, n_tok, s_e6 // n_tok AS xent_e6 FROM perdoc
    )
"""


def _doc_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tok, xent_e6) — per-doc unigram cross-entropy in
    exact micro-nats."""
    docs = load_table(spark, sf_dir, "documents")
    # same raw-split tokenization as the itemset/co-occurrence family
    # (itemsets.py::_doc_tokens) so LM stats compose with theirs
    dtc = tracked_cache(
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c_dt"))
    )
    vocab = dtc.groupBy("t").agg(F.sum("c_dt").alias("c_t"))
    tot = vocab.agg(F.sum("c_t").alias("n"))
    terms = (
        # vocabulary dimension → broadcast (tfidf_top_terms precedent):
        # avoids shuffling the (doc, token) relation on a skewed token
        # key just to fetch one count per row
        dtc.join(F.broadcast(vocab), "t")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "term_e6",
            micros(
                F.col("c_dt").cast("double")
                * (F.log(F.col("n")) - F.log(F.col("c_t")))
            ),
        )
    )
    perdoc = terms.groupBy("doc_id").agg(
        F.sum("term_e6").alias("s_e6"),
        F.sum("c_dt").alias("n_tok"),
    )
    return perdoc.select(
        "doc_id",
        "n_tok",
        floordiv(F.col("s_e6"), F.col("n_tok")).alias("xent_e6"),
    )


@register(
    "doc_unigram_surprise_topk",
    oracle=_XENT_CTES
    + f"""
    SELECT x.doc_id, d.lang, x.n_tok, x.xent_e6
    FROM xent x JOIN documents d USING (doc_id)
    ORDER BY xent_e6 DESC, doc_id LIMIT {TOPK_SURPRISING}
    """,
    doc=(
        "CCNet-style quality filter: top-20 most-surprising docs by "
        "unigram-LM cross-entropy (exact micro-nats)"
    ),
    plan=("scalar_cross",),
)
def doc_unigram_surprise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        _doc_xent(spark, sf_dir)
        .join(docs, "doc_id")
        .orderBy(F.desc("xent_e6"), F.asc("doc_id"))
        .limit(TOPK_SURPRISING)
        .select("doc_id", "lang", "n_tok", "xent_e6")
    )


@register(
    "corpus_xent_bands",
    oracle=_XENT_CTES
    + f"""
    SELECT xent_e6 // {BAND_NATS_E6} AS band_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens
    FROM xent GROUP BY 1 ORDER BY band_idx
    """,
    doc=(
        "corpus cross-entropy histogram (1-nat bands) — the "
        "distribution the CCNet head/middle/tail cut reads"
    ),
    plan=("scalar_cross",),
)
def corpus_xent_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _doc_xent(spark, sf_dir)
        .withColumn(
            "band_idx", floordiv(F.col("xent_e6"), F.lit(BAND_NATS_E6))
        )
        .groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
        )
        # no orderBy: the band relation is tiny and the driver's
        # hash-compare sorts rows — a global sort here would be a
        # gratuitous rangepartitioning exchange
    )
