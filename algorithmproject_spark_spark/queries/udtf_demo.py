"""Python UDTF (Spark 4 user-defined table function) coverage.

Completes the Spark-4 API family (VARIANT, SQL UDF, recursive CTE,
correlated LATERAL — queries/spark4.py, tpch2.py) with the remaining
member: a PYTHON table function. The UDTF expands each document into
(position, token, is_first_occurrence) rows — per-row multiplicity is
data-dependent, the one shape a scalar UDF cannot produce and the
reason the API exists. ``useArrow=True`` keeps the transfer
Arrow-batched (the engine's only sanctioned Python execution class;
declared ``arrow`` for the plan linter).

The query aggregates the expansion to a bounded result: per token, its
corpus count and the number of documents where it appears as a FIRST
occurrence sum — semantics chosen so the UDTF's per-row STATE (the
seen-set inside one eval call) is actually exercised, not just a
stateless split the built-in posexplode already covers. Oracle: the
same expansion via positional unnest + a window-free first-occurrence
rule (min position per (doc, token)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

TOPK_TOKENS = 20


@udtf(returnType="pos: bigint, tok: string, first_occ: int", useArrow=True)
class TokenPositions:
    """Expand one document's text into (pos, token, first_occ) rows —
    first_occ flags the token's FIRST position within the document
    (per-call state: the seen-set)."""

    def eval(self, text: str):
        # NULL text must mean "no rows", matching the oracle's
        # string_split(NULL, ' ') — not a Python-worker crash
        if text is None:
            return
        seen = set()
        for pos, tok in enumerate(text.split(" "), start=1):
            first = 1 if tok not in seen else 0
            seen.add(tok)
            yield pos, tok, first


@register(
    "doc_token_positions_udtf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    flagged AS (
        SELECT doc_id, tok, pos,
               CASE WHEN pos = min(pos) OVER (PARTITION BY doc_id, tok)
                    THEN 1 ELSE 0 END AS first_occ
        FROM toks
    )
    SELECT tok, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(first_occ) AS BIGINT) AS n_first_docs,
           CAST(min(pos) AS BIGINT) AS min_pos
    FROM flagged GROUP BY tok
    ORDER BY n_total DESC, tok LIMIT {TOPK_TOKENS}
    """,
    doc=(
        "Python UDTF (Spark 4, Arrow-batched) expanding docs into "
        "positional token rows with stateful first-occurrence flags — "
        "the data-dependent-multiplicity shape scalar UDFs cannot "
        "produce; aggregated to a bounded per-token summary"
    ),
    plan=("arrow",),
)
def doc_token_positions_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expanded = docs.lateralJoin(
        TokenPositions(F.col("text").outer())
    )
    return (
        expanded.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("first_occ").cast("long").alias("n_first_docs"),
            F.min("pos").alias("min_pos"),
        )
        .orderBy(F.desc("n_total"), F.asc("tok"))
        .limit(TOPK_TOKENS)
    )
