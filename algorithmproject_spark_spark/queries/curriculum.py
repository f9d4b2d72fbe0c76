"""Curriculum ordering for training — difficulty bands + deterministic
shard assignment, with NO global sort.

Length-based curricula (short sequences first) are the standard
warm-up schedule for LLM pretraining, but the naive implementation is
a corpus-wide ORDER BY — the one operation that cannot survive 100 TB
(a single range-partitioned total order of every row). The scalable
form ships here: each doc gets

- a difficulty BAND (token-count decile) from exact order-statistic
  cut points computed over the COMPACTED token-count distribution
  (the quality_dup_calibration pattern — the single-partition window
  runs over distinct counts, never docs);
- a deterministic SHARD (engine-portable hash of doc_id — stable
  under re-runs and repartitioning, which ``rand()`` is not);
- a sortable ORDER KEY (band in the high bits, hash bucket below), so
  a trainer streams shard s in key order and reads easy→hard without
  anyone ever materializing a global sort — ordering is ENCODED, not
  executed.

Scale shape: one map-only token-count pass, a ≤|distinct counts|-row
cut-point aggregation broadcast back (scalar_cross), one map-only
assignment. Zero data-scale shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from algorithmproject_spark_spark.functions.numeric import (
    sql_hash_mod,
    ss_hash_mod,
)
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

N_SHARDS = 16
N_BANDS = 10
#: hash-bucket width for the order key's low bits
KEY_MOD = 1 << 20


@register(
    "corpus_curriculum_assignment",
    plan=("scalar_cross",),
    oracle=f"""
    WITH cu_t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cu_d AS (SELECT n_tokens AS v, COUNT(*) AS c FROM cu_t GROUP BY v),
    cu_c AS (
        SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n
        FROM cu_d
    ),
    cu_cuts AS (
        SELECT {", ".join(
            f"MIN(CASE WHEN cum * {N_BANDS} >= n * {k} THEN v END) AS p{k}"
            for k in range(1, N_BANDS)
        )}
        FROM cu_c
    ),
    cu_b AS (
        SELECT t.doc_id, t.n_tokens,
               1 {" ".join(
                   f"+ CASE WHEN t.n_tokens > p{k} THEN 1 ELSE 0 END"
                   for k in range(1, N_BANDS)
               )} AS band
        FROM cu_t t, cu_cuts
    )
    SELECT doc_id, n_tokens,
           CAST(band AS BIGINT) AS band,
           CAST({sql_hash_mod('doc_id', N_SHARDS)} AS BIGINT) AS shard,
           CAST(band * {KEY_MOD} + {sql_hash_mod('doc_id', KEY_MOD)}
               AS BIGINT) AS order_key
    FROM cu_b
    """,
    doc=(
        "curriculum assignment without a global sort: token-count "
        "decile band from exact order-statistic cuts over the COMPACTED "
        "count distribution, deterministic hash shard, and a sortable "
        "order key (band in the high bits) — a trainer streams each "
        "shard in key order easy-to-hard; ordering is encoded, never "
        "executed as a corpus-wide ORDER BY"
    ),
)
def corpus_curriculum_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one-parse text glue (r13): identical expressions
    t = docs.selectExpr(
        "doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens"
    )
    dist = t.groupBy(F.col("n_tokens").alias("v")).agg(
        F.expr("count(1) AS c")
    )
    cum = dist.selectExpr(
        "v",
        "sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " CURRENT ROW) AS cum",
        "sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " UNBOUNDED FOLLOWING) AS n",
    )
    cuts = cum.agg(
        *[
            F.expr(
                f"min(CASE WHEN cum * {N_BANDS} >= n * {k} THEN v END)"
                f" AS p{k}"
            )
            for k in range(1, N_BANDS)
        ]
    )
    band = "1 + " + " + ".join(
        f"CAST(n_tokens > p{k} AS INT)" for k in range(1, N_BANDS)
    )
    return t.crossJoin(F.broadcast(cuts)).selectExpr(
        "doc_id",
        "n_tokens",
        f"CAST({band} AS BIGINT) AS band",
        f"CAST({ss_hash_mod('doc_id', N_SHARDS)} AS BIGINT) AS shard",
        f"CAST(CAST({band} AS BIGINT) * {KEY_MOD}"
        f" + {ss_hash_mod('doc_id', KEY_MOD)} AS BIGINT) AS order_key",
    )
