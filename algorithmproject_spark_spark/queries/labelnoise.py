"""k-NN label-noise detection over the embedding table — the
confident-learning-style curation op that flags probable mislabels.

A labeled embedding corpus (classifier training data, dedup-cluster
exemplars, retrieval gold sets) always carries label errors; the
standard scalable detector is neighborhood disagreement: a vector whose
nearest neighbors mostly carry a DIFFERENT label is a suspect (Northcutt
et al., "Confident Learning", JAIR 2021 — this is the k-NN agreement
variant, the form that needs no model probabilities).

Scale shape: neighbors come from the vector's own IVF cell (the
``nprobe=1`` posture), so candidate generation is an equi-join on the
cell key — linear in vectors × cell size, never all-pairs; cell size is
bounded by the ``cells_for(n)`` knob exactly as in the ANN top-k path.
Within-cell work is the same O(cell²) kernel as SemDeDup, with the same
documented bound. Per-vector top-k keeps ties deterministic
(cosine_e6 DESC, neighbor id ASC). Singleton-cell vectors still emit a
row (k_eff = 0, not suspect) via the left spine join, so the output is
a complete per-vector verdict table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from algorithmproject_spark_spark.functions.numeric import micros, sql_micros
from algorithmproject_spark_spark.functions.vectors import cosine, sql_cosine
from algorithmproject_spark_spark.operators.annivf import (
    _SQL_CELLS,
    cells,
    sql_cell,
)
from algorithmproject_spark_spark.registry import register

KNN_K = 5


@register(
    "knn_label_noise",
    oracle=f"""
    WITH c AS ({_SQL_CELLS.format(c=sql_cell('embedding'))}),
    scored AS (
        SELECT a.vec_id, a.label, b.label AS nlabel, b.vec_id AS n_id,
               {sql_micros(sql_cosine('a.embedding', 'b.embedding'))}
                   AS cos_e6
        FROM c a JOIN c b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT vec_id, label, nlabel,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos_e6 DESC, n_id
               ) AS rk
        FROM scored
    ),
    votes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN nlabel = label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_same,
               CAST(count(*) AS BIGINT) AS k_eff
        FROM ranked WHERE rk <= {KNN_K} GROUP BY vec_id
    )
    SELECT e.vec_id, e.label,
           coalesce(v.n_same, 0) AS n_same,
           coalesce(v.k_eff, 0) AS k_eff,
           CASE WHEN coalesce(v.k_eff, 0) > 0
                 AND 2 * coalesce(v.n_same, 0) < coalesce(v.k_eff, 0)
                THEN 1 ELSE 0 END AS suspect
    FROM embeddings e LEFT JOIN votes v ON e.vec_id = v.vec_id
    """,
    doc=(
        "k-NN label-noise detection (confident-learning agreement "
        "variant): per vector, the share of its 5 nearest same-cell "
        "neighbors carrying its own label; minority-label vectors are "
        "flagged suspect — IVF-cell-bounded candidate generation, "
        "never all-pairs"
    ),
)
def knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cells(spark, sf_dir)
    a = c.select(
        F.col("vec_id"),
        F.col("label"),
        F.col("embedding").alias("emb_a"),
        F.col("cell"),
    )
    b = c.select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("emb_b"),
        F.col("cell"),
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("vec_id") != F.col("n_id"))
        .select(
            "vec_id",
            "label",
            "nlabel",
            "n_id",
            micros(cosine(F.col("emb_a"), F.col("emb_b"))).alias("cos_e6"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_e6"), F.asc("n_id"))
    votes = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .groupBy("vec_id")
        .agg(
            F.sum(F.when(F.col("nlabel") == F.col("label"), 1).otherwise(0))
            .cast("long")
            .alias("n_same"),
            F.count(F.lit(1)).cast("long").alias("k_eff"),
        )
    )
    spine = c.select("vec_id", "label")
    j = spine.join(votes, "vec_id", "left")
    n_same = F.coalesce("n_same", F.lit(0).cast("long"))
    k_eff = F.coalesce("k_eff", F.lit(0).cast("long"))
    return j.select(
        "vec_id",
        "label",
        n_same.alias("n_same"),
        k_eff.alias("k_eff"),
        F.when((k_eff > 0) & (2 * n_same < k_eff), 1)
        .otherwise(0)
        .alias("suspect"),
    )
