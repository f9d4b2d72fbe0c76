"""k-NN label-noise detection over the embedding table — the
confident-learning-style curation op that flags probable mislabels.

A labeled embedding corpus (classifier training data, dedup-cluster
exemplars, retrieval gold sets) always carries label errors; the
standard scalable detector is neighborhood disagreement: a vector whose
nearest neighbors mostly carry a DIFFERENT label is a suspect (Northcutt
et al., "Confident Learning", JAIR 2021 — this is the k-NN agreement
variant, the form that needs no model probabilities).

Scale shape — the full SemDeDup discipline (queries/llmprep.py):
neighbors come from the vector's IVF cell REFINED by the oversized-cell
residual-parity split, so the candidate join is an equi-join on
(cell, subcell) whose per-group pair work is capped at
~SEMDEDUP_CELL_CAP² regardless of corpus size or embedding skew —
never all-pairs, and never an unbounded within-cell quadratic (the
first sf1 sweep caught the unsplit form: 50k vectors × 8 pinned cells
is ~300M candidate pairs, hours in the single-threaded oracle; split,
it is bounded and sweeps in seconds). Per-vector norms are computed
once; cosine is dot/(na·nb) in integer micros, ties break by neighbor
id, and singleton-group vectors still emit a (0, 0, not-suspect) row
via the spine left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from algorithmproject_spark_spark.functions.numeric import micros, sql_micros
from algorithmproject_spark_spark.functions.vectors import (
    _dot_d,
    _norm_d,
    sql_dot,
    sql_norm,
    sql_to_double,
    to_double,
)
from algorithmproject_spark_spark.operators.annivf import (
    K_CELLS,
    cell_col,
    sql_cell,
)
from algorithmproject_spark_spark.queries.llmprep import (
    SEMDEDUP_CELL_CAP,
    _sql_residual_code,
    semdedup_subcells,
)
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

KNN_K = 5


@register(
    "knn_label_noise",
    oracle=f"""
    WITH cn AS MATERIALIZED (
        SELECT vec_id, label, {sql_cell('embedding')} AS cell,
               {sql_to_double('embedding')} AS we,
               {sql_norm('embedding')} AS nrm
        FROM embeddings
    ),
    sz AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS c FROM cn GROUP BY cell
    ),
    cs AS MATERIALIZED (
        SELECT cn.vec_id, cn.label, cn.cell, cn.we, cn.nrm,
               {_sql_residual_code('cn.we')}
                   % ((sz.c + {SEMDEDUP_CELL_CAP - 1}) // {SEMDEDUP_CELL_CAP})
                   AS subcell
        FROM cn JOIN sz USING (cell)
    ),
    scored AS (
        SELECT a.vec_id, a.label, b.label AS nlabel, b.vec_id AS n_id,
               {sql_micros(f"({sql_dot('a.we', 'b.we')}) / (a.nrm * b.nrm)")}
                   AS cos_e6
        FROM cs a JOIN cs b
          ON a.cell = b.cell AND a.subcell = b.subcell
         AND a.vec_id <> b.vec_id
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
        "variant): per vector, the share of its 5 nearest "
        "same-(cell, subcell) neighbors carrying its own label; "
        "minority-label vectors flagged suspect — SemDeDup-capped "
        "candidate groups, never all-pairs, bounded under skew"
    ),
)
def knn_label_noise(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
    cell_cap: int = SEMDEDUP_CELL_CAP,
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    k = n_cells or K_CELLS
    cn = emb.select(
        "vec_id",
        "label",
        cell_col(F.col("embedding"), k).alias("cell"),
        to_double(F.col("embedding")).alias("we"),
    ).withColumn("nrm", _norm_d(F.col("we")))
    cs = semdedup_subcells(cn, cell_cap)
    a = cs.select(
        "vec_id",
        "label",
        F.col("we").alias("a_we"),
        F.col("nrm").alias("a_n"),
        "cell",
        "subcell",
    )
    b = cs.select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("nlabel"),
        F.col("we").alias("b_we"),
        F.col("nrm").alias("b_n"),
        "cell",
        "subcell",
    )
    scored = (
        a.join(b, ["cell", "subcell"])
        .filter(F.col("vec_id") != F.col("n_id"))
        .select(
            "vec_id",
            "label",
            "nlabel",
            "n_id",
            micros(
                _dot_d(F.col("a_we"), F.col("b_we"))
                / (F.col("a_n") * F.col("b_n"))
            ).alias("cos_e6"),
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
    spine = cn.select("vec_id", "label")
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
