"""ANN quality measurement — recall of the approximate paths against
exact brute force.

An approximate-nearest-neighbor path you can't measure is a liability
at 100 TB: this query joins the LSH top-k against the exact cosine
top-k per query vector and reports hits-of-k, making recall a
first-class, oracle-checked output of the engine rather than a claim.
The DuckDB twin nests the two already-registered oracle derivations as
CTEs, so both sides of the comparison are independently re-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import REGISTRY, register

_LSH_SQL = REGISTRY["ann_lsh_topk"].oracle
_BF_SQL = REGISTRY["knn_bruteforce_cosine"].oracle


@register(
    "ann_lsh_recall",
    plan=("scalar_cross",),
    oracle=f"""
    WITH lsh AS ({_LSH_SQL}),
    bf AS ({_BF_SQL})
    SELECT bf.q_id, count(lsh.neighbor_id) AS n_hits,
           count(*) AS k
    FROM bf LEFT JOIN lsh
      ON bf.q_id = lsh.q_id AND bf.neighbor_id = lsh.neighbor_id
    GROUP BY bf.q_id
    """,
    doc="recall@k of the hyperplane-LSH ANN path vs exact brute-force "
    "top-k, per query vector — approximate paths ship with their own "
    "oracle-checked quality metric",
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    lsh = REGISTRY["ann_lsh_topk"].fn(spark, sf_dir).select(
        "q_id", F.col("neighbor_id").alias("lsh_neighbor")
    )
    bf = REGISTRY["knn_bruteforce_cosine"].fn(spark, sf_dir).select(
        "q_id", "neighbor_id"
    )
    hit = bf.join(
        lsh,
        (bf.q_id == lsh.q_id) & (bf.neighbor_id == lsh.lsh_neighbor),
        "left",
    ).select(bf.q_id, lsh.lsh_neighbor)
    return hit.groupBy("q_id").agg(
        F.count("lsh_neighbor").alias("n_hits"),
        F.count(F.lit(1)).alias("k"),
    )


_IVF_SQL = REGISTRY["ann_ivf_topk"].oracle


@register(
    "ann_ivf_recall",
    plan=("scalar_cross",),
    oracle=f"""
    WITH ivf AS ({_IVF_SQL}),
    bf AS ({_BF_SQL})
    SELECT bf.q_id, count(ivf.neighbor_id) AS n_hits,
           count(*) AS k
    FROM bf LEFT JOIN ivf
      ON bf.q_id = ivf.q_id AND bf.neighbor_id = ivf.neighbor_id
    GROUP BY bf.q_id
    """,
    doc="recall@k of the IVF ANN path vs exact brute-force top-k, per "
    "query vector",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivf = REGISTRY["ann_ivf_topk"].fn(spark, sf_dir).select(
        "q_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    bf = REGISTRY["knn_bruteforce_cosine"].fn(spark, sf_dir).select(
        "q_id", "neighbor_id"
    )
    hit = bf.join(
        ivf,
        (bf.q_id == ivf.q_id) & (bf.neighbor_id == ivf.ivf_neighbor),
        "left",
    ).select(bf.q_id, ivf.ivf_neighbor)
    return hit.groupBy("q_id").agg(
        F.count("ivf_neighbor").alias("n_hits"),
        F.count(F.lit(1)).alias("k"),
    )
