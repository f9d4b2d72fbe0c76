"""Random-hyperplane (SimHash-for-vectors) LSH over embeddings — the
100 TB scale path for similarity search (north-star extension).

Brute force is O(n·q); hyperplane LSH hashes each vector to a bucket
(one bit per hyperplane = sign of the dot product), then joins only
within buckets — an equi-join Catalyst shuffles on the bucket key, so
candidate generation is linear and AQE handles bucket skew. Recall
depends on how clustered the corpus is; the query contract ("top-k
within probed buckets", "pairs within a bucket above threshold") is
deterministic and oracle-checked either way.

Hyperplanes are FIXED literals from a seeded PRNG: both engines parse
the identical decimal literals to identical doubles, and dot products
are sequential folds, so even the sign of a near-zero dot product
agrees bit-for-bit cross-engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from algorithmproject_spark_spark.functions.numeric import micros, sql_micros
from algorithmproject_spark_spark.functions.vectors import cosine, sql_cosine, to_double
from algorithmproject_spark_spark.queries.base import register
from algorithmproject_spark_spark.sources.catalog import load_table

N_PLANES = 6  # 64 buckets
DIM = 64
N_QUERIES = 5
TOP_K = 3
NEAR_DUP_E6 = 400_000  # cosine ≥ 0.40

_rng = random.Random(7)
PLANES: tuple[tuple[float, ...], ...] = tuple(
    tuple(round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM))
    for _ in range(N_PLANES)
)


def bucket_col(emb: Column) -> Column:
    """LSH bucket id: bit j = sign(dot(v, plane_j))."""
    v = to_double(emb)
    acc = F.lit(0)
    for j, plane in enumerate(PLANES):
        pl = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(v, pl, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b
        )
        acc = acc + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def sql_bucket(emb: str) -> str:
    terms = []
    for j, plane in enumerate(PLANES):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        d = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {DIM} + 1), "
            f"i_ -> CAST({emb}[i_] AS DOUBLE) * ({lit})[i_])), "
            f"(a_, b_) -> a_ + b_)"
        )
        terms.append(f"CASE WHEN {d} >= 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", "embedding", bucket_col(F.col("embedding")).alias("bucket"))


_SQL_BUCKETED = "SELECT vec_id, label, embedding, {b} AS bucket FROM embeddings"


@register(
    "ann_lsh_bucket_sizes",
    oracle=f"""
    WITH b AS ({_SQL_BUCKETED.format(b=sql_bucket('embedding'))})
    SELECT bucket, count(*) AS n FROM b GROUP BY bucket
    """,
    doc="hyperplane-LSH bucket histogram (join-skew signal for the ANN path)",
)
def ann_lsh_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bucketed(spark, sf_dir).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH b AS ({_SQL_BUCKETED.format(b=sql_bucket('embedding'))}),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM b WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.q_id, c.vec_id AS neighbor_id,
               {sql_micros(sql_cosine("q.q_emb", "c.embedding"))} AS cosine_e6
        FROM q JOIN b c USING (bucket)
        WHERE c.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, cosine_e6, rk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine_e6 DESC, neighbor_id
        ) AS rk FROM scored
    ) WHERE rk <= {TOP_K}
    """,
    doc="ANN scale path: top-k cosine within the query's LSH bucket "
    "(equi-join on bucket key — linear, AQE-skew-safe)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bucketed(spark, sf_dir)
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    scored = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            micros(cosine(F.col("q_emb"), F.col("embedding"))).alias("cosine_e6"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine_e6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "cosine_e6", "rk")
    )


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH b AS ({_SQL_BUCKETED.format(b=sql_bucket('embedding'))})
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           {sql_micros(sql_cosine("x.embedding", "y.embedding"))} AS cosine_e6
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {sql_micros(sql_cosine("x.embedding", "y.embedding"))} >= {NEAR_DUP_E6}
    """,
    doc="embedding-cosine near-dup: LSH-bucket-blocked pairs ≥ 0.40 cosine "
    "(linear candidate generation, never O(n²))",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bucketed(spark, sf_dir)
    x = b.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"), "bucket")
    y = b.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"), "bucket")
    return (
        x.join(y, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            micros(cosine(F.col("e_a"), F.col("e_b"))).alias("cosine_e6"),
        )
        .filter(F.col("cosine_e6") >= NEAR_DUP_E6)
    )
