"""IVF-style ANN over embeddings — the second similarity-search scale
path, complementing hyperplane LSH (``operators/annlsh.py``).

Classic IVF (inverted-file) search: a coarse quantizer maps every
vector to its nearest of K cell centroids; a query probes only the
``NPROBE`` nearest cells and ranks candidates inside them. On a
cluster the cell id is just a join key — candidate generation is an
equi-join the same way the LSH path is, so it shuffles linearly and
AQE handles cell skew. Recall/latency trade via K and NPROBE.

Production IVF learns centroids with k-means (pyspark.ml KMeans slots
in here); for oracle-exact checking the coarse quantizer is FIXED:
seeded-PRNG centroid literals, identical decimal text in both engines.
Distances are sequential folds (bit-identical cross-engine, see
``functions/vectors.py``), and the argmin is computed over scaled-
BIGINT encodings ``dist_e6 * K + cell`` so ties and orderings are
exact integer math — no float comparison ambiguity anywhere.

Reference has no vector ops at all; north-star extension.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from algorithmproject_spark_spark.functions.numeric import micros, sql_micros
from algorithmproject_spark_spark.functions.vectors import (
    cosine,
    sql_cosine,
    to_double,
)
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

K_CELLS = 8
NPROBE = 2
DIM = 64
N_QUERIES = 5
TOP_K = 3

_rng = random.Random(13)
CENTROIDS: tuple[tuple[float, ...], ...] = tuple(
    tuple(round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM))
    for _ in range(K_CELLS)
)


def _l2sq(v: Column, centroid: tuple[float, ...]) -> Column:
    """Sequential-fold squared L2 distance to a fixed centroid."""
    cl = F.array(*[F.lit(x) for x in centroid])
    return F.aggregate(
        F.zip_with(v, cl, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _sql_l2sq(emb: str, centroid: tuple[float, ...]) -> str:
    lit = "[" + ", ".join(repr(x) for x in centroid) + "]"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {DIM} + 1), "
        f"i_ -> (CAST({emb}[i_] AS DOUBLE) - ({lit})[i_]) "
        f"* (CAST({emb}[i_] AS DOUBLE) - ({lit})[i_]))), "
        f"(a_, b_) -> a_ + b_)"
    )


def _enc_array(emb: Column) -> Column:
    """array of BIGINT encodings dist_e6 * K + cell, one per centroid.
    dist ≤ 4·DIM → dist_e6·K < 2^31·... stays far inside BIGINT.

    The widened vector is bound through a 1-element ``transform`` lambda
    so the 64-cast ``to_double`` runs once, not once per centroid fold
    (CollapseProject inlines projected/nested aliases per reference).
    """
    return F.element_at(
        F.transform(
            F.array(to_double(emb)),
            lambda v: F.array(
                *[
                    micros(_l2sq(v, c)) * F.lit(K_CELLS) + F.lit(i)
                    for i, c in enumerate(CENTROIDS)
                ]
            ),
        ),
        1,
    )


def _sql_enc_array(emb: str) -> str:
    parts = ", ".join(
        f"{sql_micros(_sql_l2sq(emb, c))} * {K_CELLS} + {i}"
        for i, c in enumerate(CENTROIDS)
    )
    return f"[{parts}]"


def cell_col(emb: Column) -> Column:
    """Nearest-centroid cell id (exact integer argmin)."""
    return (F.array_min(_enc_array(emb)) % K_CELLS).cast("int")


def sql_cell(emb: str) -> str:
    return f"CAST(list_min({_sql_enc_array(emb)}) % {K_CELLS} AS INT)"


def probe_cells_col(emb: Column) -> Column:
    """The NPROBE nearest cell ids for a query vector.

    The sorted encoding array is lambda-bound: each of the NPROBE
    ``element_at`` references would otherwise re-sort — and re-compute —
    the whole 8-fold encoding array.
    """
    return F.element_at(
        F.transform(
            F.array(F.array_sort(_enc_array(emb))),
            lambda s: F.array(
                *[
                    (F.element_at(s, i + 1) % K_CELLS).cast("int")
                    for i in range(NPROBE)
                ]
            ),
        ),
        1,
    )


def sql_probe_cells(emb: str) -> str:
    inner = f"list_sort({_sql_enc_array(emb)})"
    parts = ", ".join(
        f"CAST(({inner})[{i + 1}] % {K_CELLS} AS INT)" for i in range(NPROBE)
    )
    return f"[{parts}]"


def cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", "embedding", cell_col(F.col("embedding")).alias("cell")
    )


_SQL_CELLS = "SELECT vec_id, label, embedding, {c} AS cell FROM embeddings"


@register(
    "ann_ivf_cell_sizes",
    oracle=f"""
    WITH b AS ({_SQL_CELLS.format(c=sql_cell('embedding'))})
    SELECT cell, count(*) AS n FROM b GROUP BY cell
    """,
    doc="IVF coarse-quantizer cell histogram (skew signal for the ANN "
    "join; production swaps fixed centroids for pyspark.ml KMeans)",
)
def ann_ivf_cell_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cells(spark, sf_dir).groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH b AS ({_SQL_CELLS.format(c=sql_cell('embedding'))}),
    q AS (
        SELECT vec_id AS q_id, embedding AS q_emb,
               unnest({sql_probe_cells('embedding')}) AS cell
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.q_id, c.vec_id AS neighbor_id,
               {sql_micros(sql_cosine("q.q_emb", "c.embedding"))} AS cosine_e6
        FROM q JOIN b c USING (cell)
        WHERE c.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, cosine_e6, rk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine_e6 DESC, neighbor_id
        ) AS rk FROM scored
    ) WHERE rk <= {TOP_K}
    """,
    doc="IVF ANN: probe NPROBE nearest cells, rank candidates by exact "
    "cosine — equi-join on cell key, linear + AQE-skew-safe",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = cells(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(probe_cells_col(F.col("embedding"))).alias("cell"),
        )
    )
    scored = (
        b.join(F.broadcast(q), "cell")
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


# --------------------------------------------------------------------------
# Production slot: IVF with LEARNED centroids (pyspark.ml KMeans). The
# oracle-exact queries above pin fixed centroid literals so DuckDB can
# re-derive every value; real deployments learn the coarse quantizer
# from a corpus sample. Same join shape either way — cell id is still
# just an equi-join key. KMeans is seeded but float-iterative, so the
# query registers rows-only; recall invariants live in
# tests/test_annlsh.py-style shape tests (ann_ivf_recall measures the
# fixed-centroid path exactly).
# --------------------------------------------------------------------------
def kmeans_cells(
    emb: DataFrame, k: int = K_CELLS, seed: int = 42
) -> tuple[DataFrame, "object"]:
    """(vec_id, label, embedding, cell) with cells from seeded KMeans.

    Returns the assigned frame and the fitted model (whose
    clusterCenters feed the probe side).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn("features", array_to_vector(to_double(F.col("embedding"))))
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feat)
    assigned = model.transform(feat).select(
        "vec_id", "label", "embedding", F.col("prediction").cast("int").alias("cell")
    )
    return assigned, model


@register(
    "ann_ivf_kmeans_topk",
    oracle=None,  # seeded but float-iterative ML training — rows-only
    doc="IVF ANN with learned KMeans centroids (the production coarse "
    "quantizer): probe NPROBE nearest learned cells, rank by exact cosine",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, model = kmeans_cells(emb)
    centers = [tuple(float(x) for x in c) for c in model.clusterCenters()]

    def probe_cells(e: Column) -> Column:
        """NPROBE nearest learned cells by the same exact-integer argmin
        encoding as the fixed-centroid path."""
        def enc(v: Column) -> Column:
            return F.array_sort(
                F.array(
                    *[
                        micros(_l2sq(v, c)) * F.lit(len(centers)) + F.lit(i)
                        for i, c in enumerate(centers)
                    ]
                )
            )

        bound = F.element_at(F.transform(F.array(to_double(e)), enc), 1)
        return F.element_at(
            F.transform(
                F.array(bound),
                lambda s: F.array(
                    *[
                        (F.element_at(s, i + 1) % len(centers)).cast("int")
                        for i in range(NPROBE)
                    ]
                ),
            ),
            1,
        )

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(probe_cells(F.col("embedding"))).alias("cell"),
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
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
