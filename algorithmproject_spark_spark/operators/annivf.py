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

import math
import random
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from algorithmproject_spark_spark.functions.numeric import (
    hash_mod,
    micros,
    sql_hash_mod,
    sql_micros,
)
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
# production sizing target: with n_cells = ceil(n / TARGET_CELL_SIZE)
# the within-cell join stays O(n · TARGET_CELL_SIZE) as the corpus grows
TARGET_CELL_SIZE = 256

# Centroids are drawn lazily from one seeded stream (same scheme as
# annlsh._nd_planes): centroid i is the i-th 64-float tuple of
# Random(13), whatever k a corpus needs — the first K_CELLS draws are
# the registered queries' pinned centroid set by construction, so the
# static DuckDB oracles stay valid while callers scale k freely.
_rng = random.Random(13)
_cent_pool: list[tuple[float, ...]] = []


def centroids_for(k: int) -> tuple[tuple[float, ...], ...]:
    while len(_cent_pool) < k:
        _cent_pool.append(
            tuple(round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM))
        )
    return tuple(_cent_pool[:k])


def cells_for(n_vectors: int, target_cell_size: int = TARGET_CELL_SIZE) -> int:
    """Cell count that keeps expected cell size ~constant as n grows.

    The mirror of ``annlsh.planes_per_band_for``: with
    k = ceil(n / target), per-cell membership stays O(target) and the
    within-cell candidate join O(n · target) — linear in the corpus —
    instead of the O(n²/k) blow-up a pinned k suffers. Production
    callers pass ``n_vectors`` from a catalog rowcount estimate (never
    a plan-building ``count()`` action); the registered sf-pinned
    queries keep their fixed K for oracle stability.
    """
    return max(1, math.ceil(max(1, n_vectors) / max(1, target_cell_size)))


CENTROIDS: tuple[tuple[float, ...], ...] = centroids_for(K_CELLS)


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


def _enc_array(emb: Column, k: int = K_CELLS) -> Column:
    """array of BIGINT encodings dist_e6 * k + cell, one per centroid.
    dist ≤ 4·DIM → dist_e6·k < 2^31·... stays far inside BIGINT.

    The widened vector is bound through a 1-element ``transform`` lambda
    so the 64-cast ``to_double`` runs once, not once per centroid fold
    (CollapseProject inlines projected/nested aliases per reference).
    """
    return F.element_at(
        F.transform(
            F.array(to_double(emb)),
            lambda v: F.array(
                *[
                    micros(_l2sq(v, c)) * F.lit(k) + F.lit(i)
                    for i, c in enumerate(centroids_for(k))
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


def cell_col(emb: Column, k: int = K_CELLS) -> Column:
    """Nearest-centroid cell id (exact integer argmin). Pass
    ``k=cells_for(n_vectors)`` to keep cell sizes bounded at scale."""
    return (F.array_min(_enc_array(emb, k)) % F.lit(k)).cast("int")


def sql_cell(emb: str) -> str:
    return f"CAST(list_min({_sql_enc_array(emb)}) % {K_CELLS} AS INT)"


def probe_cells_col(emb: Column, k: int = K_CELLS) -> Column:
    """The NPROBE nearest cell ids for a query vector.

    The sorted encoding array is lambda-bound: each of the NPROBE
    ``element_at`` references would otherwise re-sort — and re-compute —
    the whole k-fold encoding array.
    """
    return F.element_at(
        F.transform(
            F.array(F.array_sort(_enc_array(emb, k))),
            lambda s: F.array(
                *[
                    (F.element_at(s, i + 1) % F.lit(k)).cast("int")
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


def cells(
    spark: SparkSession, sf_dir: str, n_cells: int | None = None
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    k = n_cells or K_CELLS
    return emb.select(
        "vec_id", "label", "embedding", cell_col(F.col("embedding"), k).alias("cell")
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
def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, n_cells: int | None = None
) -> DataFrame:
    # n_cells=cells_for(catalog_rowcount) is the production path; the
    # registered query leaves it None → pinned K_CELLS for the oracle.
    k = n_cells or K_CELLS
    b = cells(spark, sf_dir, n_cells)
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(probe_cells_col(F.col("embedding"), k)).alias("cell"),
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
# LEARNED centroids, two flavors:
#
# 1. ``lloyd_kmeans`` — deterministic distributed Lloyd's in scaled-
#    integer arithmetic: embeddings become offset BIGINTs (e6 + 1e6, so
#    every value is nonnegative and truncating division is portable),
#    centroids broadcast as literals each round (ONE scan + a k-row
#    collect per iteration — the classic scalable-KMeans shape: map-side
#    partial sums, k groups, nothing driver-bound grows with the data).
#    Every op is exact integer math, so DuckDB re-derives the identical
#    centroids from unrolled MATERIALIZED CTEs and the learned-quantizer
#    query is FULLY oracle-checked — same treatment the fixed-point
#    PageRank got (plans/pipelines.py).
# 2. ``kmeans_cells`` — the pyspark.ml production slot (float-iterative,
#    rows-only driver row). Both fit on a deterministic hash-mod SAMPLE:
#    a coarse quantizer needs ~1e2–1e3 points per cell, not the corpus,
#    so at 100 TB the fit input is a tiny fixed-size draw while
#    assignment stays a full map-only pass.
# --------------------------------------------------------------------------
LLOYD_ITERS = 3  # unrolled in the oracle; production raises freely
FIT_MOD = 2  # fit on hash_mod(vec_id, 2) == 0 — a deterministic 50%
# draw at test scale; production sets fit_mod so the sample ≈ 256·k.
E6_OFFSET = 1_000_000  # embeddings ∈ (-1, 1) ⇒ offset-scaled ints ≥ 0

INIT_CENTS_E6: tuple[tuple[int, ...], ...] = tuple(
    tuple(math.floor(x * 1e6 + 0.5) + E6_OFFSET for x in c) for c in CENTROIDS
)


def _emb_e6(emb: Column) -> Column:
    """array<double> → offset-scaled array<bigint> (exact, portable)."""
    return F.transform(
        to_double(emb),
        lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        + F.lit(E6_OFFSET),
    )


def _sql_emb_e6(emb: str) -> str:
    return (
        f"list_transform({emb}, x_ -> "
        f"CAST(floor(CAST(x_ AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) + {E6_OFFSET})"
    )


def _enc_int(v: Column, cents: Sequence[Sequence[int]]) -> Column:
    """min over centroids of BIGINT encoding dist²·k + cell_id, where v
    is an already-bound array<bigint>. dist² ≤ 64·(2e6)² ≈ 2.6e14, ×k
    stays far inside BIGINT (ANSI-safe)."""
    k = len(cents)
    encs = []
    for i, c in enumerate(cents):
        cl = F.array(*[F.lit(int(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, cl, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        encs.append(d * F.lit(k) + F.lit(i))
    return F.array_min(F.array(*encs))


def _bound_enc(e6: Column, cents: Sequence[Sequence[int]]) -> Column:
    """Bind e6 through a 1-element lambda so the 64-element array is
    evaluated once, not once per centroid fold (CollapseProject)."""
    return F.element_at(
        F.transform(F.array(e6), lambda v: _enc_int(v, cents)), 1
    )


def lloyd_kmeans(
    emb: DataFrame,
    k: int = K_CELLS,
    iters: int = LLOYD_ITERS,
    fit_mod: int = FIT_MOD,
) -> list[tuple[int, ...]]:
    """Deterministic integer Lloyd's: returns k learned centroids as
    offset-e6 BIGINT tuples. One scan + one k-row collect per iteration
    (the bounded, documented collect pattern — k·dim ints, never data-
    sized). Empty cells keep their previous centroid."""
    fit = (
        emb.filter(hash_mod("vec_id", fit_mod) == 0)
        .select(_emb_e6(F.col("embedding")).alias("e6"))
        .cache()
    )
    cents = [tuple(c) for c in INIT_CENTS_E6[:k]]
    dim = len(cents[0])
    try:
        for _ in range(iters):
            cell = (_bound_enc(F.col("e6"), cents) % k).cast("int")
            partials = (
                fit.groupBy(cell.alias("cell"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.element_at("e6", d + 1)).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
            nxt = list(cents)
            for r in partials:
                # nonneg // nonneg: Python floor-div == DuckDB // here
                nxt[r["cell"]] = tuple(r[f"s{d}"] // r["n"] for d in range(dim))
            cents = nxt
    finally:
        fit.unpersist()
    return cents


def _sql_lloyd_cents(k: int, dim: int, iters: int, fit_mod: int) -> tuple[str, str]:
    """(CTE chain, final-centroid CTE name) re-deriving lloyd_kmeans in
    DuckDB: centroids live as (cell, i, v) rows; each round is a
    distance cross-product, an argmin, a per-dim mean, and an empty-cell
    fallback to the previous round — all MATERIALIZED (a CTE referenced
    twice per round would otherwise inline 2^k-fold, see memory note)."""
    init_vals = ", ".join(
        f"({c}, {i + 1}, {v})"
        for c, cent in enumerate(INIT_CENTS_E6[:k])
        for i, v in enumerate(cent)
    )
    parts = [
        f"fit AS MATERIALIZED (SELECT vec_id, {_sql_emb_e6('embedding')} AS e6 "
        f"FROM embeddings WHERE {sql_hash_mod('vec_id', fit_mod)} = 0)",
        f"c0(cell, i, v) AS MATERIALIZED (SELECT * FROM (VALUES {init_vals}))",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts += [
            f"d{it} AS MATERIALIZED (SELECT f.vec_id, c.cell, "
            f"CAST(sum((f.e6[c.i] - c.v) * (f.e6[c.i] - c.v)) AS BIGINT) AS dist "
            f"FROM fit f, {prev} c GROUP BY f.vec_id, c.cell)",
            f"a{it} AS MATERIALIZED (SELECT vec_id, "
            f"CAST(min(dist * {k} + cell) % {k} AS INT) AS cell "
            f"FROM d{it} GROUP BY vec_id)",
            f"m{it} AS MATERIALIZED (SELECT a.cell, t.i, "
            f"CAST(sum(f.e6[t.i]) AS BIGINT) // count(*) AS v "
            f"FROM a{it} a, fit f, range(1, {dim + 1}) t(i) "
            f"WHERE a.vec_id = f.vec_id GROUP BY a.cell, t.i)",
            f"c{it} AS MATERIALIZED (SELECT p.cell, p.i, COALESCE(m.v, p.v) AS v "
            f"FROM {prev} p LEFT JOIN m{it} m ON p.cell = m.cell AND p.i = m.i)",
        ]
        prev = f"c{it}"
    return ",\n    ".join(parts), prev


_LLOYD_CTES, _LLOYD_FINAL = _sql_lloyd_cents(K_CELLS, DIM, LLOYD_ITERS, FIT_MOD)

_LLOYD_TOPK_SQL = f"""
    WITH {_LLOYD_CTES},
    all6 AS MATERIALIZED (
        SELECT vec_id, {_sql_emb_e6('embedding')} AS e6 FROM embeddings
    ),
    dA AS MATERIALIZED (
        SELECT f.vec_id, c.cell,
               CAST(sum((f.e6[c.i] - c.v) * (f.e6[c.i] - c.v)) AS BIGINT) AS dist
        FROM all6 f, {_LLOYD_FINAL} c GROUP BY f.vec_id, c.cell
    ),
    b AS (
        SELECT e.vec_id, e.embedding, a.cell
        FROM embeddings e JOIN (
            SELECT vec_id, CAST(min(dist * {K_CELLS} + cell) % {K_CELLS} AS INT) AS cell
            FROM dA GROUP BY vec_id
        ) a USING (vec_id)
    ),
    qp AS (
        SELECT vec_id AS q_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist * {K_CELLS} + cell
            ) AS pr FROM dA WHERE vec_id < {N_QUERIES}
        ) WHERE pr <= {NPROBE}
    ),
    q AS (
        SELECT qp.q_id, e.embedding AS q_emb, qp.cell
        FROM qp JOIN embeddings e ON qp.q_id = e.vec_id
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
"""


@register(
    "ann_ivf_kmeans_topk",
    oracle=_LLOYD_TOPK_SQL,
    doc="IVF ANN with centroids LEARNED by deterministic integer Lloyd's "
    "k-means (sampled fit, broadcast-centroid rounds) — the whole "
    "training loop unrolls into the oracle, so the learned-quantizer "
    "path is value-exact, not rows-only",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = lloyd_kmeans(emb)
    k = len(cents)
    e6 = _emb_e6(F.col("embedding"))
    assigned = emb.select(
        "vec_id", "embedding", (_bound_enc(e6, cents) % k).cast("int").alias("cell")
    )
    sorted_enc = F.element_at(
        F.transform(
            F.array(e6),
            lambda v: F.array_sort(
                F.array(
                    *[
                        F.aggregate(
                            F.zip_with(
                                v,
                                F.array(*[F.lit(int(x)) for x in c]),
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, t: acc + t,
                        )
                        * F.lit(k)
                        + F.lit(i)
                        for i, c in enumerate(cents)
                    ]
                )
            ),
        ),
        1,
    )
    probe = F.element_at(
        F.transform(
            F.array(sorted_enc),
            lambda s: F.array(
                *[(F.element_at(s, i + 1) % k).cast("int") for i in range(NPROBE)]
            ),
        ),
        1,
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(probe).alias("cell"),
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


def kmeans_cells(
    emb: DataFrame, k: int = K_CELLS, seed: int = 42, fit_mod: int = FIT_MOD
) -> tuple[DataFrame, "object"]:
    """(vec_id, label, embedding, cell) with cells from seeded
    pyspark.ml KMeans — the float-iterative production slot.

    The fit input is a deterministic hash-mod sample (1/fit_mod of the
    corpus; pass 1 to fit on everything): the quantizer needs a few
    hundred points per cell, and sampling keeps the iterative fit off
    the full corpus while ``transform`` still assigns every row.
    Returns the assigned frame and the fitted model (whose
    clusterCenters feed the probe side).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn("features", array_to_vector(to_double(F.col("embedding"))))
    fit_input = feat.filter(hash_mod("vec_id", fit_mod) == 0) if fit_mod > 1 else feat
    model = KMeans(k=k, seed=seed, maxIter=20).fit(fit_input)
    assigned = model.transform(feat).select(
        "vec_id", "label", "embedding", F.col("prediction").cast("int").alias("cell")
    )
    return assigned, model


@register(
    "ann_ivf_ml_kmeans_topk",
    oracle=None,  # seeded but float-iterative ML training — rows-only
    doc="IVF ANN with pyspark.ml KMeans centroids (float-iterative "
    "production slot, deterministic sampled fit): probe NPROBE nearest "
    "learned cells, rank by exact cosine",
)
def ann_ivf_ml_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
