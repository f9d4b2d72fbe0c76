"""Shape/validity invariants for the seeded-but-nondeterministic ML ops
(SURVEY.md §5 item 3): LDA topic distributions and Word2Vec synonyms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from algorithmproject_spark_spark.ml.topics import (
    _doc_tokens,
    fit_lda,
    lda_doc_topics,
    word2vec_neighbors,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tokens(spark):
    return _doc_tokens(spark, SF_DIR).cache()


def test_lda_topic_distribution_sums_to_one(spark, tokens):
    _cv, lda_model, vectors = fit_lda(tokens, k=3, max_iter=5)
    from pyspark.ml.functions import vector_to_array

    dist = lda_model.transform(vectors).select(
        F.aggregate(
            vector_to_array("topicDistribution"),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s")
    )
    rows = dist.collect()
    assert all(abs(r.s - 1.0) < 1e-6 for r in rows)


def test_lda_vocab_and_topics_shape(spark, tokens):
    cv_model, lda_model, _ = fit_lda(tokens, k=3, max_iter=5)
    assert 0 < len(cv_model.vocabulary) <= 2048
    topics = lda_model.describeTopics(5)
    assert topics.count() == 3


def test_lda_doc_topics_one_row_per_doc(spark):
    out = lda_doc_topics(spark, SF_DIR)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert out.count() == n_docs
    topics = [r.topic for r in out.select("topic").distinct().collect()]
    assert all(0 <= t < 5 for t in topics)


def test_word2vec_neighbors_shape(spark):
    out = word2vec_neighbors(spark, SF_DIR).collect()
    assert len(out) == 5
    assert all(-1.0 - 1e-9 <= r.similarity <= 1.0 + 1e-9 for r in out)


def test_lda_topics_described_shape(spark):
    from algorithmproject_spark_spark.ml.topics import lda_topics_described

    out = lda_topics_described(spark, SF_DIR).collect()
    assert len(out) == 5 * 10  # k topics x top-10 terms
    assert all(r.weight > 0 for r in out)
    assert all(1 <= r.rk <= 10 for r in out)
    # within a topic, describeTopics orders by weight descending
    by_topic = {}
    for r in out:
        by_topic.setdefault(r.topic, []).append((r.rk, r.weight))
    for rows in by_topic.values():
        ws = [w for _, w in sorted(rows)]
        assert ws == sorted(ws, reverse=True)


def test_lda_likelihood_and_perplexity_invariants(spark, tokens):
    import math

    _cv, lda_model, vectors = fit_lda(tokens, k=3, max_iter=5)
    ll = lda_model.logLikelihood(vectors)
    lp = lda_model.logPerplexity(vectors)
    assert math.isfinite(ll) and ll < 0  # log-prob of a corpus
    assert math.isfinite(lp) and lp > 0  # -ll per token
    # perplexity is the per-token normalization of the same bound
    from pyspark.ml.functions import vector_to_array

    n_tokens = vectors.select(
        F.sum(
            F.aggregate(vector_to_array("features"), F.lit(0.0), lambda a, x: a + x)
        )
    ).first()[0]
    assert abs(lp - (-ll / n_tokens)) < 1e-6


def test_kmeans_ivf_topk_shape(spark):
    """Production-slot IVF (learned centroids) — seeded, so shape and
    ordering invariants hold deterministically even though the exact
    centroid floats are float-iterative."""
    from algorithmproject_spark_spark.operators.annivf import (
        N_QUERIES,
        TOP_K,
        ann_ivf_ml_kmeans_topk,
    )

    out = ann_ivf_ml_kmeans_topk(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == N_QUERIES * TOP_K
    by_q = {}
    for r in rows:
        assert r.neighbor_id != r.q_id
        by_q.setdefault(r.q_id, []).append((r.rk, r.cosine_e6))
    for q, rs in by_q.items():
        ranks = sorted(rk for rk, _ in rs)
        assert ranks == list(range(1, TOP_K + 1))
        sims = [s for _, s in sorted(rs)]
        assert sims == sorted(sims, reverse=True)


def test_lloyd_kmeans_deterministic_and_bounded(spark):
    """The integer Lloyd fit must be exactly reproducible (it is pure
    integer arithmetic over a deterministic sample) and stay in the
    offset-e6 domain."""
    from algorithmproject_spark_spark.operators.annivf import (
        DIM,
        E6_OFFSET,
        K_CELLS,
        lloyd_kmeans,
    )
    from algorithmproject_spark_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = lloyd_kmeans(emb)
    b = lloyd_kmeans(emb)
    assert a == b
    assert len(a) == K_CELLS and all(len(c) == DIM for c in a)
    flat = [v for c in a for v in c]
    assert all(0 <= v <= 2 * E6_OFFSET for v in flat)
    # the fit moved at least some centroids off their seeded init
    from algorithmproject_spark_spark.operators.annivf import INIT_CENTS_E6

    assert tuple(map(tuple, a)) != INIT_CENTS_E6


def test_lda_seeded_rerun_is_deterministic(spark):
    """Same seed + same input ⇒ identical doc-topic rows across two
    independent fits (the rows-only driver check can't see values, so
    the determinism contract is asserted here)."""
    from algorithmproject_spark_spark.ml.topics import lda_doc_topics

    a = lda_doc_topics(spark, "/root/testdata/sf0.001").collect()
    b = lda_doc_topics(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_word2vec_seeded_rerun_is_deterministic(spark):
    from algorithmproject_spark_spark.ml.topics import word2vec_neighbors

    a = word2vec_neighbors(spark, "/root/testdata/sf0.001").collect()
    b = word2vec_neighbors(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_ml_kmeans_seeded_rerun_is_deterministic(spark):
    """kmeans_cells fits on a single-partition seeded sample, so two
    independent fits on the same data must produce bit-identical
    centers — the contract that makes exporting them as literals
    (ann_ivf_export_centroids_topk) a sound production pattern."""
    from algorithmproject_spark_spark.operators.annivf import kmeans_cells
    from algorithmproject_spark_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    _, m1 = kmeans_cells(emb)
    _, m2 = kmeans_cells(emb)
    c1 = [tuple(float(x) for x in c) for c in m1.clusterCenters()]
    c2 = [tuple(float(x) for x in c) for c in m2.clusterCenters()]
    assert c1 == c2


def test_ml_kmeans_tiny_input_guard(spark):
    """kmeans_cells must degrade, not abort, below k rows: pyspark.ml
    KMeans fails when the fit input has fewer rows than k (edge-sweep
    finding, EDGE_SWEEP_r07). Contract: 0/1-row corpora get one trivial
    cell and no model; 2..k-1 rows fit with a clamped k."""
    from algorithmproject_spark_spark.operators.annivf import (
        DIM,
        K_CELLS,
        kmeans_cells,
    )

    schema = "vec_id bigint, embedding array<float>, label int"
    rows = [(i, [float((i * 7 + d) % 5) for d in range(DIM)], i % 3) for i in range(3)]

    empty = spark.createDataFrame([], schema)
    assigned, model = kmeans_cells(empty)
    assert model is None and assigned.count() == 0

    one = spark.createDataFrame(rows[:1], schema)
    assigned, model = kmeans_cells(one)
    assert model is None
    assert [r.cell for r in assigned.collect()] == [0]

    three = spark.createDataFrame(rows, schema)
    assigned, model = kmeans_cells(three)
    assert model is not None
    k_eff = len(model.clusterCenters())
    assert 2 <= k_eff <= min(K_CELLS, 3)
    assert assigned.count() == 3
