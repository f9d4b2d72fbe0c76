"""Unit tests for the co-purchase/HITS (queries/reco.py) and unigram-LM
(queries/lm.py) families — hand-computed expectations on tiny fixtures,
plus the basket-cap scale guard."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from algorithmproject_spark_spark.queries.lm import (
    corpus_xent_bands,
    doc_unigram_surprise_topk,
)
from algorithmproject_spark_spark.queries.reco import (
    basket_pairs,
    capped_baskets,
    copurchase_cosine_topk,
    orders_hits_authorities,
)


def _write(df, path):
    df.write.mode("overwrite").parquet(str(path))


# ------------------------------------------------------------------ reco


def test_capped_baskets_truncates_to_smallest_k(spark):
    li = spark.createDataFrame(
        [Row(l_orderkey=1, l_partkey=p) for p in range(12, 0, -1)]
        + [Row(l_orderkey=1, l_partkey=3)]  # dup partkey: collect_set dedups
    )
    out = capped_baskets(li, cap=8).collect()
    assert len(out) == 1
    assert out[0]["items"] == [1, 2, 3, 4, 5, 6, 7, 8]


def test_basket_pairs_orders_and_bounds(spark):
    b = spark.createDataFrame([Row(l_orderkey=1, items=[1, 2, 3])])
    pairs = {(r.pi, r.pj) for r in basket_pairs(b).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}
    # capped 8-item basket → exactly C(8,2) pairs, never more
    big = capped_baskets(
        spark.createDataFrame(
            [Row(l_orderkey=7, l_partkey=p) for p in range(20)]
        ),
        cap=8,
    )
    assert basket_pairs(big).count() == 28


def test_copurchase_cosine_hand_computed(spark, tmp_path):
    # baskets: o1={1,2,3}, o2={1,2}, o3={1,2} → only (1,2) has support
    # ≥2: c12=3, c1=c2=3 → cos²·1e6 = 9e6 // 9 = 1e6 (perfect cosine)
    _write(
        spark.createDataFrame(
            [
                Row(l_orderkey=o, l_partkey=p)
                for o, ps in [(1, [1, 2, 3]), (2, [1, 2]), (3, [1, 2])]
                for p in ps
            ]
        ),
        tmp_path / "lineitem.parquet",
    )
    rows = copurchase_cosine_topk(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(1, 2, 3, 3, 3, 1_000_000)]


def test_hits_authorities_hand_computed(spark, tmp_path):
    # bipartite: c1-{p1,p2}, c2-{p1}.  Two authority half-steps:
    #   a1 = norm(p1:2e6, p2:1e6)        = p1:1e6, p2:5e5
    #   h1 = norm(c1:1.5e6, c2:1e6)      = c1:1e6, c2:666666
    #   a2 = norm(p1:1666666, p2:1e6)    = p1:1e6, p2:600000
    _write(
        spark.createDataFrame(
            [Row(o_orderkey=1, o_custkey=1), Row(o_orderkey=2, o_custkey=1),
             Row(o_orderkey=3, o_custkey=2)]
        ),
        tmp_path / "orders.parquet",
    )
    _write(
        spark.createDataFrame(
            [Row(l_orderkey=1, l_partkey=1), Row(l_orderkey=2, l_partkey=2),
             Row(l_orderkey=3, l_partkey=1)]
        ),
        tmp_path / "lineitem.parquet",
    )
    rows = orders_hits_authorities(spark, str(tmp_path)).collect()
    assert [(r.part, r.auth_e6) for r in rows] == [(1, 1_000_000), (2, 600_000)]


def test_hits_max_normalized_invariant(spark):
    # on the real smoke fixture: scores are in (0, 1e6] and the max is
    # exactly 1e6 (the normalization contract)
    rows = orders_hits_authorities(spark, "/root/testdata/sf0.001").collect()
    scores = [r.auth_e6 for r in rows]
    assert max(scores) == 1_000_000
    assert all(0 < s <= 1_000_000 for s in scores)
    # descending, tie-broken by part
    assert scores == sorted(scores, reverse=True)


# -------------------------------------------------------------------- lm


def _lm_fixture(spark, tmp_path):
    _write(
        spark.createDataFrame(
            [
                Row(doc_id=1, text="a a", lang="en"),
                Row(doc_id=2, text="a b", lang="de"),
            ]
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_unigram_xent_hand_computed(spark, tmp_path):
    # corpus: a×3, b×1, N=4.
    #   doc1: 2·ln(4/3)/2       = ln(4/3)            → 287682 µnats
    #   doc2: (ln(4/3) + ln 4)/2 = (287682+1386294)//2 = 836988 µnats
    sf = _lm_fixture(spark, tmp_path)
    rows = doc_unigram_surprise_topk(spark, sf).collect()
    assert [(r.doc_id, r.lang, r.n_tok, r.xent_e6) for r in rows] == [
        (2, "de", 2, 836_988),
        (1, "en", 2, 287_682),
    ]
    # cross-check the µnat constants against math.log directly
    assert math.floor(math.log(4 / 3) * 1e6 + 0.5) == 287_682
    assert (287_682 + math.floor(math.log(4.0) * 1e6 + 0.5)) // 2 == 836_988


def test_xent_bands_partition_docs_exactly(spark, tmp_path):
    sf = _lm_fixture(spark, tmp_path)
    rows = {
        r.band_idx: (r.n_docs, r.tokens)
        for r in corpus_xent_bands(spark, sf).collect()
    }
    assert rows == {287_682 // 20_000: (1, 2), 836_988 // 20_000: (1, 2)}


def test_xent_uniform_corpus_is_flat(spark, tmp_path):
    # every token unique → every doc's xent = ln N exactly; one band
    _write(
        spark.createDataFrame(
            [
                Row(doc_id=i, text=f"t{2 * i} t{2 * i + 1}", lang="en")
                for i in range(4)
            ]
        ),
        tmp_path / "documents.parquet",
    )
    rows = doc_unigram_surprise_topk(spark, str(tmp_path)).collect()
    expect = math.floor(math.log(8.0) * 1e6 + 0.5)  # per-term µnats
    assert {r.xent_e6 for r in rows} == {expect}


def test_zipf_slope_on_power_law_corpus(spark, tmp_path):
    # tokens with geometric frequencies 64, 32, 16 at ranks 1, 2, 3:
    # ln-freq falls linearly in RANK (not ln-rank), so the ln-ln fit
    # is strong-but-imperfect. Pin the invariants any frequency-sorted
    # corpus must satisfy: negative slope, r² in (0, 1e6], and a tight
    # fit (>0.9) on monotone data.
    from algorithmproject_spark_spark.queries.lm import corpus_zipf_slope

    rows = [
        (did, " ".join([tok] * cnt), "en")
        for did, (tok, cnt) in enumerate(
            (("t1", 64), ("t2", 32), ("t3", 16)), start=1
        )
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    r = corpus_zipf_slope(spark, str(tmp_path)).collect()[0]
    assert r.n_vocab == 3
    assert r.slope_e6 < 0
    assert 0 < r.r2_e6 <= 1_000_000
    assert r.r2_e6 > 900_000
