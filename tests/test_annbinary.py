"""Binary sign-quantized embedding ANN (queries/annbinary.py)."""

from __future__ import annotations

from algorithmproject_spark_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _py_codes(rows):
    out = {}
    for r in rows:
        lo = hi = 0
        for d, v in enumerate(r["embedding"]):
            if v > 0:
                if d < 32:
                    lo |= 1 << d
                else:
                    hi |= 1 << (d - 32)
        out[r["vec_id"]] = (lo, hi)
    return out


def test_codes_match_python(spark):
    from algorithmproject_spark_spark.sources.catalog import load_table

    rows = load_table(spark, SF, "embeddings").collect()
    want = _py_codes(rows)
    got = {
        r["vec_id"]: (r["b_lo"], r["b_hi"])
        for r in REGISTRY["embedding_binary_codes"].fn(spark, SF).collect()
    }
    assert got == want


def test_hamming_topk_matches_python(spark):
    from algorithmproject_spark_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from algorithmproject_spark_spark.sources.catalog import load_table

    rows = load_table(spark, SF, "embeddings").collect()
    codes = _py_codes(rows)
    want = set()
    for q in range(N_QUERIES):
        qlo, qhi = codes[q]
        scored = sorted(
            (bin((qlo ^ lo)).count("1") + bin((qhi ^ hi)).count("1"), v)
            for v, (lo, hi) in codes.items()
            if v != q
        )
        for rk, (h, v) in enumerate(scored[:TOP_K], start=1):
            want.add((q, v, h, rk))
    got = {
        (r["q_id"], r["neighbor_id"], r["hamming"], r["rk"])
        for r in REGISTRY["ann_binary_hamming_topk"].fn(spark, SF).collect()
    }
    assert got == want


def test_recall_is_measured_not_assumed(spark):
    """Every query row reports hits out of k; binary Hamming is lossy,
    so the metric exists precisely to record how lossy — bounds only."""
    rows = REGISTRY["ann_binary_recall"].fn(spark, SF).collect()
    from algorithmproject_spark_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
    )

    assert len(rows) == N_QUERIES
    for r in rows:
        assert r["k"] == TOP_K
        assert 0 <= r["n_hits"] <= r["k"]
