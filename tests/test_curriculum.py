"""Curriculum assignment (queries/curriculum.py) and near-dup flavor
agreement (queries/dedup.py round-9b tail) — python cross-checks."""

from __future__ import annotations

from algorithmproject_spark_spark.functions.numeric import (
    HASH_MULT,
    HASH_REDUCE,
)
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.curriculum import (
    KEY_MOD,
    N_BANDS,
    N_SHARDS,
)

SF = "/root/testdata/sf0.001"


def _hm(key: int, mod: int) -> int:
    return ((key % HASH_REDUCE) * HASH_MULT) % mod


def test_curriculum_matches_python(spark):
    from algorithmproject_spark_spark.sources.catalog import load_table

    docs = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    counts = sorted(docs.values())
    n = len(counts)
    # nearest-rank decile cuts over the compacted distribution: the
    # smallest v whose cumulative count reaches k/10 of the total
    cuts = []
    for k in range(1, N_BANDS):
        cum = 0
        for v in sorted(set(counts)):
            cum += counts.count(v)
            if cum * N_BANDS >= n * k:
                cuts.append(v)
                break
    out = {
        r["doc_id"]: r
        for r in REGISTRY["corpus_curriculum_assignment"]
        .fn(spark, SF)
        .collect()
    }
    assert set(out) == set(docs)
    for doc, n_tok in docs.items():
        band = 1 + sum(1 for c in cuts if n_tok > c)
        r = out[doc]
        assert (r["n_tokens"], r["band"], r["shard"]) == (
            n_tok,
            band,
            _hm(doc, N_SHARDS),
        )
        assert r["order_key"] == band * KEY_MOD + _hm(doc, KEY_MOD)
    # order-key invariant: sorting by key IS sorting by band first
    rows = sorted(out.values(), key=lambda r: r["order_key"])
    bands = [r["band"] for r in rows]
    assert bands == sorted(bands)
    assert len(set(bands)) > 1, "degenerate banding on the fixture"


def test_flavor_agreement_consistent_with_pair_queries(spark):
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["jaccard_verified_pairs"].fn(spark, SF).collect()
    }
    sh = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["simhash_hamming_pairs"].fn(spark, SF).collect()
    }
    r = REGISTRY["neardup_flavor_agreement"].fn(spark, SF).collect()[0]
    assert r["n_both"] == len(mh & sh)
    assert r["n_minhash_only"] == len(mh - sh)
    assert r["n_simhash_only"] == len(sh - mh)
    assert r["n_union"] == len(mh | sh)
    if r["n_union"]:
        assert (
            r["agreement_ppm"] == len(mh & sh) * 1_000_000 // len(mh | sh)
        )


def test_matryoshka_recall_matches_python(spark):
    """Truncated-dim recall@k recomputed in plain Python from the raw
    embeddings (both top-k sides independently re-derived)."""
    import math

    from algorithmproject_spark_spark.queries.annrecall import (
        MATRYOSHKA_DIMS,
    )
    from algorithmproject_spark_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from algorithmproject_spark_spark.sources.catalog import load_table

    embs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def topk(d):
        out = {}
        for q in [v for v in embs if v < N_QUERIES]:
            qe = embs[q][:d] if d else embs[q]
            scored = []
            for v, e in embs.items():
                if v == q:
                    continue
                ee = e[:d] if d else e
                dot = sum(a * b for a, b in zip(qe, ee))
                na = math.sqrt(sum(a * a for a in qe))
                nb = math.sqrt(sum(b * b for b in ee))
                c = math.floor(dot / (na * nb) * 1_000_000.0 + 0.5)
                scored.append((-c, v))
            scored.sort()
            out[q] = {v for _, v in scored[:TOP_K]}
        return out

    full, trunc = topk(None), topk(MATRYOSHKA_DIMS)
    got = {
        r["q_id"]: (r["n_hits"], r["k"])
        for r in REGISTRY["ann_matryoshka_recall"].fn(spark, SF).collect()
    }
    assert set(got) == set(full)
    for q in full:
        assert got[q] == (len(full[q] & trunc[q]), TOP_K)
