"""Contrastive triple mining (queries/contrastive.py)."""

from __future__ import annotations

from algorithmproject_spark_spark.functions.numeric import (
    HASH_MULT,
    HASH_REDUCE,
)
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.contrastive import (
    NEG_BUCKETS,
    NEG_MIX,
)

SF = "/root/testdata/sf0.001"


def _hm(key: int, mod: int) -> int:
    return ((key % HASH_REDUCE) * HASH_MULT) % mod


def test_triples_match_python_reference(spark):
    chunks = {}
    for r in REGISTRY["doc_sliding_chunks"].fn(spark, SF).collect():
        chunks[(r["doc_id"], r["chunk_idx"])] = r["chunk_hash"]
    assert chunks
    # negative dictionary: arg-min doc_id chunk-0 per bucket
    dic: dict[int, tuple[int, int]] = {}
    for (doc, idx), h in chunks.items():
        if idx != 0:
            continue
        b = _hm(doc, NEG_BUCKETS)
        if b not in dic or doc < dic[b][0]:
            dic[b] = (doc, h)
    want = set()
    for (doc, idx), h in chunks.items():
        pos = chunks.get((doc, idx + 1))
        if pos is None:
            continue
        neg = dic.get(_hm(doc * NEG_MIX + idx, NEG_BUCKETS))
        if neg is None or neg[0] == doc:
            continue
        want.add((doc, idx, h, pos, neg[0], neg[1]))
    got = {
        (
            r["doc_id"],
            r["anchor_idx"],
            r["anchor_hash"],
            r["pos_hash"],
            r["neg_doc_id"],
            r["neg_hash"],
        )
        for r in REGISTRY["contrastive_pair_mining"].fn(spark, SF).collect()
    }
    assert got == want
    assert got, "fixture produced no triples"


def test_triples_are_well_formed(spark):
    rows = REGISTRY["contrastive_pair_mining"].fn(spark, SF).collect()
    for r in rows:
        assert r["neg_doc_id"] != r["doc_id"]  # never a self-negative
        assert r["anchor_idx"] >= 0
    # the mining covers multiple docs (sf0.001 docs are short — mostly
    # 2 chunks, one adjacent pair each; multi-anchor fan-out shows up
    # at larger SFs and is covered by the oracle check there)
    assert len({r["doc_id"] for r in rows}) >= 2
