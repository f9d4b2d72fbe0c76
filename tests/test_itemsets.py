"""A-Priori pair mining / association rules (queries/itemsets.py) on a
corpus with hand-computable supports."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.itemsets import (
    association_rules,
    frequent_token_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_pair_supports_exact(spark):
    # x,y together in 3/4 docs; x,z in 3/4; y,z in 2/4
    docs = _docs(spark, ["x y z", "x y", "x y z", "x q z"])
    out = {(r.tok_a, r.tok_b): r.support
           for r in frequent_token_pairs(docs, minsup_permille=500).collect()}
    assert out == {("x", "y"): 3, ("x", "z"): 3, ("y", "z"): 2}


def test_singleton_prune_blocks_rare_token_pairs(spark):
    # "q" appears in 1/4 docs — below 50% — so no pair with q survives
    # even though (x,q) co-occurs in that doc
    docs = _docs(spark, ["x q", "x y", "x y", "x y"])
    out = frequent_token_pairs(docs, minsup_permille=500).collect()
    assert {(r.tok_a, r.tok_b) for r in out} == {("x", "y")}


def test_duplicate_tokens_in_doc_count_once(spark):
    docs = _docs(spark, ["x x y y", "x y"])
    out = {(r.tok_a, r.tok_b): r.support
           for r in frequent_token_pairs(docs, minsup_permille=500).collect()}
    assert out == {("x", "y"): 2}


def test_rule_confidence_is_directional(spark):
    # y always implies x (conf 1000‰); x implies y in only 3/4 (750‰)
    docs = _docs(spark, ["x y", "x y", "x y", "x"])
    rules = {(r.antecedent, r.consequent): r.confidence_permille
             for r in association_rules(
                 docs, minsup_permille=500, minconf_permille=800
             ).collect()}
    assert rules == {("y", "x"): 1000}
    both = {(r.antecedent, r.consequent): r.confidence_permille
            for r in association_rules(
                docs, minsup_permille=500, minconf_permille=700
            ).collect()}
    assert both == {("y", "x"): 1000, ("x", "y"): 750}


def test_lift_identifies_dependence_direction(spark):
    from algorithmproject_spark_spark.queries.itemsets import (
        _doc_tokens, _frequent_singletons, _n_docs,
    )
    from algorithmproject_spark_spark.queries.itemsets import (
        frequent_token_pairs,
    )
    from pyspark.sql import functions as F

    # x,y always together (lift > 1); x,z independent-ish
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "x y"), (2, "z q"), (3, "x y z")],
        ["doc_id", "text"],
    )
    pairs = frequent_token_pairs(docs, minsup_permille=500)
    n = _n_docs(docs)
    freq = _frequent_singletons(_doc_tokens(docs), n, 500)
    # the production floor-composed form: every intermediate bounded by
    # 1e6*n_docs (support <= df_a), so BIGINT never wraps at scale
    out = {
        (r.tok_a, r.tok_b): r.lift_e6
        for r in pairs.join(
            freq.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a")), "tok_a"
        ).join(
            freq.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b")), "tok_b"
        ).crossJoin(F.broadcast(n)).select(
            "tok_a", "tok_b",
            F.expr("(support * 1000000 div df_a) * n_docs div df_b").alias("lift_e6"),
        ).collect()
    }
    # x in 3 docs, y in 3 docs, xy support 3:
    # (3e6 div 3) * 4 div 3 = 1_333_333 — lift 4/3, same as exact here
    assert out[("x", "y")] == (3 * 1_000_000 // 3) * 4 // 3


def test_registered_lift_uses_one_shared_cached_relation(spark, tmp_path):
    """The registry wrappers must reuse ONE memoized cached doc-token
    relation per (session, sf_dir) — and clear_itemset_cache must
    release it."""
    from algorithmproject_spark_spark.queries.itemsets import (
        _DTOK_MEMO,
        _corpus_relations,
        clear_itemset_cache,
    )

    sf = "/root/testdata/sf0.001"
    clear_itemset_cache()
    _, d1 = _corpus_relations(spark, sf)
    _, d2 = _corpus_relations(spark, sf)
    assert d1 is d2
    assert len(_DTOK_MEMO) == 1
    assert d1.storageLevel.useMemory
    clear_itemset_cache()
    assert len(_DTOK_MEMO) == 0
    assert not d1.storageLevel.useMemory


def test_memo_prunes_stopped_context_entries(spark):
    """ADVICE r6: memo entries bound to a dead SparkContext are pruned
    on lookup, and clear_itemset_cache() skips (not crashes on) them."""
    from algorithmproject_spark_spark.queries import itemsets as it

    class _DeadSC:
        _jsc = None

    class _NoUnpersist:
        def unpersist(self):  # pragma: no cover - must NOT be called
            raise AssertionError("unpersist on a dead context")

    it._DTOK_MEMO[("dead-app", "/nowhere")] = (None, _NoUnpersist(), _DeadSC())
    it._prune_dead_entries()
    assert ("dead-app", "/nowhere") not in it._DTOK_MEMO

    it._DTOK_MEMO[("dead-app2", "/nowhere")] = (None, _NoUnpersist(), _DeadSC())
    it.clear_itemset_cache()  # must not raise
    assert not it._DTOK_MEMO
