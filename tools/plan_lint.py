"""Registry-wide physical-plan linter — the 100 TB posture as one gate.

Per-query plan tests (tests/test_plans.py) pin the designed shapes of
individual operators; this linter sweeps EVERY registered query's
physical plan and fails on the classes of node that do not survive a
100× scale-up:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: O(n·m) joins. A
  tiny allowlist covers intentional bounded uses (a literal 1-row
  frame, a braodcast of a constant grid) — currently empty.
- ``BatchEvalPython`` / ``ArrowEvalPython`` / ``FlatMapGroupsInPandas``
  / ``MapInPandas`` / ``AggregateInPandas``  / ``MapInArrow`` outside
  the declared Arrow-kernel allowlist: Python in a hot path that was
  designed JVM-side is a regression, not a choice.
- ``Exchange rangepartitioning`` outside the allowlist: a global sort
  where one wasn't designed (top-k LIMIT queries keep theirs — Spark
  plans ORDER BY+LIMIT as TakeOrderedAndProject, which never global-
  sorts, so a surviving rangepartitioning means an unbounded sort).

Usage: python tools/plan_lint.py   (prints violations, exit 1 on any)
Import surface: ``lint_registry(spark)`` for the pytest gate.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmproject_spark_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# Queries whose Python nodes are the declared design (Arrow kernels).
ARROW_KERNELS = {
    "doc_pos_bigrams",          # mapInPandas POS tagger
    "rake_topk",                # pandas_udf RAKE kernel
    "textrank_topk",            # mapInPandas per-doc TextRank
    "media_meta_stats",         # mapInPandas binary decode
    "media_frame_sample",
    "media_resize_stats",
    "media_feature_extract",
    "window_global_rownum",     # two-phase index attach (mapInPandas)
    "stream_user_profile_batch_twin",  # applyInPandas profile fold
    "grouped_agg_weighted_median",     # GROUPED_AGG pandas UDF
    "pyds_synthetic_events_agg",       # Python Data Source scan
    "lda_doc_topics", "lda_topics_described", "word2vec_neighbors",
    "ann_ivf_ml_kmeans_topk",   # pyspark.ml fit paths
    "lda_corpus_uci",
    "curation_pipeline",        # includes the RAKE stage
    "label_combine_keywords",   # inherits the RAKE kernel via rake_topk
    "user_label_pipeline",      # same inheritance (label combine stage)
}

# Queries allowed a rangepartitioning exchange. Every plain ORDER BY in
# the registry is LIMIT-bounded (TakeOrderedAndProject, never a global
# sort); the two entries here are designed total orders:
GLOBAL_SORT_OK: set[str] = {
    "window_global_rownum",   # W1 global dense index — a total order IS
                              # the semantics; the range partitioner is
                              # the N-way-parallel way to get it
    "lda_topics_described",   # pyspark.ml describeTopics output, k=10
                              # topic rows — driver-sized by construction
    "seqlen_bucket_waste",    # final orderBy over ≤4 ladder-rung rows
                              # (the groupBy output is ladder-bounded)
}

# BroadcastNestedLoopJoin allowed ONLY where the build side is bounded
# by construction — a broadcast 1-row aggregate or a ≤k-row literal
# query set — so the "nested loop" is a map-side constant lookup:
NESTED_LOOP_OK: set[str] = {
    "tfidf_top_terms",        # crossJoin(broadcast(1-row n_docs agg)),
    "tfidf_hashed_top_terms", # text.py:303 — the r1-mandated pattern
    "user_tag_tfidf_norm",    # same: broadcast 1-row n_users agg
    "label_combine_keywords", # inherits tfidf_top_terms's 1-row cross
    "user_label_pipeline",    # that same cross + its own 1-row n_docs
    "ann_hard_negatives",     # same broadcast bounded-query shape
    "knn_bruteforce_cosine",  # 15-query literal set × corpus — the
                              # exact-baseline semantics; corpus side
                              # streams, build side is 15 rows
    "ann_pq_recall",          # recall@k queries join ANN results to the
    "ann_lsh_recall",         # same 15-query brute-force ground truth
    "ann_ivf_recall",
    "q11_important_stock",    # TPC-H scalar subqueries: crossJoin of a
    "q15_top_supplier",       # broadcast 1-row aggregate (total / max /
    "q22_global_sales_opportunity",  # positive-balance avg)
    "events_ordered_funnel",  # broadcast 1-row min(ts) window anchor
    "token_cooccurrence_pairs",  # broadcast 1-row n_docs agg (relative
    "token_assoc_rules",         # support cut — same TF-IDF pattern)
    "token_pair_lift",           # same 1-row n_docs broadcast scalar
    "zorder_pruning_stats",    # broadcast 1-row min/max envelope scalar
    "corpus_token_drift",      # broadcast 1-row (n_a, n_b) totals scalar
    "quality_dup_calibration", # broadcast 1-row quartile-cuts scalar
    "customer_rfm_segments",   # three broadcast 1-row cut scalars
    "bloom_prefilter_join_stats",  # broadcast 1-row Bloom bitmap + the
                                   # four 1-row count aggregates
}

PY_NODES = re.compile(
    r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
    r"|MapInPandas|AggregateInPandas|PythonMapInArrow|MapInArrow"
)


def lint_registry(spark, names=None) -> list[str]:
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    violations: list[str] = []
    for name in names or REGISTRY:
        try:
            df = REGISTRY[name].fn(spark, SF)
        except Exception as exc:  # plan construction itself failed
            violations.append(f"{name}: plan build error: {exc}")
            continue
        p = df._jdf.queryExecution().explainString(mode)
        if name not in NESTED_LOOP_OK and (
            "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
        ):
            violations.append(f"{name}: unbounded join (cartesian/nested-loop)")
        if name not in ARROW_KERNELS and PY_NODES.search(p):
            violations.append(f"{name}: undeclared Python eval node")
        if name not in GLOBAL_SORT_OK and "rangepartitioning" in p.lower():
            violations.append(f"{name}: global sort (rangepartitioning)")
    return violations


def main() -> int:
    from algorithmproject_spark_spark.session import get_spark

    spark = get_spark("plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    bad = lint_registry(spark)
    for v in bad:
        print("VIOLATION", v)
    print(f"{len(REGISTRY) - len(bad)}/{len(REGISTRY)} plans clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
