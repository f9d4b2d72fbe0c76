"""CI slice of the determinism sweep (tools/determinism_sweep.py).

The full-registry sweep runs per round and is committed as
DETERMINISM_r{N}.json; this test keeps the property enforced between
sweeps for the query shapes MOST at risk of layout dependence:
collect_list rebuilds, global row indexing, LIMIT-with-tiebreak,
hash-mod sampling, and the salted skew path. Each runs twice — once on
the pristine sf0.001 tables at the session's shuffle-partition count,
once on a round-robin-repartitioned, row-permuted rewrite at 5
partitions — and must return the identical value multiset.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.sources.catalog import TABLES, load_table

SF = "/root/testdata/sf0.001"

# Order-sensitivity risk set: one representative per bug class.
SAMPLE = (
    "user_tag_tfidf_norm",       # collect_list rebuild
    "window_global_rownum",      # two-phase global index
    "doc_wordcount_topk",        # LIMIT + tiebreak ordering
    "deterministic_sample_10pct",  # hash-mod sampling
    "lang_doc_ids_salted",       # salted two-phase collect
    "ann_rrf_fusion",            # rank fusion over two ANN paths
)


@pytest.fixture(scope="module")
def perturbed(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("perturbed"))
    for t in TABLES:
        df = load_table(spark, SF, t)
        (
            df.repartition(5)
            .sortWithinPartitions(F.xxhash64(*df.columns))
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
    return out


def _multiset(df):
    return sorted(repr(sorted(r.asDict().items())) for r in df.collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_result_is_layout_independent(spark, perturbed, name):
    fn = REGISTRY[name].fn
    a = _multiset(fn(spark, SF))
    base = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = _multiset(fn(spark, perturbed))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b
