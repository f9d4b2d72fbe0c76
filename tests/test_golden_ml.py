"""Golden pins for the rows-only ML quartet (tools/golden_pin.py).

These four queries are seeded-deterministic but oracle-less by
contract (no ANSI SQL re-derives a JVM float-iterative fit), so the
driver only rows-only-checks them. The committed sf0.01 golden hashes
close that gap: any value drift — a Spark upgrade changing reduction
order or sampling, an accidental seed change, a partitioning-dependent
codepath — flips the hash. After an INTENTIONAL change, regenerate
with ``python tools/golden_pin.py`` and let the git diff document it.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo/tools")

GOLDEN = Path(__file__).parent / "golden" / "ml_quartet.json"


@pytest.fixture(scope="module")
def golden():
    return json.loads(GOLDEN.read_text())


@pytest.mark.parametrize(
    "name",
    [
        "lda_doc_topics",
        "lda_topics_described",
        "word2vec_neighbors",
        "ann_ivf_ml_kmeans_topk",
        "corpus_pagerank_tol_topk",
    ],
)
def test_ml_output_matches_golden(spark, golden, name):
    from golden_pin import canonical_hash

    from algorithmproject_spark_spark.queries import REGISTRY

    want = golden["queries"][name]
    n, h = canonical_hash(
        REGISTRY[name].fn(spark, golden["sf_dir"]).collect()
    )
    assert n == want["n_rows"], f"{name}: row count drifted"
    assert h == want["sha256"], (
        f"{name}: value hash drifted from the committed golden "
        f"(Spark {golden['spark_version']} pinned). If intentional, "
        "regenerate with tools/golden_pin.py"
    )
