"""Golden-pin the rows-only ML quartet (r6 verdict item 8).

LDA x2, Word2Vec, and the ml-KMeans IVF query are seeded-deterministic
(tests/test_topics.py) but have no DuckDB oracle BY CONTRACT — no ANSI
SQL string re-derives a JVM float-iterative fit. The driver therefore
records only a rows-only check for them. This tool freezes their
sf0.01 output as committed golden hashes so CROSS-VERSION drift (a
Spark upgrade changing reduction order, BLAS codepath, sampling) is
detected even without an oracle: tests/test_golden_ml.py recomputes
the hash live and compares.

Run ``python tools/golden_pin.py`` after an INTENTIONAL change (Spark
version bump, seed change) to regenerate tests/golden/ml_quartet.json;
the git diff then documents the drift.

The hash canonicalizes rows (sorted, floats repr'd exactly) — any
value-level change flips it. Determinism across session parallelism is
part of the pinned contract: the test session runs local[4], this tool
local[32]; a hash that disagreed between them would itself be a
finding (partitioning-dependent output).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "lda_doc_topics",
    "lda_topics_described",
    "word2vec_neighbors",
    "ann_ivf_ml_kmeans_topk",
    # tolerance-stopped PageRank (VERDICT r10 #6): deterministic
    # integer arithmetic, but the data-dependent iteration count has
    # no SQL twin — pinned instead
    "corpus_pagerank_tol_topk",
)
SF_DIR = "/root/testdata/sf0.01"
DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "ml_quartet.json",
)


def canonical_hash(rows) -> tuple[int, str]:
    """(n_rows, sha256) over sorted exact-repr'd row tuples."""
    reprs = sorted(repr(tuple(r)) for r in rows)
    h = hashlib.sha256("\n".join(reprs).encode("utf-8")).hexdigest()
    return len(reprs), h


def main() -> int:
    from algorithmproject_spark_spark.queries import REGISTRY
    from algorithmproject_spark_spark.session import get_spark

    spark = get_spark("golden-pin")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF_DIR, "spark_version": spark.version, "queries": {}}
    for name in QUERIES:
        n, h = canonical_hash(REGISTRY[name].fn(spark, SF_DIR).collect())
        out["queries"][name] = {"n_rows": n, "sha256": h}
        print(f"{name}: {n} rows {h[:16]}...")
    os.makedirs(os.path.dirname(DEST), exist_ok=True)
    with open(DEST, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {DEST}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
