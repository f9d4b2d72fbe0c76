"""Unit semantics for exact duplicated-substring span detection
(queries/spandedup.py) on a hand-built corpus where the expected
spans are known by construction."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.spandedup import dup_span_stats

V = "v{} "  # unique filler token factory


def _doc(*parts: str) -> str:
    return " ".join(" ".join(p.split()) for p in parts)


def test_shared_run_is_one_merged_span(spark):
    # docs 1 and 2 share a verbatim 12-token run; with k=8 that run
    # yields 5 overlapping duplicated windows per doc which must merge
    # into ONE span covering exactly the 12 shared tokens.
    shared = " ".join(f"s{i}" for i in range(12))
    a = _doc(" ".join(f"a{i}" for i in range(10)), shared,
             " ".join(f"z{i}" for i in range(10)))
    b = _doc(" ".join(f"b{i}" for i in range(7)), shared,
             " ".join(f"y{i}" for i in range(9)))
    c = _doc(" ".join(f"c{i}" for i in range(30)))  # no duplication
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in dup_span_stats(docs, k=8).collect()}

    assert rows[1].n_dup_spans == 1 and rows[1].dup_tokens == 12
    assert rows[2].n_dup_spans == 1 and rows[2].dup_tokens == 12
    assert rows[3].n_dup_spans == 0 and rows[3].dup_tokens == 0
    assert rows[1].n_tokens == 32 and rows[1].dup_permille == 375


def test_two_disjoint_runs_stay_separate_spans(spark):
    r1 = " ".join(f"p{i}" for i in range(8))
    r2 = " ".join(f"q{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(10))
    a = _doc(r1, gap, r2)
    b = _doc(r2, " ".join(f"h{i}" for i in range(10)), r1)
    docs = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in dup_span_stats(docs, k=8).collect()}
    assert rows[1].n_dup_spans == 2 and rows[1].dup_tokens == 16
    assert rows[2].n_dup_spans == 2 and rows[2].dup_tokens == 16


def test_within_doc_repeat_counts_as_duplicated(spark):
    # the duplicated-window count is corpus-wide, so a run repeated
    # INSIDE one document is also flagged (paper semantics)
    run = " ".join(f"r{i}" for i in range(8))
    a = _doc(run, " ".join(f"m{i}" for i in range(9)), run)
    docs = spark.createDataFrame([(1, a)], ["doc_id", "text"])
    (row,) = dup_span_stats(docs, k=8).collect()
    assert row.n_dup_spans == 2 and row.dup_tokens == 16


def test_exact_duplicate_doc_fully_covered(spark):
    a = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame([(1, a), (2, a)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in dup_span_stats(docs, k=8).collect()}
    for r in rows.values():
        assert r.dup_tokens == r.n_tokens == 20
        assert r.dup_permille == 1000


def test_short_docs_below_k_yield_no_windows(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in dup_span_stats(docs, k=8).collect()}
    for r in rows.values():
        assert r.n_dup_spans == 0 and r.dup_tokens == 0
