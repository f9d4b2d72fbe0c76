"""Sliding-window chunker contract (queries/chunking.py)."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.chunking import sliding_chunks


def _chunks(spark, text, width, stride):
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sliding_chunks(docs, width=width, stride=stride).collect()
    return sorted((r.chunk_idx, r.n_chunk_tokens) for r in rows)


def test_short_doc_is_one_chunk(spark):
    assert _chunks(spark, "a b c", width=8, stride=4) == [(0, 3)]


def test_exact_multiple_tiles_with_overlap(spark):
    # 8 tokens, W=4, S=2 → starts 0,2,4 (start 6's chunk {t6,t7} is
    # fully inside the chunk at 4 — subsumed tails are dropped)
    text = " ".join(f"t{i}" for i in range(8))
    assert _chunks(spark, text, width=4, stride=2) == [
        (0, 4), (1, 4), (2, 4),
    ]


def test_tail_clamps(spark):
    # 10 tokens, W=4, S=4 → starts 0,4,8 → sizes 4,4,2
    text = " ".join(f"t{i}" for i in range(10))
    assert _chunks(spark, text, width=4, stride=4) == [
        (0, 4), (1, 4), (2, 2),
    ]


def test_overlap_shares_content_hash_for_identical_windows(spark):
    # two docs with the same token stream chunk to identical hashes
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], ["doc_id", "text"]
    )
    rows = sliding_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_hash
    assert by_doc[1] == by_doc[2]


def test_no_chunk_is_subsumed_by_its_predecessor(spark):
    # every emitted chunk must cover at least one token its
    # predecessor does not
    for n in range(1, 40):
        text = " ".join(f"t{i}" for i in range(n))
        spans = sorted(
            (r.chunk_idx, r.n_chunk_tokens)
            for r in sliding_chunks(
                spark.createDataFrame([(1, text)], ["doc_id", "text"]),
                width=8,
                stride=3,
            ).collect()
        )
        prev_end = -1
        for idx, (ci, sz) in enumerate(spans):
            start = ci * 3
            end = start + sz
            assert end > prev_end, (n, spans)
            prev_end = end
        # full coverage: last chunk reaches the end of the doc
        assert prev_end == n, (n, spans)
