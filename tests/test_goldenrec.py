"""Golden-record merge (queries/goldenrec.py) with hand-built
clusters."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.goldenrec import golden_records


def test_survivor_is_longest_then_lowest_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "web", 100),
            (2, "en", "wiki", 400),
            (3, "fr", "web", 400),   # ties with 2 on chars → 2 wins
            (10, "de", "news", 50),
            (11, "de", "news", 60),
        ],
        ["doc_id", "lang", "source", "n_chars"],
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["v", "lbl"]
    )
    out = {r.cluster: r for r in golden_records(docs, labels).collect()}
    assert out[1].golden_doc == 2          # longest, id tiebreak
    assert out[1].n_members == 3
    assert out[1].total_chars == 900
    assert out[1].max_chars == 400
    assert out[1].langs == "en,fr"         # sorted distinct
    assert out[1].sources == "web,wiki"
    assert out[10].golden_doc == 11        # 60 > 50 chars
    assert out[10].n_members == 2
