"""Corpus-engineering diagnostics (queries/corpusstats.py) on inputs
with hand-computable answers."""

from __future__ import annotations

from algorithmproject_spark_spark.queries.corpusstats import (
    key_skew_report,
    seqlen_bucket_waste,
    vocab_coverage_curve,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_vocab_coverage_exact(spark):
    # counts: a=4, b=2, c=1, d=1 (ties break token-asc) → total 8
    docs = _docs(spark, ["a a b", "a b c", "a d"])
    out = {r.v: r.coverage_ppm for r in vocab_coverage_curve(docs).collect()}
    assert out[1] == 4 * 1_000_000 // 8
    assert out[2] == 6 * 1_000_000 // 8
    assert out[4] == 1_000_000  # full vocab covers everything
    assert set(out) == {1, 2, 4}  # rungs beyond vocab size absent


def test_key_skew_report_exact(spark):
    # key counts: 1→1, 2→1, 3→2, 4→6  (n=10, keys=4)
    rows = [(1,)] + [(2,)] + [(3,)] * 2 + [(4,)] * 6
    df = spark.createDataFrame(rows, ["k"])
    r = key_skew_report(df, "k").first()
    assert (r.n_rows, r.n_keys) == (10, 4)
    # count distribution over keys: [1, 1, 2, 6] → p50=1, p99=6
    assert (r.p50_c, r.p99_c, r.max_c) == (1, 6, 6)
    assert r.top1_share_ppm == 6 * 1_000_000 // 10


def test_seqlen_bucket_waste_exact(spark):
    # lens: 10→bucket16 (pad 6), 16→bucket16 (pad 0), 20→bucket32
    # (pad 12), 200→bucket128 truncated (pad 0, kept 128)
    docs = _docs(spark, [
        " ".join(["w"] * 10),
        " ".join(["w"] * 16),
        " ".join(["w"] * 20),
        " ".join(["w"] * 200),
    ])
    out = {r.bucket_len: (r.n_docs, r.pad_tokens, r.waste_ppm)
           for r in seqlen_bucket_waste(docs).collect()}
    assert out[16] == (2, 6, 6 * 1_000_000 // (6 + 26))
    assert out[32] == (1, 12, 12 * 1_000_000 // (12 + 20))
    assert out[128] == (1, 0, 0)


def test_rfm_quartile_cuts_and_bands_exact(spark):
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.queries.rfm import band, quartile_cuts

    df = spark.createDataFrame([(v,) for v in range(1, 101)], ["x"])
    cuts = quartile_cuts(df, "x").first()
    assert (cuts.p25, cuts.p50, cuts.p75) == (25, 50, 75)
    banded = df.crossJoin(
        F.broadcast(quartile_cuts(df, "x"))
    ).select(
        "x", band(F.col("x"), F.col("p25"), F.col("p50"), F.col("p75")).alias("b")
    )
    got = {r.x: r.b for r in banded.collect()}
    assert got[25] == 1 and got[26] == 2 and got[75] == 3 and got[76] == 4
    # ties land in one band: constant column → everyone band 1
    const = spark.createDataFrame([(7,)] * 10, ["x"])
    cb = const.crossJoin(F.broadcast(quartile_cuts(const, "x"))).select(
        band(F.col("x"), F.col("p25"), F.col("p50"), F.col("p75")).alias("b")
    )
    assert {r.b for r in cb.collect()} == {1}
