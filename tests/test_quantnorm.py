"""Cross-source quantile normalization (queries/quantnorm.py)."""

from __future__ import annotations

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.quantnorm import BAND_PPM, N_PCT

SF = "/root/testdata/sf0.001"


def _ppm(count: int, total: int) -> int:
    q, r = divmod(count * 1000, total)
    return q * 1000 + r * 1000 // total


def test_quantile_norm_matches_python(spark):
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.queries.qualitymodel import (
        quality_logit_cols,
    )
    from algorithmproject_spark_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    sc = [
        (r["source"], r["score_ppm"])
        for r in docs.select(
            "source", quality_logit_cols(F.col("text"))[2]
        ).collect()
    ]
    # pooled band -> cut score (step function with reverse fill)
    pooled = sorted(s for _, s in sc)
    n_pool = len(pooled)
    band_min: dict[int, int] = {}
    cum = 0
    for v in sorted(set(pooled)):
        cum += pooled.count(v)
        b = (_ppm(cum, n_pool) + BAND_PPM - 1) // BAND_PPM
        band_min.setdefault(b, v)
    cuts: dict[int, int | None] = {}
    run = None
    for b in range(N_PCT, 0, -1):
        if b in band_min:
            run = band_min[b] if run is None else min(run, band_min[b])
        cuts[b] = run
    # per-source ranked table
    want = {}
    sources = {s for s, _ in sc}
    for src in sources:
        vals = sorted(v for s, v in sc if s == src)
        n = len(vals)
        cum = 0
        for v in sorted(set(vals)):
            c = vals.count(v)
            cum += c
            rank = _ppm(cum, n)
            band = (rank + BAND_PPM - 1) // BAND_PPM
            want[(src, v)] = (c, rank, band, cuts[band])
    out = REGISTRY["source_score_quantile_norm"].fn(spark, SF).collect()
    got = {
        (r["source"], r["score_ppm"]): (
            r["n_docs"],
            r["rank_ppm"],
            r["pct_band"],
            r["norm_score_ppm"],
        )
        for r in out
    }
    assert got == want
    # invariants: rank is right-closed (max rank = 1e6 per source), and
    # normalization is monotone within a source
    for src in sources:
        rows = sorted(
            (s, r) for (s0, s), (_, r, _, _) in want.items() if s0 == src
        )
        assert max(r for _, r in rows) == 1_000_000
        norms = [
            got[(src, s)][3] for s, _ in rows
        ]
        assert norms == sorted(norms)
