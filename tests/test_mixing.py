"""Temperature-scaled source mixing weights (queries/mixing.py)."""

from __future__ import annotations

import math

from algorithmproject_spark_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _ppm(count: int, total: int) -> int:
    q, r = divmod(count * 1000, total)
    return q * 1000 + r * 1000 // total


def _ratio_e6(num: int, den: int) -> int:
    return num * 1_000_000 // den


def test_mixing_weights_match_python(spark):
    from pyspark.sql import functions as F

    from algorithmproject_spark_spark.sources.catalog import load_table

    docs = (
        load_table(spark, SF, "documents")
        .select("source", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    per_src: dict[str, list[int]] = {}
    for r in docs:
        per_src.setdefault(r["source"], []).append(r["n"])
    sqrt_e6 = {
        s: math.floor(math.sqrt(float(sum(v))) * 1_000_000.0 + 0.5)
        for s, v in per_src.items()
    }
    tot_tok = sum(sum(v) for v in per_src.values())
    tot_sq = sum(sqrt_e6.values())
    got = {
        r["source"]: r
        for r in REGISTRY["source_mixing_weights"].fn(spark, SF).collect()
    }
    assert set(got) == set(per_src)
    for s, v in per_src.items():
        r = got[s]
        assert r["n_docs"] == len(v)
        assert r["n_tokens"] == sum(v)
        nat = _ppm(sum(v), tot_tok)
        mix = _ppm(sqrt_e6[s], tot_sq)
        assert r["natural_ppm"] == nat
        assert r["mix_ppm"] == mix
        assert r["boost_e6"] == (_ratio_e6(mix, nat) if nat > 0 else None)


def test_temperature_flattens_toward_small_sources(spark):
    """The defining property of temperature sampling: the LARGEST
    source's mixture share must not exceed its natural share, and the
    smallest source's must not fall below it (sqrt compresses the
    range); shares each sum to ~1e6."""
    rows = REGISTRY["source_mixing_weights"].fn(spark, SF).collect()
    assert len(rows) > 1
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["mix_ppm"] <= big["natural_ppm"]
    assert small["mix_ppm"] >= small["natural_ppm"]
    assert big["boost_e6"] <= 1_000_000 <= small["boost_e6"]
    for col in ("natural_ppm", "mix_ppm"):
        total = sum(r[col] for r in rows)
        assert abs(total - 1_000_000) <= len(rows)  # floor slack
