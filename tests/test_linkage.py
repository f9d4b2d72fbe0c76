"""Fellegi-Sunter record linkage (queries/linkage.py)."""

from __future__ import annotations

import math

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.linkage import (
    FS_JAC_HI_E6,
    FS_T_LINK,
    FS_T_NONLINK,
    FS_W,
)

SF = "/root/testdata/sf0.001"

#: the documented m/u probabilities behind the frozen milli-bit weights
FS_MU = {
    "lang_eq": (0.95, 0.33),
    "source_eq": (0.90, 0.25),
    "len_eq": (0.80, 0.10),
    "jac_hi": (0.70, 0.05),
}


def test_frozen_weights_are_the_documented_log_odds():
    for field, (m, u) in FS_MU.items():
        wa, wd = FS_W[field]
        assert abs(wa - math.log2(m / u) * 1000) <= 1, field
        assert abs(wd - math.log2((1 - m) / (1 - u)) * 1000) <= 1, field
        assert wa > 0 > wd, field  # agreement always raises the odds


def test_scores_and_decisions_consistent(spark):
    rows = REGISTRY["record_linkage_fs_scores"].fn(spark, SF).collect()
    assert rows, "no candidate pairs on the smoke fixture"
    for r in rows:
        want = sum(
            FS_W[f][0] if r[f] == 1 else FS_W[f][1]
            for f in ("lang_eq", "source_eq", "len_eq", "jac_hi")
        )
        assert r["score_milli"] == want
        assert r["jac_hi"] == (1 if r["jaccard_e6"] >= FS_JAC_HI_E6 else 0)
        if r["score_milli"] >= FS_T_LINK:
            assert r["decision"] == "link"
        elif r["score_milli"] < FS_T_NONLINK:
            assert r["decision"] == "non_link"
        else:
            assert r["decision"] == "possible"
        assert r["doc_a"] < r["doc_b"]  # canonical unordered pairs


def test_summary_matches_per_pair_output(spark):
    rows = REGISTRY["record_linkage_fs_scores"].fn(spark, SF).collect()
    want: dict[str, list] = {}
    for r in rows:
        st = want.setdefault(r["decision"], [0, None, None, 0])
        st[0] += 1
        st[1] = r["score_milli"] if st[1] is None else min(st[1], r["score_milli"])
        st[2] = r["score_milli"] if st[2] is None else max(st[2], r["score_milli"])
        st[3] += r["jaccard_e6"]
    got = {
        r["decision"]: (
            r["n_pairs"],
            r["min_score_milli"],
            r["max_score_milli"],
            r["mean_jaccard_e6"],
        )
        for r in REGISTRY["record_linkage_decision_summary"]
        .fn(spark, SF)
        .collect()
    }
    assert got == {
        d: (n, lo, hi, js // n) for d, (n, lo, hi, js) in want.items()
    }
