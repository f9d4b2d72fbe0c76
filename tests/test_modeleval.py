"""Model-eval & calibration suite (queries/modeleval.py) — every query
checked against an independently-coded plain-Python reference (Fraction
exactness + explicit trunc-division replication), not just the DuckDB
oracle, so the MATH is pinned separately from the cross-engine parity.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.modeleval import (
    GINI_TOPK,
    ISO_BAND_PPM,
    ISO_CLAMP,
    scored_labeled,
)
from algorithmproject_spark_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
E6 = 1_000_000


def tdiv(a: int, d: int) -> int:
    """Truncating integer division (Spark ``div`` / DuckDB ``//``)."""
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d >= 0) else -q


@pytest.fixture(scope="module")
def sl_rows(spark):
    rows = scored_labeled(load_table(spark, SF, "documents")).collect()
    assert rows, "empty scored_labeled relation"
    return [(r["doc_id"], r["lang"], r["score_ppm"], r["label"]) for r in rows]


def test_labels_are_nontrivial(sl_rows):
    labels = {lbl for _, _, _, lbl in sl_rows}
    assert labels == {0, 1}, (
        "fixture must exercise both classes for AUC/PR/gini to mean "
        f"anything; got {labels}"
    )


def test_auc_matches_python_pair_count(spark, sl_rows):
    pos = [s for _, _, s, l in sl_rows if l == 1]
    neg = [s for _, _, s, l in sl_rows if l == 0]
    num2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    want = int(
        (Fraction(num2, 2 * len(pos) * len(neg)) * E6 + Fraction(1, 2))
        .__floor__()
    )
    out = REGISTRY["quality_model_auc"].fn(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert r["n_scores"] == len({s for _, _, s, _ in sl_rows})
    assert r["auc_e6"] == want


def test_pr_points_match_python(spark, sl_rows):
    scores = sorted({s for _, _, s, _ in sl_rows}, reverse=True)
    p_total = sum(l for *_, l in sl_rows)
    want = {}
    tp = fp = 0
    for t in scores:
        tp += sum(1 for _, _, s, l in sl_rows if s == t and l == 1)
        fp += sum(1 for _, _, s, l in sl_rows if s == t and l == 0)
        want[t] = (tp, fp, tp * E6 // (tp + fp), tp * E6 // p_total)
    out = REGISTRY["quality_model_pr_points"].fn(spark, SF).collect()
    assert len(out) == len(scores)
    for r in out:
        assert (
            r["tp"],
            r["fp"],
            r["precision_e6"],
            r["recall_e6"],
        ) == want[r["thr_ppm"]], f"threshold {r['thr_ppm']}"


def test_conformal_thresholds_match_order_statistic(spark, sl_rows):
    by_lang: dict[str, list[int]] = {}
    for _, lang, s, l in sl_rows:
        if l == 1:
            by_lang.setdefault(lang, []).append(-s)
    out = {
        r["lang"]: r
        for r in REGISTRY["quality_conformal_thresholds"].fn(spark, SF).collect()
    }
    assert set(out) == set(by_lang)
    for lang, ncfs in by_lang.items():
        n = len(ncfs)
        k = min((9 * (n + 1) + 9) // 10, n)
        qhat = sorted(ncfs)[k - 1]
        r = out[lang]
        assert (r["n_cal"], r["k_order"], r["qhat_ncf_ppm"]) == (n, k, qhat)
        assert r["thr_score_ppm"] == -qhat


def _gini_ppm(x: int, y: int, n: int) -> int:
    px, py = x * E6 // n, y * E6 // n
    return E6 - px * px // E6 - py * py // E6


def test_gini_topk_matches_python(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    labels = {
        r["doc_id"]: r["keep"]
        for r in REGISTRY["doc_quality_score"].fn(spark, SF).collect()
    }
    n_all = len(docs)
    p_all = sum(labels.values())
    stats: dict[str, list[int]] = {}
    for did, text in docs.items():
        for tok in set(text.split(" ")):
            st = stats.setdefault(tok, [0, 0])
            st[0] += 1
            st[1] += labels[did]
    g_parent = _gini_ppm(p_all, n_all - p_all, n_all)
    want = []
    for tok, (n1, a) in stats.items():
        n0, b, c = n_all - n1, n1 - a, p_all - a
        d = n0 - c
        g1 = _gini_ppm(a, b, n1)
        g0 = _gini_ppm(c, d, n0) if n0 > 0 else 0
        gain = g_parent - (n1 * g1 + n0 * g0) // n_all
        want.append((tok, n1, a, gain))
    want.sort(key=lambda t: (-t[3], t[0]))
    want = want[:GINI_TOPK]
    out = [
        (r["token"], r["n_docs_with"], r["n_pos_with"], r["gini_gain_e6"])
        for r in REGISTRY["token_label_gini_topk"].fn(spark, SF).collect()
    ]
    assert out == want


def _pava(bands: list[tuple[int, int, int]]) -> dict[int, Fraction]:
    """Exact-rational pool-adjacent-violators over (band, n, pos) rows,
    ascending band — the sequential algorithm the minimax replaces."""
    blocks: list[list] = []  # [sum_pos, sum_n, [bands]]
    for band, n, pos in sorted(bands):
        blocks.append([pos, n, [band]])
        while len(blocks) > 1 and Fraction(
            blocks[-2][0], blocks[-2][1]
        ) > Fraction(blocks[-1][0], blocks[-1][1]):
            p2, n2, b2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2].extend(b2)
    out = {}
    for pos, n, bs in blocks:
        for b in bs:
            out[b] = Fraction(pos, n)
    return out


def test_isotonic_equals_trunc_rational_pava(spark, sl_rows):
    agg: dict[int, list[int]] = {}
    for _, _, s, l in sl_rows:
        band = max(min(tdiv(s, ISO_BAND_PPM), ISO_CLAMP), -ISO_CLAMP)
        st = agg.setdefault(band, [0, 0])
        st[0] += 1
        st[1] += l
    fit = _pava([(b, n, p) for b, (n, p) in agg.items()])
    out = REGISTRY["quality_isotonic_calibration"].fn(spark, SF).collect()
    assert len(out) == len(agg)
    got = sorted((r["band"], r["iso_rate_e6"]) for r in out)
    for band, iso in got:
        want = (fit[band] * E6).__floor__()  # rates >= 0: floor == trunc
        assert iso == want, f"band {band}: {iso} != trunc(PAVA)={want}"
    # the calibrated curve must be monotone non-decreasing in band
    rates = [iso for _, iso in got]
    assert rates == sorted(rates)
    for r in out:
        assert r["raw_rate_e6"] == r["n_pos"] * E6 // r["n_docs"]


def test_pr_auc_matches_python(spark, sl_rows):
    scores = sorted({s for _, _, s, _ in sl_rows}, reverse=True)
    p_total = sum(l for *_, l in sl_rows)
    tp = fp = prev_tp = 0
    num = 0
    for t in scores:
        tp += sum(1 for _, _, s, l in sl_rows if s == t and l == 1)
        fp += sum(1 for _, _, s, l in sl_rows if s == t and l == 0)
        num += (tp - prev_tp) * (tp * E6 // (tp + fp))
        prev_tp = tp
    out = REGISTRY["quality_model_pr_auc"].fn(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pos"] == p_total
    assert r["ap_e6"] == num // p_total
    # AP of a real (non-degenerate) ranking sits strictly inside (0, 1]
    assert 0 < r["ap_e6"] <= E6
