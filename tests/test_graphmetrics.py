"""Modularity (queries/graphmetrics.py) and conformal coverage
(queries/modeleval.py round-9b companion) — python cross-checks."""

from __future__ import annotations

from algorithmproject_spark_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"
E6 = 1_000_000


def _ppm(count: int, total: int) -> int:
    q, r = divmod(count * 1000, total)
    return q * 1000 + r * 1000 // total


def test_modularity_matches_python(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["jaccard_verified_pairs"].fn(spark, SF).collect()
    ]
    comm = {
        r["doc_id"]: r["community"]
        for r in REGISTRY["dedup_label_prop_communities"]
        .fn(spark, SF)
        .collect()
    }
    assert pairs and comm
    m = len(pairs)
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want: dict[int, list[int]] = {}  # community -> [n_nodes, e_intra, d_sum]
    for v, d in deg.items():
        st = want.setdefault(comm[v], [0, 0, 0])
        st[0] += 1
        st[2] += d
    for a, b in pairs:
        if comm[a] == comm[b]:
            want[comm[a]][1] += 1
    out = REGISTRY["dedup_community_modularity"].fn(spark, SF).collect()
    assert len(out) == len(want)
    q_total = 0
    for r in out:
        n_nodes, e_intra, d_sum = want[r["community"]]
        assert (r["n_nodes"], r["e_intra"], r["d_sum"]) == (
            n_nodes,
            e_intra,
            d_sum,
        )
        intra = _ppm(e_intra, m)
        rate = _ppm(d_sum, 2 * m)
        expected = rate * rate // E6
        assert (r["intra_ppm"], r["expected_ppm"], r["q_ppm"]) == (
            intra,
            expected,
            intra - expected,
        )
        q_total += r["q_ppm"]
    # bookkeeping identities: intra edges and degree mass partition
    assert sum(st[1] for st in want.values()) <= m
    assert sum(st[2] for st in want.values()) == 2 * m
    assert -E6 <= q_total <= E6  # Newman Q is in [-1, 1]


def test_conformal_coverage_honors_order_statistic_guarantee(spark):
    thr = {
        r["lang"]: r
        for r in REGISTRY["quality_conformal_thresholds"]
        .fn(spark, SF)
        .collect()
    }
    cov = {
        r["lang"]: r
        for r in REGISTRY["quality_conformal_coverage"].fn(spark, SF).collect()
    }
    assert set(cov) == set(thr)
    for lang, t in thr.items():
        c = cov[lang]
        assert c["thr_score_ppm"] == t["thr_score_ppm"]
        assert c["n_kept"] == t["n_cal"]
        # at least k_order calibration docs sit at or above the
        # k-th-smallest-nonconformity threshold BY CONSTRUCTION
        assert c["n_kept_accepted"] >= t["k_order"]
        assert c["coverage_ppm"] == c["n_kept_accepted"] * E6 // c["n_kept"]
        assert 0 <= c["n_other_accepted"] <= c["n_other"]
