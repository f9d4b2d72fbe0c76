"""Round-9b harness queries: A/B z-test, k-anonymity audit, session
metrics — each cross-checked against plain Python."""

from __future__ import annotations

import math

from algorithmproject_spark_spark.functions.numeric import (
    HASH_MULT,
    HASH_REDUCE,
)
from algorithmproject_spark_spark.queries import REGISTRY
from algorithmproject_spark_spark.queries.behavior import SESSION_GAP_US_B
from algorithmproject_spark_spark.queries.privacy import K_ANON, QI_LEN_BAND

SF = "/root/testdata/sf0.001"


def _hm(key: int, mod: int) -> int:
    return ((key % HASH_REDUCE) * HASH_MULT) % mod


def _ppm(count: int, total: int) -> int:
    q, r = divmod(count * 1000, total)
    return q * 1000 + r * 1000 // total


def test_ab_ztest_matches_python(spark):
    from algorithmproject_spark_spark.queries.product import ACTIVATION_US
    from algorithmproject_spark_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "events")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    )
    first_signup: dict[int, int] = {}
    for r in rows:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in first_signup or r["us"] < first_signup[u]:
                first_signup[u] = r["us"]
    first_purch: dict[int, int] = {}
    for r in rows:
        if r["event_type"] == "purchase" and r["user_id"] in first_signup:
            u = r["user_id"]
            if r["us"] >= first_signup[u] and (
                u not in first_purch or r["us"] < first_purch[u]
            ):
                first_purch[u] = r["us"]
    n = [0, 0]
    x = [0, 0]
    for u, s_us in first_signup.items():
        a = _hm(u, 2)
        n[a] += 1
        p = first_purch.get(u)
        if p is not None and p - s_us <= ACTIVATION_US:
            x[a] += 1
    assert 0 < x[0] + x[1] < n[0] + n[1], (
        "activation rate degenerate on the fixture — the z path would "
        "be dead code"
    )
    r = REGISTRY["events_ab_ztest"].fn(spark, SF).collect()[0]
    assert (r["n0"], r["x0"], r["n1"], r["x1"]) == (n[0], x[0], n[1], x[1])
    assert r["p0_ppm"] == _ppm(x[0], n[0])
    assert r["p1_ppm"] == _ppm(x[1], n[1])
    if 0 < x[0] + x[1] < n[0] + n[1]:
        pool = (x[0] + x[1]) / (n[0] + n[1])
        z = (x[0] / n[0] - x[1] / n[1]) / math.sqrt(
            pool * (1.0 - pool) * (1.0 / n[0] + 1.0 / n[1])
        )
        assert r["z_micros"] == math.floor(z * 1_000_000.0 + 0.5)
    else:
        # degenerate pooled rate (all or none converted): the z is
        # undefined and the query must say so, not divide by zero
        assert r["z_micros"] is None


def test_k_anonymity_matches_python(spark):
    from algorithmproject_spark_spark.sources.catalog import load_table

    docs = (
        load_table(spark, SF, "documents")
        .select("lang", "source", "n_chars")
        .collect()
    )
    cells: dict[tuple, int] = {}
    for d in docs:
        key = (d["lang"], d["source"], d["n_chars"] // QI_LEN_BAND)
        cells[key] = cells.get(key, 0) + 1
    n_all = len(docs)
    n_risky = sum(c for c in cells.values() if c < K_ANON)
    out = REGISTRY["privacy_k_anonymity_report"].fn(spark, SF).collect()
    assert len(out) == len(cells)
    for r in out:
        key = (r["lang"], r["source"], r["len_band"])
        assert r["n_docs"] == cells[key]
        assert r["below_k"] == (1 if cells[key] < K_ANON else 0)
        assert r["risk_mass_ppm"] == n_risky * 1_000_000 // n_all


def test_session_metrics_match_python(spark):
    from algorithmproject_spark_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "events")
        .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sessions: list[list[int]] = []
        prev = None
        for us, _eid in evs:
            if prev is None or us - prev > SESSION_GAP_US_B:
                sessions.append([])
            sessions[-1].append(us)
            prev = us
        n_ev = [len(s) for s in sessions]
        durs = [max(s) - min(s) for s in sessions]
        want[u] = (
            len(sessions),
            sum(n_ev),
            sum(1 for k in n_ev if k == 1),
            max(n_ev),
            max(durs),
            sum(n_ev) * 1_000_000 // len(sessions),
        )
    got = {
        r["user_id"]: (
            r["n_sessions"],
            r["n_events"],
            r["n_bounce"],
            r["max_session_events"],
            r["max_session_dur_us"],
            r["events_per_session_e6"],
        )
        for r in REGISTRY["events_session_metrics"].fn(spark, SF).collect()
    }
    assert got == want


def test_embedding_split_drift_matches_python(spark):
    from algorithmproject_spark_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    sums: dict[tuple, list] = {}
    for r in rows:
        half = r["vec_id"] % 2
        for d, v in enumerate(r["embedding"], start=1):
            st = sums.setdefault((r["label"], half, d), [0, 0])
            st[0] += 1
            st[1] += math.floor(float(v) * 1_000_000.0 + 0.5)

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    want = {}
    labels = {lbl for lbl, _, _ in sums}
    dims = {d for _, _, d in sums}
    for lbl in labels:
        if (lbl, 0, 1) not in sums or (lbl, 1, 1) not in sums:
            continue  # a half missing entirely -> inner join drops it
        d2 = 0
        for d in dims:
            na, sa = sums[(lbl, 0, d)]
            nb, sb = sums[(lbl, 1, d)]
            diff = tdiv(sa, na) - tdiv(sb, nb)
            d2 += diff * diff
        want[lbl] = (
            sums[(lbl, 0, 1)][0],
            sums[(lbl, 1, 1)][0],
            d2,
            math.floor(math.sqrt(float(d2)) + 0.5),
        )
    got = {
        r["label"]: (r["n_even"], r["n_odd"], r["dist2_e12"], r["dist_e6"])
        for r in REGISTRY["embedding_split_centroid_drift"]
        .fn(spark, SF)
        .collect()
    }
    assert got == want
    assert got, "fixture produced no drift rows"


def test_l_diversity_matches_python(spark):
    from algorithmproject_spark_spark.queries.privacy import L_DIV
    from algorithmproject_spark_spark.sources.catalog import load_table

    docs = (
        load_table(spark, SF, "documents")
        .select("lang", "source", "n_chars")
        .collect()
    )
    cells: dict[tuple, list] = {}
    for d in docs:
        key = (d["lang"], d["n_chars"] // QI_LEN_BAND)
        st = cells.setdefault(key, [0, set()])
        st[0] += 1
        st[1].add(d["source"])
    n_all = len(docs)
    n_risky = sum(n for n, srcs in cells.values() if len(srcs) < L_DIV)
    out = REGISTRY["privacy_l_diversity_report"].fn(spark, SF).collect()
    assert len(out) == len(cells)
    for r in out:
        n, srcs = cells[(r["lang"], r["len_band"])]
        assert (r["n_docs"], r["n_sensitive"]) == (n, len(srcs))
        assert r["below_l"] == (1 if len(srcs) < L_DIV else 0)
        assert r["risk_mass_ppm"] == n_risky * 1_000_000 // n_all


def test_token_burstiness_matches_python(spark):
    from algorithmproject_spark_spark.queries.corpusstats import (
        BURST_MIN_DF,
        BURST_TOPK,
    )
    from algorithmproject_spark_spark.sources.catalog import load_table

    docs = (
        load_table(spark, SF, "documents").select("doc_id", "text").collect()
    )
    tf: dict[str, int] = {}
    dfreq: dict[str, set] = {}
    for d in docs:
        for tok in d["text"].split(" "):
            tf[tok] = tf.get(tok, 0) + 1
            dfreq.setdefault(tok, set()).add(d["doc_id"])
    want = sorted(
        (
            (-(tf[t] * 1_000_000 // len(dfreq[t])), t, tf[t], len(dfreq[t]))
            for t in tf
            if len(dfreq[t]) >= BURST_MIN_DF
        )
    )[:BURST_TOPK]
    got = [
        (-r["burstiness_e6"], r["token"], r["tf"], r["df"])
        for r in REGISTRY["token_burstiness_topk"].fn(spark, SF).collect()
    ]
    assert got == want
    # burstiness >= 1e6 by construction (tf >= df)
    assert all(-b >= 1_000_000 for b, *_rest in got)
