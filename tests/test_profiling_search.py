"""Unit tests for BM25 retrieval, the constraint suite, and exact
percentile_cont on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row

from algorithmproject_spark_spark.queries.profiling import (
    events_percentile_cont,
    lineitem_constraint_suite,
)
from algorithmproject_spark_spark.queries.search import bm25_search_topk


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def _doc(doc_id, text):
    return Row(
        doc_id=doc_id, text=text, lang="en", source="s", n_chars=len(text)
    )


def _bm25_expected(docs):
    """Independent integer-arithmetic replica of the declared scoring
    (k1=6/5, b=3/4, Lucene idf, micro-unit double-floor)."""
    terms = ("hash", "join", "scan")
    toks = {d: t.split(" ") for d, t in docs.items()}
    n = len(docs)
    l = sum(len(t) for t in toks.values())
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    scores = {}
    for d, t in toks.items():
        dl, s = len(t), 0
        for q in terms:
            tf = t.count(q)
            if not tf or not df[q]:
                continue
            idf_e6 = math.floor(
                math.log(1.0 + ((n - df[q]) + 0.5) / (df[q] + 0.5)) * 1e6
                + 0.5
            )
            u_e6 = (22 * tf * l * 10**6) // (
                10 * l * tf + 3 * l + 9 * dl * n
            )
            s += (idf_e6 * u_e6) // 10**6
        if s:
            scores[d] = s
    return scores


def test_bm25_hand_fixture(spark, tmp_path):
    docs = {1: "hash hash join", 2: "hash alpha beta gamma", 3: "alpha beta"}
    sf = _write(
        spark, tmp_path, "documents", [_doc(d, t) for d, t in docs.items()]
    )
    got = {
        r.doc_id: r.bm25_e6 for r in bm25_search_topk(spark, sf).collect()
    }
    assert got == _bm25_expected(docs)
    # rare term ('join', df=1) must outrank the common term's doc
    assert got[1] > got[2] and 3 not in got


def _li(ok, ln, pk=1, sk=1, qty=10.0, price=100.0, ship=dt.datetime(2024, 1, 1)):
    return Row(
        l_orderkey=ok,
        l_partkey=pk,
        l_suppkey=sk,
        l_linenumber=ln,
        l_quantity=qty,
        l_extendedprice=price,
        l_discount=0.0,
        l_tax=0.0,
        l_returnflag="N",
        l_linestatus="O",
        l_shipdate=ship,
    )


def test_constraint_suite_counts_each_violation_class(spark, tmp_path):
    _write(
        spark,
        tmp_path,
        "orders",
        [
            Row(
                o_orderkey=1,
                o_custkey=1,
                o_orderstatus="O",
                o_totalprice=1.0,
                o_orderdate=dt.datetime(2024, 1, 1),
                o_orderpriority="1-URGENT",
            )
        ],
    )
    sf = _write(
        spark,
        tmp_path,
        "lineitem",
        [
            _li(1, 1),                        # clean
            _li(1, 1),                        # duplicate (orderkey, line)
            _li(1, 2, pk=2, sk=1),            # pk 2 seen with sk 1 ...
            _li(1, 3, pk=2, sk=2),            # ... and sk 2 → FD violation
            _li(9, 1, qty=99.0, price=-5.0, ship=None),  # orphan + domain + sign + null
        ],
    )
    got = {
        r.check_name: (r.n_checked, r.n_violations)
        for r in lineitem_constraint_suite(spark, sf).collect()
    }
    assert got == {
        "unique_orderkey_linenumber": (4, 1),
        "complete_shipdate": (5, 1),
        "ref_orderkey_in_orders": (5, 1),
        "fd_partkey_determines_suppkey": (2, 1),
        "domain_quantity_1_50": (5, 1),
        "nonnegative_extendedprice": (5, 1),
    }


def test_percentile_cont_interpolates_exactly(spark, tmp_path):
    # cents 100..500: p25 → rank 1 exactly (20000); p90 → 0.6 of the
    # way from 400 to 500 (46000); p99 → 0.96 of the way (49600)
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1),
                user_id=1,
                event_type="view",
                value=float(i),
                props="{}",
            )
            for i in range(1, 6)
        ],
    )
    r = events_percentile_cont(spark, sf).collect()[0]
    assert (r.n, r.p25_e4, r.p50_e4, r.p75_e4, r.p90_e4, r.p99_e4) == (
        5,
        20_000,
        30_000,
        40_000,
        46_000,
        49_600,
    )


from algorithmproject_spark_spark.queries.profiling import (  # noqa: E402
    events_equidepth_bins,
)
from algorithmproject_spark_spark.queries.trend import (  # noqa: E402
    events_rolling_7d_active_users,
)


def _evt(eid, uid, day, value):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day),
        user_id=uid,
        event_type="view",
        value=float(value),
        props="{}",
    )


def test_equidepth_bins_uniform_twenty_values(spark, tmp_path):
    # cents 100..2000 uniform → 10 bins of exactly 2 values each
    sf = _write(
        spark,
        tmp_path,
        "events",
        [_evt(i, 1, 1, i) for i in range(1, 21)],
    )
    rows = sorted(
        (r.bin, r.lo_e2, r.hi_e2, r.n_rows)
        for r in events_equidepth_bins(spark, sf).collect()
    )
    assert rows == [
        (b, (2 * b - 1) * 100, 2 * b * 100, 2) for b in range(1, 11)
    ]


def test_rolling_7d_actives_dedups_within_window(spark, tmp_path):
    # u1 active Jan1 only; u2 active Jan5 AND Jan6 (counted once per
    # window); u3 active Jan8. Full windows end Jan7 and Jan8.
    sf = _write(
        spark,
        tmp_path,
        "events",
        [_evt(1, 1, 1, 1.0), _evt(2, 2, 5, 1.0), _evt(3, 2, 6, 1.0),
         _evt(4, 3, 8, 1.0)],
    )
    d = lambda day: (dt.date(2024, 1, day) - dt.date(1970, 1, 1)).days
    got = {
        r.day: r.active_users
        for r in events_rolling_7d_active_users(spark, sf).collect()
    }
    assert got == {d(7): 2, d(8): 2}
