"""Expectation-report operator: planted-violation counts + the
one-scan-for-all-row-rules plan contract."""

from __future__ import annotations

import re

from pyspark.sql import Row, functions as F

from algorithmproject_spark_spark.operators.quality import (
    expectation_report,
    primary_key_report,
    referential_report,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            Row(k=1, status="O", total=10.0),
            Row(k=2, status="X", total=5.0),   # bad status
            Row(k=2, status="F", total=-1.0),  # dup pk + nonpositive total
            Row(k=None, status="P", total=2.0),  # null key
        ]
    )


def test_expectation_report_counts_planted_violations(spark):
    got = {
        r.rule: r.n_violations
        for r in expectation_report(
            _frame(spark),
            {
                "null_k": F.col("k").isNull(),
                "bad_status": ~F.col("status").isin("O", "F", "P"),
                "nonpositive_total": F.col("total") <= 0,
            },
        ).collect()
    }
    assert got == {"null_k": 1, "bad_status": 1, "nonpositive_total": 1}


def test_pk_and_fk_reports(spark):
    df = _frame(spark)
    assert primary_key_report(df, "k").collect()[0].n_violations == 1
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    fk = referential_report(df.filter(F.col("k").isNotNull()), "k", parent, "pk")
    assert fk.collect()[0].n_violations == 0
    fk2 = referential_report(
        df.filter(F.col("k").isNotNull()), "k", parent.filter(F.col("pk") == 1), "pk"
    )
    assert fk2.collect()[0].n_violations == 2


def test_row_rules_compile_to_single_scan(spark):
    """N row-level rules must cost ONE scan + one partial/final
    aggregate — a per-rule job loop is the 100 TB anti-pattern this
    operator exists to replace."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    rep = expectation_report(
        df, {"a": F.col("m") > 5, "b": F.col("id") < 0, "c": F.col("m") == 3}
    )
    p = rep._jdf.queryExecution().explainString(
        rep.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"^\(\d+\) Range", p, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) HashAggregate", p, re.M)) == 2  # partial+final


def test_winsorized_stats_exact_small_case(spark):
    # 20 values 1.00..20.00, one type: 5% tails clip exactly one value
    # per side at thresholds 2.00 / 19.00
    from algorithmproject_spark_spark.queries.events import (
        winsorized_value_stats,
    )

    rows = [(i, "t", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = winsorized_value_stats(df, pct=5).collect()[0]
    # middle = 2..19 inclusive -> sum e2 = 100*(2+..+19) = 18900;
    # + 1*200 (clipped 1.00->2.00) + 1*1900 (20.00->19.00)
    assert out.n == 20
    assert out.lo_thr_e2 == 200 and out.hi_thr_e2 == 1900
    assert out.winsorized_sum_e2 == 18900 + 200 + 1900
    assert out.wmean_e4 == (18900 + 200 + 1900) * 100 // 20


def test_winsorized_zero_clip_below_20_rows(spark):
    # n=10 at 5% -> kt=0: nothing clipped, wsum = plain sum
    from algorithmproject_spark_spark.queries.events import (
        winsorized_value_stats,
    )

    rows = [(i, "t", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = winsorized_value_stats(df, pct=5).collect()[0]
    assert out.winsorized_sum_e2 == 100 * sum(range(1, 11))
