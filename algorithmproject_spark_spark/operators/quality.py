"""Data-quality expectation reports — Deequ-style table validation.

A 100 TB ingest needs its constraint checks to run as ONE pass over the
fact table, not one job per rule: every row-level rule here compiles to
a conditional-count aggregate, so N rules cost a single scan with
map-side partial aggregation (the same shape as `count(*)`). Dataset-
level rules that genuinely need another plan (primary-key uniqueness:
two distinct-ish aggregates; referential integrity: one left-anti join
against the parent keys) each add exactly one more bounded job, and the
report is the union of one-row frames — a driver-sized result no matter
the input size.

The reference hand-rolls ad-hoc sanity filters inline per job
(e.g. ``mongodb/ArticleInfoProcess.scala`` null/length guards before
processing); this operator is the reusable, testable form.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: ``(rule, n_violations)``. ``rules`` maps rule
    name -> boolean Column that is TRUE when the row VIOLATES the rule.
    All rules evaluate in one aggregate over one scan.

    Rule names become column aliases and are interpolated into the
    ``stack()`` selectExpr, so they must be plain identifiers — a name
    with a quote/space/colon would break the expression at runtime."""
    bad = [n for n in rules if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n)]
    if bad:
        raise ValueError(
            f"rule names must match [A-Za-z_][A-Za-z0-9_]*, got: {bad}"
        )
    aggs = [
        F.count(F.when(cond, 1)).alias(name) for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
    )


def primary_key_report(df: DataFrame, key: str) -> DataFrame:
    """``(rule, n_violations)`` where violations = rows beyond the first
    per key (0 iff the column is unique)."""
    return df.agg(
        (F.count(key) - F.countDistinct(key)).alias("n_violations")
    ).select(F.lit(f"pk_unique:{key}").alias("rule"), "n_violations")


def referential_report(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """``(rule, n_violations)`` where violations = child rows whose key
    has no parent — a left-anti join, broadcast when the parent's key
    projection is small."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(f"fk:{child_key}").alias("rule"), "n_violations"
    )


@register(
    "orders_quality_report",
    oracle="""
    SELECT 'null_custkey' AS rule, count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations FROM orders
    UNION ALL
    SELECT 'bad_status', count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
    UNION ALL
    SELECT 'nonpositive_total', count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
    UNION ALL
    SELECT 'date_out_of_range', count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01') FROM orders
    UNION ALL
    SELECT 'pk_unique:o_orderkey', count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'fk:l_orderkey', count(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    doc="Deequ-style expectation report: 4 row-level rules in one "
    "single-scan aggregate, plus pk-uniqueness and referential "
    "integrity as one bounded job each",
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    row_rules = expectation_report(
        orders,
        {
            "null_custkey": F.col("o_custkey").isNull(),
            "bad_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "nonpositive_total": F.col("o_totalprice") <= 0,
            "date_out_of_range": F.col("o_orderdate")
            < F.lit("1990-01-01").cast("timestamp_ntz"),
        },
    )
    return row_rules.unionAll(
        primary_key_report(orders, "o_orderkey")
    ).unionAll(
        referential_report(lineitem, "l_orderkey", orders, "o_orderkey")
    )


def fixed_width_histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_buckets: int
) -> DataFrame:
    """``(bucket, n)`` fixed-width histogram of ``col`` over [lo, hi):
    bucket 0..n_buckets-1, plus -1/n_buckets for under/overflow. One
    scan, map-side partials — the profiling primitive that costs the
    same as count(*) no matter how many buckets."""
    width = (hi - lo) / n_buckets
    bucket = (
        F.when(F.col(col) < lo, F.lit(-1))
        .when(F.col(col) >= hi, F.lit(n_buckets))
        .otherwise(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)))
        .cast("bigint")
    )
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT CAST(CASE WHEN value < 0.0 THEN -1
                WHEN value >= 1000.0 THEN 20
                ELSE floor((value - 0.0) / 50.0) END AS BIGINT) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
    doc="fixed-width 20-bucket histogram of events.value over [0,1000) "
    "with under/overflow buckets — single-scan numeric profiling",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return fixed_width_histogram(ev, "value", 0.0, 1000.0, 20)
