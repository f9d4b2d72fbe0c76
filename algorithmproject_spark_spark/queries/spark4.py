"""Spark 4 frontier features on the SQL surface — VARIANT
semi-structured columns and SQL-macro UDFs (SURVEY §2.1 S10 / §2.10).

Both replace historic slow paths: VARIANT gives typed access into JSON
without per-query string re-parsing (the reference re-parses JSON
strings per job), and SQL UDFs are Catalyst-inlined macros — reusable
scalar logic with ZERO engine-boundary cost, where the reference's 40
Scala udf{} closures each black-box the optimizer (SURVEY §2.10).
plan-lint verifies neither introduces a Python eval node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="VARIANT semi-structured access: parse the JSON props column "
    "once into a variant, variant_get the typed field, aggregate per "
    "event type — the single-parse typed path that replaces repeated "
    "get_json_object string re-parsing at 100 TB",
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


@register(
    "sql_udf_net_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS net_rev_e4,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="SQL UDF (CREATE FUNCTION ... RETURN expr): the reusable "
    "scalar-logic surface that Catalyst INLINES into the plan — same "
    "codegen as writing the expression by hand, zero engine-boundary "
    "cost, where the reference's scala udf{} closures black-box the "
    "optimizer. plan-lint proves no Python/eval node appears",
)
def sql_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_rev_e4(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT "
        "RETURN CAST(floor(p * (1 - d) * 10000.0 + 0.5) AS BIGINT)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(net_rev_e4(l_extendedprice, l_discount)) AS BIGINT)
                   AS net_rev_e4,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "lateral_top2_orders_per_cust",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           CAST(floor(t.o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_e2
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
    doc="Spark 4 correlated LATERAL subquery with per-row ORDER BY / "
    "LIMIT — the SQL-standard form of per-entity top-k (the W2 window "
    "family's declarative sibling); Catalyst decorrelates it into the "
    "same ranked-window plan, proving the surface without a manual "
    "rewrite. Price exposed as exact scaled cents",
)
def lateral_top2_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               CAST(floor(t.o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_e2
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )
