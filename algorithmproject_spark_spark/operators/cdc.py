"""CDC apply — merge a change batch into a keyed snapshot.

The batch form of ``MERGE INTO`` (no table-format dependency): given a
snapshot keyed by ``key`` and a change set carrying an op column
(``I``/``U``/``D``), produce the next snapshot:

- key only in snapshot              -> keep the snapshot row
- key in changes with op I/U        -> take the change row (upsert)
- key in changes with op D          -> drop
- multiple changes per key          -> latest by ``seq_col`` wins

The plan is one change-compaction window (per-key top-1 by sequence —
state the size of the CHANGE BATCH, not the snapshot) followed by one
full outer equi-join on the key. Both shuffles are keyed on ``key``,
so at 100 TB this is two linear stages; with the snapshot stored
bucketed by ``key`` (sources/writers.py::write_bucketed_table) the
join side of the shuffle disappears entirely.

The reference re-ingests full Mongo snapshots per day
(``mongodb/ArticleInfoProcess.scala`` date-window re-reads); this
operator is the incremental path that replaces a full re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Next snapshot after applying ``changes`` (columns: key, op_col,
    seq_col, + the snapshot's value columns) to ``snapshot``."""
    value_cols = [c for c in snapshot.columns if c != key]
    latest = (
        changes.withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(key).orderBy(F.desc(seq_col), F.desc(op_col))
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
    snap = snapshot.alias("s")
    chg = latest.alias("c")
    joined = snap.join(chg, F.col(f"s.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    pick = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"c.{key}")).alias(key)
    ] + [
        F.when(F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return joined.filter(keep).select(*pick)


@register(
    "cdc_merge_apply",
    oracle="""
    WITH snap AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 <> 3
    ),
    raw_changes AS (
        SELECT o_custkey AS c_custkey,
               CASE WHEN o_custkey % 7 = 0 THEN 'D'
                    WHEN o_custkey % 10 = 3 THEN 'I' ELSE 'U' END AS op,
               o_totalprice AS c_acctbal,
               o_orderkey AS seq
        FROM orders
    ),
    latest AS (
        SELECT c_custkey, op, c_acctbal
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY c_custkey ORDER BY seq DESC, op DESC) AS rn
              FROM raw_changes)
        WHERE rn = 1
    )
    SELECT coalesce(s.c_custkey, c.c_custkey) AS c_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.c_acctbal
                ELSE s.c_acctbal END AS c_acctbal
    FROM snap s
    FULL OUTER JOIN latest c ON s.c_custkey = c.c_custkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    doc="MERGE INTO semantics without a table format: change compaction "
    "(latest per key) + one full-outer join on the key; insert/update/"
    "delete derived deterministically from orders against a customer "
    "snapshot",
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    snapshot = cust.filter(F.col("c_custkey") % 10 != 3).select(
        "c_custkey", "c_acctbal"
    )
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_custkey") % 7 == 0, "D")
        .when(F.col("o_custkey") % 10 == 3, "I")
        .otherwise("U")
        .alias("op"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderkey").alias("seq"),
    )
    return cdc_apply(snapshot, changes, "c_custkey")


ASOF_SEQ = 7500


@register(
    "cdc_snapshot_asof",
    oracle=f"""
    WITH snap AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 <> 3
    ),
    raw_changes AS (
        SELECT o_custkey AS c_custkey,
               CASE WHEN o_custkey % 7 = 0 THEN 'D'
                    WHEN o_custkey % 10 = 3 THEN 'I' ELSE 'U' END AS op,
               o_totalprice AS c_acctbal,
               o_orderkey AS seq
        FROM orders
        WHERE o_orderkey <= {ASOF_SEQ}
    ),
    latest AS (
        SELECT c_custkey, op, c_acctbal
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY c_custkey ORDER BY seq DESC, op DESC) AS rn
              FROM raw_changes)
        WHERE rn = 1
    )
    SELECT coalesce(s.c_custkey, c.c_custkey) AS c_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.c_acctbal
                ELSE s.c_acctbal END AS c_acctbal
    FROM snap s
    FULL OUTER JOIN latest c ON s.c_custkey = c.c_custkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    doc="Time travel over a CDC log: reconstruct the keyed snapshot AS "
    "OF sequence bound S by bounding the change log (pushed to the "
    "scan) before the same compaction + merge — the query shape a "
    "table format's VERSION AS OF compiles to, with cost proportional "
    "to the bounded log, not to history length",
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= ASOF_SEQ
    )
    snapshot = cust.filter(F.col("c_custkey") % 10 != 3).select(
        "c_custkey", "c_acctbal"
    )
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_custkey") % 7 == 0, "D")
        .when(F.col("o_custkey") % 10 == 3, "I")
        .otherwise("U")
        .alias("op"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderkey").alias("seq"),
    )
    return cdc_apply(snapshot, changes, "c_custkey")
