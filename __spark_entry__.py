"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
twin for each SQL-expressible query. The real registry lives in
``algorithmproject_spark_spark/queries/`` — this module just re-exports it.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from algorithmproject_spark_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["doc_wordcount_topk"].fn(spark, "/root/testdata/sf0.001")


def _ordered_names() -> list[str]:
    """Registry names, queries still lacking a green driver row first.

    The correctness pass may cap how many queries it checks per round, so
    anything never yet confirmed green by a past ``CORRECTNESS_r*.json``
    (new queries, previously-unchecked ones, past hash mismatches) sorts
    to the front; already-green queries rotate to the back for re-checks.
    """
    green: set[str] = set()
    last_checked: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))), start=1
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            last_checked[name] = rnd
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and row.get("err") is None
            ):
                green.add(name)
    names = list(REGISTRY)
    fresh = [n for n in names if n not in green]
    # Green names re-check least-recently-checked first, so a capped
    # correctness pass rotates through the whole registry over rounds
    # instead of re-reading the same early names.
    stale = sorted(
        (n for n in names if n in green),
        key=lambda n: (last_checked.get(n, 0), n),
    )
    return fresh + stale


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
