"""Session-level tracked cache — the release hook for query-built
cached relations.

Query functions cache derived relations that feed multiple consumers
inside one returned plan (shingle tables, verified-pair relations,
posting lists). Spark's CacheManager keys entries on the canonicalized
plan, so repeated builds of the same query hit one entry — but nothing
ever RELEASES those entries in a long-lived session (bench loops,
notebooks): storage memory accumulates until the session dies.

:func:`tracked_cache` is a drop-in replacement for ``df.cache()`` that
records the relation; :func:`release_caches` unpersists everything
still bound to a live SparkContext and clears the ledger. Call it
whenever the consumers of the current batch of queries have
materialized — after a bench sweep, in test-session teardown, between
notebook experiments. Unpersisting is safe mid-session: a later query
that rebuilds the same plan simply re-caches it.

itemsets.py keeps its own (session, sf_dir) memo because it shares ONE
relation across distinct registered queries and must hand back the
SAME Python object; its ``clear_itemset_cache`` composes with this
hook (``release_caches`` does not touch it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (DataFrame, SparkContext) pairs awaiting release. Entries bound to
# stopped contexts are pruned on every append, so session cycles don't
# accumulate dead references.
_TRACKED: list = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + record the relation for :func:`release_caches`."""
    sc = df.sparkSession.sparkContext
    _TRACKED[:] = [(d, c) for d, c in _TRACKED if c._jsc is not None]
    df.cache()
    _TRACKED.append((df, sc))
    return df


def release_caches() -> None:
    """Unpersist every tracked relation still on a live context.

    Idempotent; duplicate ledger entries for the same plan unpersist
    the same CacheManager entry harmlessly."""
    for df, sc in _TRACKED:
        if sc._jsc is not None:
            df.unpersist()
    _TRACKED.clear()


def tracked_count() -> int:
    """Live tracked entries (for tests)."""
    return sum(1 for _, sc in _TRACKED if sc._jsc is not None)
