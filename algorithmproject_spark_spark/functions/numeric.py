"""Deterministic numeric helpers for oracle-exact aggregation.

Floating-point sums in Spark are combined in partition order, which is
nondeterministic across runs and never matches a single-threaded oracle
bit-for-bit. The reference never cared (its jobs log counts, not sums);
we do, because every aggregate is hash-compared against DuckDB.

Contract: money-like columns in the testdata are fixed-2-decimal values
stored as doubles (verified: max |x*100 - round(x*100)| < 1e-9 across
all tables). We convert per-row to scaled integers with
``floor(x * scale + 0.5)`` — floor and one IEEE multiply/add are
bit-identical in any engine — then aggregate exact BIGINTs, so the
result is independent of partitioning AND matches DuckDB exactly at any
scale factor. Never use double→decimal casts for this: Spark casts via
the shortest decimal string (HALF_UP) while DuckDB rounds the true
binary value, so they disagree on e.g. 1.115.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def scaled_long(col: Column | str, scale: int = 100) -> Column:
    """Per-row fixed-point conversion: double → exact BIGINT at `scale`.

    floor(x*scale + 0.5) instead of round(): Spark's round() goes
    through BigDecimal.valueOf (shortest string repr, HALF_UP) and can
    disagree with a C implementation on boundary representations;
    floor(+0.5) is pure IEEE and engine-independent.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def sum_money(col: Column | str, scale: int = 100) -> Column:
    """Exact sum of a fixed-decimal double column, as scaled BIGINT."""
    return F.sum(scaled_long(col, scale))


def unscale(col: Column, scale: int = 100) -> Column:
    """Scaled BIGINT → double via ONE division (deterministic)."""
    return col / F.lit(float(scale))


def micros(col: Column) -> Column:
    """Deterministic 6-decimal fixed-point of an already-deterministic
    double expression (e.g. a sequential fold): BIGINT micro-units."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def sql_scaled_long(expr: str, scale: int = 100) -> str:
    """DuckDB-side twin of :func:`scaled_long` (same IEEE ops)."""
    return f"CAST(floor(({expr}) * {scale}.0 + 0.5) AS BIGINT)"


def sql_micros(expr: str) -> str:
    """DuckDB-side twin of :func:`micros`."""
    return f"CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"
