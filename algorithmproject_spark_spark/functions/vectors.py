"""Vector expressions over array<float|double> embedding columns.

Similarity search primitives (north-star extension; the reference has no
vector ops — its nearest analogue is mllib sparse vectors,
``nlp/PrepData.scala:60``). Dot products are computed as SEQUENTIAL
folds (``zip_with`` + ``aggregate``), not exploded group-sums: a fold
adds left-to-right, so the result is bit-identical across engines and
partitionings, which makes cosine similarity oracle-checkable without
tolerance hacks. EMB_DIM-wide vectors keep the fold cheap; for very
wide vectors swap in a pandas_udf without changing call sites.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: dimensionality of the ``embeddings.embedding`` fixture column —
#: single source of truth for every ANN/prototype module (the round-7
#: notes record a real 64-vs-16 confusion from per-module copies).
EMB_DIM = 64


def to_double(vec: Column) -> Column:
    """array<float> → array<double>; per-element widening is exact."""
    return F.transform(vec, lambda x: x.cast("double"))


def _dot_d(a: Column, b: Column) -> Column:
    """Dot product of two already-widened arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_d(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def dot(a: Column, b: Column) -> Column:
    return _dot_d(to_double(a), to_double(b))


def norm(a: Column) -> Column:
    return _norm_d(to_double(a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a||b|) with each vector widened ONCE via lambda binding —
    naive composition would inline to_double into the dot fold and both
    norm folds (CollapseProject duplicates aliases per reference); the
    arithmetic and fold order are identical, so values are unchanged."""
    return F.element_at(
        F.transform(
            F.array(to_double(a)),
            lambda va: F.element_at(
                F.transform(
                    F.array(to_double(b)),
                    lambda vb: _dot_d(va, vb) / (_norm_d(va) * _norm_d(vb)),
                ),
                1,
            ),
        ),
        1,
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two vectors, sequential fold over
    once-widened arrays (same binding discipline as :func:`cosine`)."""
    return F.element_at(
        F.transform(
            F.array(to_double(a)),
            lambda va: F.element_at(
                F.transform(
                    F.array(to_double(b)),
                    lambda vb: F.aggregate(
                        F.zip_with(va, vb, lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ),
                ),
                1,
            ),
        ),
        1,
    )


def sql_to_double(expr: str) -> str:
    return f"list_transform({expr}, x_ -> CAST(x_ AS DOUBLE))"


def sql_dot(a: str, b: str) -> str:
    # zip via index: DuckDB lists are 1-based like Spark's element_at.
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i_ -> CAST({a}[i_] AS DOUBLE) * CAST({b}[i_] AS DOUBLE))), "
        f"(acc_, v_) -> acc_ + v_)"
    )


def sql_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, x_ -> CAST(x_ AS DOUBLE) * CAST(x_ AS DOUBLE))), "
        f"(acc_, v_) -> acc_ + v_))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)}) / (({sql_norm(a)}) * ({sql_norm(b)}))"


def sql_l2sq(a: str, b: str) -> str:
    """DuckDB twin of :func:`l2sq` (same sequential fold order)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i_ -> (CAST({a}[i_] AS DOUBLE) - CAST({b}[i_] AS DOUBLE)) "
        f"* (CAST({a}[i_] AS DOUBLE) - CAST({b}[i_] AS DOUBLE)))), "
        f"(acc_, v_) -> acc_ + v_)"
    )
