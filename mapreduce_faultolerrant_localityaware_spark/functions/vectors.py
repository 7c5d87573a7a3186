"""Vector column expressions over ``array<float>`` embedding columns.

Built-in higher-order functions (F.zip_with + F.aggregate) keep the
arithmetic JVM-side — no Python UDF in the hot path.  Everything is
cast to double first so results are bit-reproducible against a
double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product, index-order summation (deterministic)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL (not an ANSI DIVIDE_BY_ZERO) when either vector has zero
    norm — cosine is undefined there, and a degenerate row (an
    all-zeros embedding from a failed encoder) must not crash a
    corpus-scale scoring pass (degenerate-surface sweep, r9)."""
    return F.try_divide(dot(a, b), F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0)))
