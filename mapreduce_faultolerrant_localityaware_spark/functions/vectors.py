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


def _sql_double(x: float) -> str:
    """SQL double literal that parses back to EXACTLY ``x``: python
    ``repr`` emits the shortest round-trip decimal and Spark's parser
    (Java ``Double.parseDouble``) is correctly rounded, so the
    round-trip is identity — verified for subnormals, ±0.0 and
    DBL_MAX.  The ``D`` suffix forces DoubleType (a bare decimal
    literal is DECIMAL in Spark SQL)."""
    return repr(float(x)) + "D"


def lit_double_array(values) -> Column:
    """Literal ``array<double>`` built with ONE py4j call via
    ``F.expr`` instead of len(values) ``F.lit`` round-trips.

    Round-11 optimization pass: every model-constant table inlined as
    literals (SRP hyperplanes, k-means codebooks, PQ sub-codebooks /
    norm tables, SQ8 grids) was paying ~2–4 ms of py4j per element at
    query CONSTRUCTION — a 64×16 plane matrix alone cost 3.9 s to
    build, dominating its query's wall time.  The expr string parses
    JVM-side in milliseconds and yields the identical literal tree."""
    return F.expr("array(" + ",".join(_sql_double(v) for v in values) + ")")


def lit_double_matrix(rows) -> Column:
    """Literal ``array<array<double>>`` (see :func:`lit_double_array`)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in r) + ")" for r in rows
        )
        + ")"
    )


def lit_double_cube(cubes) -> Column:
    """Literal ``array<array<array<double>>>`` — the PQ sub-codebook
    shape (m × n_codes × ds), one py4j call."""
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(_sql_double(v) for v in r) + ")" for r in m
            )
            + ")"
            for m in cubes
        )
        + ")"
    )


def lit_int_array(values) -> Column:
    """Literal ``array<int>`` with one py4j call."""
    return F.expr("array(" + ",".join(str(int(v)) for v in values) + ")")


def lit_long_array(values) -> Column:
    """Literal ``array<bigint>`` with one py4j call.  Values are cast
    from STRING (``CAST('-9223372036854775808' AS BIGINT)`` shape via
    array<string> cast) so LONG_MIN — whose bare literal would parse
    as unary-minus of an overflowing positive — round-trips exactly."""
    return F.expr(
        "cast(array(" + ",".join(f"'{int(v)}'" for v in values) + ") as array<bigint>)"
    )


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
