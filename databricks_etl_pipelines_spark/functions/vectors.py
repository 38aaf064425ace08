"""Vector algebra over array<float|double> columns as pure expressions.

Embedding similarity primitives built from ``zip_with`` + ``aggregate`` —
JVM-side, codegen-compatible, no UDF serialization. Inputs are cast to
double element-wise first (float→double is exact) so arithmetic matches a
DuckDB oracle computing in double.

For hot paths over very wide vectors a vectorized Pandas-UDF variant can
beat the expression form (Arrow batch + numpy dot); see
``operators/similarity.py:pandas_cosine_topk`` for that alternative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double_array(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def vec_lit(values: Sequence[float]) -> Column:
    """A literal double vector (e.g. a query embedding)."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖) with explicit op order for oracle parity.

    NULL when either vector has zero norm: under ANSI mode the bare 0/0
    RAISES in Spark while DuckDB yields NULL — nullif aligns the engines,
    and NULL sorts last under desc so zero-norm rows can never win a
    top-k (unlike NaN, which Spark orders ABOVE every double)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# The DuckDB-side mirror of cosine() — same op order, for oracle SQL reuse.
def sql_cosine(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / nullif("
        f"sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))"
        f", 0)"
    )
