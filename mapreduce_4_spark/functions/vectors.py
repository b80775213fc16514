"""Vector math over ArrayType(FloatType) embedding columns — pure column
expressions (F.zip_with / F.aggregate), no UDF, no driver-side loops.

Accumulation is in double, left-to-right — verified bit-identical to
DuckDB's ``list_dot_product`` / ``list_cosine_similarity`` over DOUBLE[],
which is what makes exact oracles possible for similarity queries.

At 100 TB these expressions run inside the JVM per row; for the top-k
search operators built on them see ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    """float[] -> double[]: do arithmetic in double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) — identical op order to DuckDB list_cosine_similarity."""
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twins for oracle SQL.
def sql_vec(expr: str) -> str:
    return f"CAST({expr} AS DOUBLE[])"


def sql_cosine(a: str, b: str) -> str:
    return f"list_cosine_similarity({sql_vec(a)}, {sql_vec(b)})"


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({sql_vec(a)}, {sql_vec(b)})"
