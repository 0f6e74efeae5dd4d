"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (zip_with / aggregate), computed in double
precision so results match the DuckDB oracle to the last ulp.

At 100 TB these expressions run inside whole-stage codegen; no Python,
no UDF.  (A Pandas-UDF variant exists in operators/similarity.py for
batch-heavy rescoring where BLAS beats codegen.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))
