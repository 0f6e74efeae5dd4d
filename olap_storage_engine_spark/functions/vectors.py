"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (zip_with / aggregate), computed in double
precision so results match the DuckDB oracle to the last ulp.

At 100 TB these expressions run inside whole-stage codegen; no Python,
no UDF.  (A Pandas-UDF variant exists in operators/similarity.py for
batch-heavy rescoring where BLAS beats codegen.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def pandas_dot(a: Column, b: Column) -> Column:
    """Arrow-batched dot product (numpy einsum) for PAIR-heavy stages:
    the higher-order ``dot`` fold is interpreted expression eval, so a
    join producing O(cell^2) pairs pays ~dim interpreted steps per
    pair — the einsum path batches the whole Arrow chunk into one BLAS
    call (measured 2.2 -> 1.3 s on the semantic-dedup pair stage at
    sf0.1).

    CAVEAT: numpy's summation order (pairwise/SIMD) differs from the
    sequential fold, so results can differ in the last ulp.  Consumers
    that CUT on the value (thresholds, top-k boundaries) must round
    first and cut on the rounded value — the same discipline as the
    PQ ADC fold — and their oracles must cut on the same rounded
    expression."""

    @F.pandas_udf("double")
    def _dot(xa: pd.Series, xb: pd.Series) -> pd.Series:
        if len(xa) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        A = np.stack([np.asarray(x, dtype=np.float64) for x in xa])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in xb])
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return _dot(a, b)
