"""Deterministic hash expressions shared by the dedup/similarity
operators and their DuckDB oracles.

The family is md5-derived so both engines produce identical values:
``md5int(s)`` = first 15 hex chars of md5(s) as a bigint (60 bits,
always < 2^63 so no sign issues in either engine).

Spark:   conv(substr(md5(s), 1, 15), 16, 10)::bigint
DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5int(col: Column, salt: int | None = None) -> Column:
    """60-bit integer hash of a string column (optionally salted) —
    the seeded hash family h_i(s) = md5int(i || '#' || s) used for
    MinHash signatures and LSH hyperplanes."""
    if salt is not None:
        col = F.concat(F.lit(f"{salt}#"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Modulus for the rolling fingerprint: a Mersenne prime that keeps
# every intermediate (acc*31 + term) below 2^36 — safely inside BIGINT
# in DuckDB (which errors on overflow, unlike Java's wrapping longs).
FP_MOD = 2147483647


def rolling_fingerprint(tokens_col: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over the md5int of each token, mod 2^31-1.

    fp = fold(tokens, 0, (acc, t) -> (acc*31 + md5int(t) % FP_MOD) % FP_MOD)

    Used as a cheap content-identity key that (unlike sha2 of the raw
    text) survives whitespace normalization — the reference has no text
    surface at all; this is part of the LLM-pipeline extension.
    """
    return F.aggregate(
        tokens_col,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(31)
            + F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % F.lit(FP_MOD)
        )
        % F.lit(FP_MOD),
    )
