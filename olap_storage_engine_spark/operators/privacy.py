"""Privacy-preserving release operators.

Complements the row-local PII scrub (`operators/text.py::pii_scrub`)
with the RELEASE-side guarantee: k-anonymity.  A scrubbed corpus can
still leak through quasi-identifiers — combinations of innocuous
attributes (language x source x size bucket) that isolate an
individual document or author.  Before publishing per-group statistics
or sampled subsets, groups smaller than ``k`` must be suppressed (or
generalized into coarser buckets).

Both operators are single hash-aggregations with partial (map-side)
combine — the cheapest possible distributed shape; nothing here adds a
second shuffle or driver state, so the guarantee costs the same as the
groupBy the release pipeline already runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    agg_cols: dict | None = None,
) -> DataFrame:
    """Release per-group aggregates over ``quasi_cols`` with groups of
    size < ``k`` suppressed entirely (the classic k-anonymity cut:
    every row that IS released shares its quasi-identifier tuple with
    at least k-1 others).

    ``agg_cols`` maps output name -> aggregate Column; group size is
    always included as ``group_n``.  One shuffle: groupBy + HAVING.
    """
    aggs = [F.count(F.lit(1)).alias("group_n")]
    for name, col in (agg_cols or {}).items():
        aggs.append(col.alias(name))
    return (
        df.groupBy(*quasi_cols)
        .agg(*aggs)
        .filter(F.col("group_n") >= F.lit(k))
    )


def suppression_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """The audit artifact that accompanies a k-anonymized release: how
    many groups / rows were kept vs suppressed at this ``k``.  Lets a
    data owner pick ``k`` by looking at the utility cost instead of
    guessing.  Same single-shuffle shape (the group sizes are reused
    for both sides of the cut)."""
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    kept = F.col("n") >= F.lit(k)
    return sizes.agg(
        F.lit(int(k)).alias("k"),
        F.count(F.lit(1)).alias("groups_total"),
        F.sum(kept.cast("long")).alias("groups_kept"),
        F.sum(F.when(kept, F.col("n")).otherwise(F.lit(0))).alias(
            "rows_kept"
        ),
        F.sum(F.when(~kept, F.col("n")).otherwise(F.lit(0))).alias(
            "rows_suppressed"
        ),
    )
