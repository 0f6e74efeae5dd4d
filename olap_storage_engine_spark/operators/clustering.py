"""Z-order (Morton curve) multi-dimensional clustering.

The reference's zone-map pruning (short_key/zone stats over sorted
writes) is one-dimensional: sorting by (a, b) prunes filters on `a`
but scatters `b` across every file.  Z-ordering interleaves the bits
of both columns' bucket ranks so rows close in EITHER dimension land
in the same neighborhood of files — a 2-D box predicate then touches
only the row groups whose min/max stats intersect the box, in both
dimensions at once.  This is the standard lakehouse OPTIMIZE
ZORDER BY layout technique, implemented as a write-path transform:

  write:  zvalue = interleave(width_bucket(a), width_bucket(b))
          repartitionByRange(zvalue).sortWithinPartitions(zvalue)
  read:   ordinary filters; Parquet row-group stats do the pruning —
          no query-side change at all.

Scale notes (100 TB): bucket bounds come from one min/max aggregate
(or any known domain), broadcast as literals into a pure codegen
projection — no window functions, no global sort network beyond the
range partitioner Spark already uses for sorted writes.  The curve
order is data-independent after bucketing, so concurrent writers
cluster compatibly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Equal-width bucket rank in [0, 2^bits): a pure expression,
    exact at the boundaries (hi maps to the top bucket)."""
    n = 1 << bits
    span = (hi - lo).cast("double")
    raw = F.when(
        span > 0, ((col - lo).cast("double") / span * n).cast("long")
    ).otherwise(F.lit(0))
    return F.least(raw, F.lit(n - 1))


def zorder_value(ranks: list[Column], bits: int = 10) -> Column:
    """Morton-interleave the low ``bits`` of each rank: bit i of rank
    j lands at position i*len(ranks)+j.  Pure shift/or expressions —
    whole-stage codegen, no UDF."""
    d = len(ranks)
    parts = [
        F.shiftleft(
            F.shiftright(r, i).bitwiseAND(F.lit(1)), i * d + j
        )
        for i in range(bits)
        for j, r in enumerate(ranks)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over
    ``cols``.  One extra pass computes global min/max per column (the
    bucket domain); the write itself is range-partitioned by zvalue so
    each output file owns a contiguous curve segment — that is what
    makes the per-file min/max stats tight in every dimension."""
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    ranks = [
        _bucket(
            F.col(c),
            F.lit(bounds[f"__lo_{c}"]),
            F.lit(bounds[f"__hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    (
        df.withColumn("__z", zorder_value(ranks, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroups_matching_box(
    path: str, box: dict[str, tuple]
) -> tuple[int, int]:
    """Footer-stats-only pruning measurement: (matching, total) row
    groups whose min/max intersect the box — the same decision the
    Parquet reader makes, read via pyarrow without touching data
    pages.  Used by tests to prove the clustering actually tightens
    the stats; the engine itself just relies on the reader."""
    import pyarrow.parquet as pq
    import glob
    import os

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    total = matching = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for c, (lo, hi) in box.items():
                st = md.row_group(rg).column(names[c]).statistics
                if st is None or st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                matching += 1
    return matching, total
