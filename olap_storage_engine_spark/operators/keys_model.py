"""Keys-model collapse views (reference: src/common.rs:37-57).

The reference *declares* three table key models in metadata
(KeysType at src/common.rs:37-44, per-column AggregateType at
src/common.rs:55-57 wired through ColumnSchema at src/meta.rs:19) but
never executes the collapse; the semantics come from the Doris model it
mirrors.  Here the collapse is real, applied lazily at read time as a
DataFrame view (merge-on-read), and physically at compaction time
(merge-on-write) — both call the same function so semantics can't
drift.

Ordering spec (SURVEY §7.4 hard-parts 1-2):
- "latest" = greatest (version, sequence) pair, where ``version`` is
  the rowset version the row was published at and ``sequence`` is the
  row's write-time monotonically_increasing_id within that load.
- SQL null semantics: SUM/MIN/MAX ignore nulls; REPLACE takes the
  latest value *including* null.

Scale notes: UNIQUE collapse is one hash-partitioned window (single
shuffle on the key columns); AGGREGATE collapse is a hash aggregation
with map-side partial aggregation — both AQE-coalesced and
skew-splittable.  No Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..spec import AggregateType, KeysType, TableSpec

VERSION_COL = "__version"
SEQ_COL = "__seq"


def with_write_metadata(df: DataFrame, version: int) -> DataFrame:
    """Stamp the hidden ordering columns at write time.

    ``monotonically_increasing_id`` is captured when the rowset is
    written (not at read) so REPLACE/UNIQUE have a total order that is
    stable across re-reads (SURVEY §7.4 hard-part 1).
    """
    out = df
    if VERSION_COL not in df.columns:
        out = out.withColumn(VERSION_COL, F.lit(version).cast("long"))
    if SEQ_COL not in df.columns:
        out = out.withColumn(SEQ_COL, F.monotonically_increasing_id())
    return out


def collapse(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Apply the table's keys-model collapse and drop hidden columns.

    DUPLICATE: identity (reference: src/common.rs:42-43).
    UNIQUE: latest (version, seq) row per key tuple wins
        (reference: src/common.rs:40-41).
    AGGREGATE: group by keys; per value column apply its AggregateType —
        SUM/MIN/MAX as SQL aggregates, REPLACE (and NONE, which degrades
        to REPLACE) as max_by over the (version, seq) order
        (reference: src/common.rs:38-39,55-57).
    """
    hidden = [c for c in (VERSION_COL, SEQ_COL) if c in df.columns]
    out_cols = [c for c in df.columns if c not in (VERSION_COL, SEQ_COL)]

    if spec.keys_type == KeysType.DUPLICATE:
        return df.select(*out_cols)

    keys = spec.key_names()
    if not hidden:
        # No ordering metadata: treat row order as undefined but make the
        # collapse deterministic by ordering on the value columns.
        df = df.withColumn(VERSION_COL, F.lit(0).cast("long")).withColumn(
            SEQ_COL, F.monotonically_increasing_id()
        )

    order = F.struct(F.col(VERSION_COL), F.col(SEQ_COL))

    if spec.keys_type == KeysType.UNIQUE:
        w = Window.partitionBy(*keys).orderBy(
            F.col(VERSION_COL).desc(), F.col(SEQ_COL).desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*out_cols)
        )

    # AGGREGATE
    aggs = []
    for c in spec.value_columns():
        if c.name not in df.columns:
            continue
        at = AggregateType(c.aggregate_type)
        if at == AggregateType.SUM:
            aggs.append(F.sum(c.name).alias(c.name))
        elif at == AggregateType.MIN:
            aggs.append(F.min(c.name).alias(c.name))
        elif at == AggregateType.MAX:
            aggs.append(F.max(c.name).alias(c.name))
        else:  # REPLACE and NONE -> latest wins
            aggs.append(F.max_by(c.name, order).alias(c.name))
    collapsed = df.groupBy(*keys).agg(*aggs) if aggs else df.select(*keys).distinct()
    return collapsed.select(*[c for c in out_cols if c in collapsed.columns])
