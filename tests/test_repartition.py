"""Layout evolution (r10): repartition_table rewrites a table into a
new partition/bucket layout; results are invariant, pruning serves the
new directories, and a mixed-layout cover (mid-reorg crash, time
travel) degrades to label-free — slower, never wrong."""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.compaction import (
    delete_where,
    merge_into,
    repartition_table,
)
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    PartitionPolicy,
    PartitionType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable

COARSE = PartitionPolicy(
    PartitionType.RANGE, "k", bounds=[("lo", "50"), ("hi", "99")]
)
FINE = PartitionPolicy(
    PartitionType.RANGE,
    "k",
    bounds=[("q1", "25"), ("q2", "50"), ("q3", "75"), ("q4", "99")],
)


def _make(spark, warehouse, name, buckets=2):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
        partition=COARSE,
        bucket=BucketSpec(BucketType.HASH, "k", buckets),
    )
    t = OlapTable.create(spark, spec, warehouse, overwrite=True)
    t.write(
        spark.createDataFrame(
            [(k, float(k)) for k in range(10, 90)], "k long, v double"
        )
    )
    return t


def test_repartition_results_invariant(spark, warehouse):
    t = _make(spark, warehouse, "rp1")
    before = {r["k"]: r["v"] for r in t.read().collect()}
    repartition_table(
        t, new_partition=FINE, new_bucket=BucketSpec(BucketType.HASH, "k", 4)
    )
    after = {r["k"]: r["v"] for r in t.read().collect()}
    assert after == before
    # reloaded table sees the new layout
    t2 = OlapTable.load(spark, warehouse, "rp1")
    assert len(t2.spec.partition.bounds) == 4
    assert t2.spec.bucket.num_buckets == 4
    assert {r["k"]: r["v"] for r in t2.read().collect()} == before


def test_repartition_pruned_reads_and_point_lookup(spark, warehouse):
    t = _make(spark, warehouse, "rp2")
    repartition_table(t, new_partition=FINE)
    got = {r["k"] for r in t.read_pruned("25", "50").collect()}
    assert got == set(range(25, 50))
    assert not t.has_mixed_layout()
    row = t.read_point(42).collect()
    assert len(row) == 1 and row[0]["v"] == 42.0
    # writes after the reorg land in the new layout and keep serving
    t.write(spark.createDataFrame([(90, 90.0)], "k long, v double"))
    assert t.read_point(90).collect()[0]["v"] == 90.0


def test_repartition_then_dml_and_compaction(spark, warehouse):
    from olap_storage_engine_spark.operators.compaction import compact

    t = _make(spark, warehouse, "rp3")
    repartition_table(t, new_partition=FINE)
    n = delete_where(t, F.col("k").between(30, 39))
    assert n == 10
    merge_into(t, spark.createDataFrame([(10, 999.0)], "k long, v double"))
    compact(t)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[10] == 999.0
    assert not any(30 <= k <= 39 for k in got)
    assert len(got) == 70  # 80 rows - 10 deleted; merge was an upsert


def test_mixed_layout_falls_back_never_loses_rows(spark, warehouse):
    """Simulate the mid-reorg crash window: spec swapped + logged but
    the rewrite never published.  Pruned reads and point lookups must
    degrade to label-free plans and still serve every row."""
    t = _make(spark, warehouse, "rp4")
    t.spec.partition = FINE
    t.spec.bucket = BucketSpec(BucketType.HASH, "k", 8)
    t._persist_schema_change(
        {"op": "repartition", "from": "crash", "to": "test"}
    )
    assert t.has_mixed_layout()
    got = {r["k"] for r in t.read_pruned("25", "50").collect()}
    assert got == set(range(25, 50))  # old 'lo' dir still fully served
    assert t.read_point(42).collect()[0]["v"] == 42.0
    # scoped DML takes the global path and stays correct
    assert delete_where(t, F.col("k") == 42) == 1
    assert t.read_point(42).collect() == []
    # completing the reorg clears the mixed state
    repartition_table(t, new_partition=FINE)
    assert not t.has_mixed_layout()
    assert {r["k"] for r in t.read_pruned("25", "50").collect()} == (
        set(range(25, 50)) - {42}
    )


def test_repartition_time_travel_pre_reorg_versions(spark, warehouse):
    """A snapshot at the reorg's full span resolves through the
    spanning rewrite (single layout, pruning stays on); a SUB-span
    snapshot resolves via the retired pre-reorg rowset — a mixed
    cover, so pruning falls back label-free but serves every row."""
    t = _make(spark, warehouse, "rp5")  # v1: keys 10..89
    v1 = t.manifest.max_version
    t.write(
        spark.createDataFrame([(95, 95.0)], "k long, v double")
    )  # v2
    repartition_table(t, new_partition=FINE)  # rewrite spans [0, 2]
    # full-span snapshot: the rewrite serves it — NOT mixed
    assert not t.has_mixed_layout()
    # sub-span snapshot [0, v1]: only the retired old-layout rowset
    # covers it — mixed, label-free, complete
    assert t.has_mixed_layout(0, v1)
    got = {r["k"] for r in t.read_pruned("25", "50", lo=0, hi=v1).collect()}
    assert got == set(range(25, 50))
