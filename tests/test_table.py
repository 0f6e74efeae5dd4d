"""Write->read round-trip, snapshot reads, pruning plans, compaction."""

import os

import pytest
from pyspark.sql import Row, functions as F

from olap_storage_engine_spark.operators.compaction import (
    compact,
    compute_compaction_score,
    garbage_collect,
    schedule_compaction,
)
from olap_storage_engine_spark.plans.manifest import VersionGraphError
from olap_storage_engine_spark.spec import (
    AggregateType,
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


def _dup_spec(name="t"):
    return TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("d", ColumnType.VARCHAR),
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
            ColumnSpec.value("s", ColumnType.VARCHAR),
        ],
        keys_type=KeysType.DUPLICATE,
        partition=PartitionPolicy(
            PartitionType.RANGE, "d",
            bounds=[("p1", "2024-07-01"), ("p2", "2025-01-01")],
        ),
        bucket=BucketSpec(BucketType.HASH, "k", 4),
    )


def _rows(n=100):
    return [
        Row(
            d=f"2024-{(i % 12) + 1:02d}-01",
            k=i,
            v=float(i) * 0.5 if i % 7 else None,  # include nulls
            s=["a", "b", None][i % 3],
        )
        for i in range(n)
    ]


def test_write_read_roundtrip(spark, warehouse):
    t = OlapTable.create(spark, _dup_spec(), warehouse)
    df = spark.createDataFrame(_rows(), "d string, k long, v double, s string")
    rs = t.write(df)
    assert rs.num_rows == 100 and rs.start_version == 0
    back = t.read()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spec_persisted_and_loadable(spark, warehouse):
    t = OlapTable.create(spark, _dup_spec("persist_me"), warehouse)
    df = spark.createDataFrame(_rows(10), "d string, k long, v double, s string")
    t.write(df)
    t2 = OlapTable.load(spark, warehouse, "persist_me")
    assert t2.spec.to_dict() == t.spec.to_dict()
    assert t2.read().count() == 10
    OlapTable.drop(warehouse, "persist_me")
    assert not os.path.exists(os.path.join(warehouse, "persist_me"))


def test_snapshot_versions(spark, warehouse):
    t = OlapTable.create(spark, _dup_spec(), warehouse)
    df = spark.createDataFrame(_rows(90), "d string, k long, v double, s string")
    for i in range(3):
        t.write(df.filter(F.col("k") % 3 == i))
    assert t.read(0, 0).count() == 30
    assert t.read(0, 1).count() == 60
    assert t.read().count() == 90
    with pytest.raises(VersionGraphError):
        t.read(0, 99).count()


def test_read_as_of_time_travel(spark, warehouse):
    import time

    t = OlapTable.create(spark, _dup_spec(), warehouse)
    df = spark.createDataFrame(_rows(30), "d string, k long, v double, s string")
    t.write(df.filter(F.col("k") < 10))
    t1 = time.time()
    time.sleep(0.05)
    t.write(df.filter((F.col("k") >= 10) & (F.col("k") < 20)))
    t2 = time.time()
    time.sleep(0.05)
    t.write(df.filter(F.col("k") >= 20))
    assert t.read_as_of(t1).count() == 10
    assert t.read_as_of(t2).count() == 20
    assert t.read_as_of(time.time()).count() == 30
    assert t.read_as_of(0.0).count() == 0


def test_partition_pruning_in_plan(spark, warehouse):
    """Partition-label filters must prune at planning time: a filter on
    the partitioning column reaches the scan as a __pt partition filter
    via directory layout (reference A10/A16 -> Catalyst built-ins)."""
    t = OlapTable.create(spark, _dup_spec(), warehouse)
    df = spark.createDataFrame(_rows(), "d string, k long, v double, s string")
    t.write(df)
    scan = t.scan(with_hidden=True).filter(F.col("__pt") == "p1")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "__pt" in plan
    # row check: only first-half months
    months = {r["d"][5:7] for r in scan.collect()}
    assert all(m <= "06" for m in months)


def test_filter_pushdown_in_plan(spark, warehouse):
    t = OlapTable.create(spark, _dup_spec(), warehouse)
    df = spark.createDataFrame(_rows(), "d string, k long, v double, s string")
    t.write(df)
    q = t.read().filter(F.col("k") == 42)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan


def test_compaction_invariance(spark, warehouse):
    t = OlapTable.create(spark, _dup_spec(), warehouse)
    df = spark.createDataFrame(_rows(), "d string, k long, v double, s string")
    for i in range(5):
        t.write(df.filter(F.col("k") % 5 == i))
    before = sorted(map(tuple, t.read().collect()))
    assert compute_compaction_score(t) == 5
    compact(t)
    assert compute_compaction_score(t) == 1
    after = sorted(map(tuple, t.read().collect()))
    assert before == after
    # stale data dirs removable
    removed = garbage_collect(t)
    assert len(removed) == 5
    assert sorted(map(tuple, t.read().collect())) == before


def test_compaction_merges_aggregate_model(spark, warehouse):
    """Merge-on-write: post-compaction files hold the collapsed rows."""
    spec = TableSpec(
        name="agg",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64, AggregateType.SUM),
        ],
        keys_type=KeysType.AGGREGATE,
    )
    t = OlapTable.create(spark, spec, warehouse)
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    t.write(df)
    t.write(df)
    assert {tuple(r) for r in t.read().collect()} == {(1, 2.0), (2, 4.0)}
    compact(t)
    # raw scan (pre-collapse) of the compacted rowset is already merged
    assert t.scan().count() == 2
    assert {tuple(r) for r in t.read().collect()} == {(1, 2.0), (2, 4.0)}


def test_schedule_compaction_ranks(spark, warehouse):
    specs = []
    for name, nrs in (("a", 3), ("b", 1), ("c", 2)):
        spec = TableSpec(
            name=name,
            columns=[
                ColumnSpec.key("k", ColumnType.INT64),
                ColumnSpec.value("v", ColumnType.FLOAT64),
            ],
            keys_type=KeysType.DUPLICATE,
        )
        t = OlapTable.create(spark, spec, warehouse)
        df = spark.createDataFrame([(i, 1.0) for i in range(4)], "k long, v double")
        for i in range(nrs):
            t.write(df)
        specs.append(t)
    tasks = schedule_compaction(specs, top_k=2)
    assert [c.table_name for c in tasks] == ["a", "c"]


def test_delete_where_mvcc(spark, warehouse):
    from olap_storage_engine_spark.operators.compaction import delete_where
    from olap_storage_engine_spark.spec import (
        BucketSpec,
        BucketType,
        ColumnSpec,
        ColumnType,
        KeysType,
        TableSpec,
    )
    from olap_storage_engine_spark.table import OlapTable
    from pyspark.sql import functions as F

    spec = TableSpec(
        name="del_t",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.VARCHAR),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    t.write(
        spark.createDataFrame(
            [(i, "del" if i % 3 == 0 else "keep") for i in range(30)],
            "k long, v string",
        )
    )
    n = delete_where(t, F.col("v") == "del")
    assert n == 10
    # post-delete snapshot: deleted rows gone
    assert t.read().count() == 20
    assert t.read().filter(F.col("v") == "del").count() == 0
    # prior version still sees them (MVCC, time travel)
    assert t.read(0, 0).count() == 30


def test_delete_where_null_predicate(spark, warehouse):
    """SQL DELETE removes only predicate-TRUE rows; rows where the
    predicate is NULL (null column under a comparison) must survive."""
    from olap_storage_engine_spark.operators.compaction import delete_where
    from olap_storage_engine_spark.spec import (
        ColumnSpec,
        ColumnType,
        KeysType,
        TableSpec,
    )
    from olap_storage_engine_spark.table import OlapTable
    from pyspark.sql import functions as F

    spec = TableSpec(
        name="del_null_t",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    t = OlapTable.create(spark, spec, warehouse)
    t.write(
        spark.createDataFrame(
            [(0, 1), (1, 5), (2, None), (3, None), (4, 9)],
            "k long, x long",
        )
    )
    n = delete_where(t, F.col("x") > 4)  # NULL for k=2,3 — must survive
    assert n == 2
    kept = {r.k for r in t.read().select("k").collect()}
    assert kept == {0, 2, 3}


def test_clone_table_zero_copy_and_divergence(spark, warehouse):
    """Shallow clone: identical reads with ZERO data files under the
    clone root; post-clone writes diverge in both directions; the
    cloned MVCC lineage supports snapshot reads."""
    import os

    from olap_storage_engine_spark.table import clone_table

    spec = TableSpec(
        name="clone_src",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    src = OlapTable.create(spark, spec, warehouse)
    src.write(spark.createDataFrame([(1, 10), (2, 20)], "k long, x long"))
    src.write(spark.createDataFrame([(3, 30)], "k long, x long"))

    cl = clone_table(src, "clone_dst", warehouse)
    rows = lambda t: sorted((r["k"], r["x"]) for r in t.read().collect())
    assert rows(cl) == rows(src) == [(1, 10), (2, 20), (3, 30)]
    # zero-copy: not a single parquet file under the clone's root
    n_files = sum(
        1
        for dp, _, fns in os.walk(cl.root)
        for fn in fns
        if fn.endswith(".parquet")
    )
    assert n_files == 0
    # snapshot read over the CLONED lineage
    assert sorted(
        (r["k"], r["x"]) for r in cl.read(0, 0).collect()
    ) == [(1, 10), (2, 20)]
    # divergence: clone write invisible to source, and vice versa
    cl.write(spark.createDataFrame([(4, 40)], "k long, x long"))
    src.write(spark.createDataFrame([(5, 50)], "k long, x long"))
    assert rows(cl) == [(1, 10), (2, 20), (3, 30), (4, 40)]
    assert rows(src) == [(1, 10), (2, 20), (3, 30), (5, 50)]


def test_clone_gc_never_deletes_borrowed_source_files(spark, warehouse):
    """A clone compacts (retiring its borrowed rowsets) and then
    physically GCs — the SOURCE's data files must survive and the
    source must still read; the clone serves from its own compacted
    rowset."""
    from olap_storage_engine_spark.operators.compaction import (
        compact,
        garbage_collect,
    )
    from olap_storage_engine_spark.table import clone_table

    spec = TableSpec(
        name="gc_src",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    src = OlapTable.create(spark, spec, warehouse)
    src.write(spark.createDataFrame([(1, 10)], "k long, x long"))
    src.write(spark.createDataFrame([(2, 20)], "k long, x long"))
    cl = clone_table(src, "gc_dst", warehouse)
    compact(cl)  # rewrites borrowed rowsets into one native rowset
    removed = garbage_collect(cl, prepared_ttl_sec=None)
    # nothing physically removed: both retired rowsets were borrowed
    assert removed == []
    rows = lambda t: sorted((r["k"], r["x"]) for r in t.read().collect())
    assert rows(src) == [(1, 10), (2, 20)]  # source files intact
    assert rows(cl) == [(1, 10), (2, 20)]
