"""Schema-hash validation (reference: src/storage.rs:79-87 publishes by
(tablet_id, schema_hash)) and PREPARED-orphan garbage collection."""

import json
import os

import pytest
from pyspark.sql import Row

from olap_storage_engine_spark.operators.compaction import garbage_collect
from olap_storage_engine_spark.plans.manifest import RowsetState
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import SPEC_FILE, OlapTable, SchemaHashMismatch


def _spec(name="sh_t", vname="v"):
    return TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value(vname, ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )


def _rows(n=10):
    return [Row(k=i, v=float(i)) for i in range(n)]


def test_schema_hash_sensitive_to_layout():
    base = _spec().schema_hash()
    assert _spec(vname="v2").schema_hash() != base  # rename moves it
    # column 0's identity contributes (the round-2 enumerate bug zeroed it)
    renamed_key = _spec()
    renamed_key.columns[0].name = "k2"
    assert renamed_key.schema_hash() != base
    retyped = _spec()
    retyped.columns[1].column_type = ColumnType.INT64
    assert retyped.schema_hash() != base
    assert _spec().schema_hash() == base  # stable across instances


def test_load_rejects_tampered_spec(spark, warehouse):
    OlapTable.create(spark, _spec("sh_tamper"), warehouse)
    p = os.path.join(warehouse, "sh_tamper", SPEC_FILE)
    with open(p) as f:
        doc = json.load(f)
    doc["columns"][1]["name"] = "sneaky"  # edit without re-hashing
    with open(p, "w") as f:
        json.dump(doc, f)
    with pytest.raises(SchemaHashMismatch):
        OlapTable.load(spark, warehouse, "sh_tamper")


def test_write_rejects_drifted_spec(spark, warehouse):
    t = OlapTable.create(spark, _spec("sh_drift"), warehouse)
    t.spec.columns[1].name = "renamed_in_memory"
    with pytest.raises(SchemaHashMismatch):
        t.write(spark.createDataFrame([Row(k=1, renamed_in_memory=1.0)]))


def test_add_column_keeps_hash_consistent(spark, warehouse):
    t = OlapTable.create(spark, _spec("sh_evolve"), warehouse)
    t.write(spark.createDataFrame(_rows()))
    t.add_column(ColumnSpec.value("extra", ColumnType.INT64))
    # manifest hash evolved with the spec: next write still publishes
    t.write(
        spark.createDataFrame([Row(k=100, v=1.0, extra=7)])
    )
    assert t.read().count() == 11
    # and a reload validates cleanly
    t2 = OlapTable.load(spark, warehouse, "sh_evolve")
    assert t2.spec.schema_hash() == t.spec.schema_hash()


def test_gc_reclaims_aged_prepared_rowsets(spark, warehouse):
    t = OlapTable.create(spark, _spec("sh_gc"), warehouse)
    t.write(spark.createDataFrame(_rows()))  # visible baseline
    rs = t.write(spark.createDataFrame(_rows(5)), publish=False)
    d = os.path.join(t.root, rs.path)
    assert os.path.exists(d)
    created = rs.created_at

    # fresh PREPARED survives GC (its committer may still show up)
    assert garbage_collect(t, prepared_ttl_sec=3600, now=created + 10) == []
    assert os.path.exists(d)

    # aged past the TTL -> aborted and reclaimed
    removed = garbage_collect(t, prepared_ttl_sec=3600, now=created + 7200)
    assert rs.path in removed
    assert not os.path.exists(d)
    states = {r.rowset_id: r.state for r in t.manifest.rowsets()}
    assert states[rs.rowset_id] == RowsetState.STALE
    # the visible baseline is untouched
    assert t.read().count() == 10


def _versioned_table(spark, warehouse, name, n_versions=4):
    t = OlapTable.create(spark, _spec(name), warehouse)
    for i in range(n_versions):
        t.write(spark.createDataFrame([Row(k=i, v=float(i))]))
    return t


def test_time_travel_survives_compaction(spark, warehouse):
    """Compaction retires the granular cover but every pre-compaction
    snapshot stays readable through the time-travel graph (VISIBLE +
    retired STALE) until GC reclaims it."""
    from olap_storage_engine_spark.operators.compaction import compact

    t = _versioned_table(spark, warehouse, "sh_tt")
    pre = {v: t.read(0, v).count() for v in range(4)}
    compact(t)
    for v in range(4):
        assert t.read(0, v).count() == pre[v]
    # retired reason recorded on every staled rowset
    stale = [r for r in t.manifest.rowsets() if r.state == RowsetState.STALE]
    assert stale and all(r.stale_reason == "retired" for r in stale)


def test_gc_retention_window(spark, warehouse):
    """garbage_collect(min_retained_version=v): reads at every
    version >= v keep working (their covers' files survive), rowsets
    outside every retained cover are physically reclaimed, and reads
    past the window fail with VersionGraphError, not a missing-file
    scan error."""
    from olap_storage_engine_spark.operators.compaction import compact
    from olap_storage_engine_spark.plans.manifest import VersionGraphError

    t = _versioned_table(spark, warehouse, "sh_ret", n_versions=5)
    compact(t)
    removed = garbage_collect(t, min_retained_version=2)
    # v3/v4 granular rowsets fall outside every retained cover
    # ([0,2] and [0,3] resolve granular, [0,4] resolves compacted)
    assert removed == ["__rsv=4_4"]
    for v in (2, 3, 4):
        assert t.read(0, v).count() == v + 1
    # head-only GC reclaims the remaining retired history
    removed2 = garbage_collect(t)
    assert sorted(removed2) == [
        "__rsv=0_0", "__rsv=1_1", "__rsv=2_2", "__rsv=3_3",
    ]
    assert t.read().count() == 5  # head unaffected
    with pytest.raises(VersionGraphError):
        t.read(0, 2).count()
    # reclaimed flags persisted: a reloaded manifest agrees
    t2 = OlapTable.load(spark, warehouse, "sh_ret")
    rec = [r for r in t2.manifest.rowsets() if r.reclaimed]
    assert len(rec) == 5


def test_gc_retention_property(spark, warehouse):
    """Property over every retention boundary: after
    gc(min_retained_version=m), read(0, v) is intact for ALL v >= m."""
    from olap_storage_engine_spark.operators.compaction import compact

    for m in range(5):
        name = f"sh_retp{m}"
        t = _versioned_table(spark, warehouse, name, n_versions=5)
        compact(t)
        garbage_collect(t, min_retained_version=m)
        for v in range(m, 5):
            assert t.read(0, v).count() == v + 1, (m, v)


def test_rollback_discards_are_never_resurrected(spark, warehouse):
    """Rollback marks everything beyond the savepoint discarded —
    including previously compaction-retired rowsets — so the
    time-travel graph can never serve rolled-back content even after
    the interval is re-published and re-compacted."""
    from olap_storage_engine_spark.operators.compaction import compact

    t = _versioned_table(spark, warehouse, "sh_rb", n_versions=3)
    compact(t, 1, 2)  # retires granular [1,1] and [2,2]
    t.manifest.rollback(0)  # discards compacted [1,2] AND the retired pair
    for r in t.manifest.rowsets():
        if r.state == RowsetState.STALE:
            assert r.stale_reason == "discarded", r.rowset_id
    # re-publish versions 1..2 with DIFFERENT content, compact again
    t.write(spark.createDataFrame([Row(k=100, v=100.0)]))
    t.write(spark.createDataFrame([Row(k=200, v=200.0)]))
    compact(t)
    # time travel to v1 must see the NEW row, not the rolled-back one
    got = {r["k"] for r in t.read(0, 1).collect()}
    assert got == {0, 100}
    # and GC with retention never keeps discarded content alive
    garbage_collect(t, min_retained_version=0)
    got = {r["k"] for r in t.read(0, 1).collect()}
    assert got == {0, 100}


def test_time_travel_never_crosses_scoped_epochs(spark, warehouse):
    """A retired partition-SCOPED rowset must never serve as a global
    time-travel edge: its interval covers only its labels, and the
    global cover has no label masking — a scoped DELETE delta unioned
    with the unmasked base would resurrect the deleted row.  Reads
    through scoped epochs raise; purely-global prefixes stay
    readable."""
    import pytest
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators.compaction import (
        compact,
        delete_where,
    )
    from olap_storage_engine_spark.plans.manifest import VersionGraphError
    from olap_storage_engine_spark.spec import (
        PartitionPolicy,
        PartitionType,
    )

    spec = TableSpec(
        name="sh_scoped_tt",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("d", ColumnType.VARCHAR),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
        partition=PartitionPolicy(
            PartitionType.RANGE, "d",
            bounds=[("p1", "b"), ("p2", "z")],
        ),
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse, overwrite=True)
    t.write(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "m", 3.0)],
            "k long, d string, v double",
        )
    )  # v0, global
    n = delete_where(t, F.col("k") == 3)  # v1, scoped to p2
    assert n == 1
    t.write(
        spark.createDataFrame([(4, "m", 4.0)], "k long, d string, v double")
    )  # v2, global — so [0, 1] is NOT covered by the compacted rowset
    compact(t)  # retires global v0/v2 AND the scoped v1 delta
    # head read: deletion holds
    assert {r["k"] for r in t.read().collect()} == {1, 2, 4}
    # pre-DML snapshot: purely global cover, still readable
    assert {r["k"] for r in t.read(0, 0).collect()} == {1, 2, 3}
    # [0, 1] would need the retired SCOPED delta as a global edge —
    # the union with the UNMASKED v0 base would resurrect k=3; the
    # graph refuses instead (out of time-travel reach)
    with pytest.raises(VersionGraphError):
        t.read(0, 1).collect()


def test_gc_retention_with_scoped_history(spark, warehouse):
    """Retention GC over a table whose history contains a scoped DML
    epoch: retained covers are global-only (scoped epochs are out of
    time-travel reach), retired scoped rowsets are conservatively
    retained while a window is set, and the head stays correct."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators.compaction import (
        compact,
        delete_where,
    )
    from olap_storage_engine_spark.spec import (
        PartitionPolicy,
        PartitionType,
    )

    spec = TableSpec(
        name="sh_scoped_gc",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("d", ColumnType.VARCHAR),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
        partition=PartitionPolicy(
            PartitionType.RANGE, "d",
            bounds=[("p1", "b"), ("p2", "z")],
        ),
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse, overwrite=True)
    t.write(
        spark.createDataFrame(
            [(1, "a", 1.0), (3, "m", 3.0)], "k long, d string, v double"
        )
    )  # v0 global
    delete_where(t, F.col("k") == 3)  # v1 scoped
    t.write(
        spark.createDataFrame([(4, "m", 4.0)], "k long, d string, v double")
    )  # v2 global
    compact(t)
    removed = garbage_collect(t, min_retained_version=0)
    # the retained cover for v0 keeps the global v0 rowset; the scoped
    # delta is conservatively retained (not reclaimed) under a window
    stale = {
        r.rowset_id: r
        for r in t.manifest.rowsets()
        if r.state == RowsetState.STALE
    }
    scoped = [r for r in stale.values() if r.partitions]
    assert scoped and all(not r.reclaimed for r in scoped)
    assert {r["k"] for r in t.read(0, 0).collect()} == {1, 3}
    assert {r["k"] for r in t.read().collect()} == {1, 4}
    # head-only GC then reclaims everything stale, head unaffected
    garbage_collect(t)
    assert {r["k"] for r in t.read().collect()} == {1, 4}
