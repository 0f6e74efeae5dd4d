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
