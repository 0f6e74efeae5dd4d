"""MERGE INTO (copy-on-write upsert) — operators/compaction.merge_into.

Reference parity: the Unique keys model's declared collapse semantics
(src/common.rs:40-41) executed as targeted DML; MVCC behavior mirrors
the rowset version layer (src/tablet.rs:116-128)."""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.compaction import merge_into
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable


def _mk_table(spark, warehouse, name="m"):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("status", ColumnType.VARCHAR),
            ColumnSpec.value("amt", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_updates_inserts_and_keeps(spark, warehouse):
    t = _mk_table(spark, warehouse)
    t.write(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, status string, amt double",
        )
    )
    src = spark.createDataFrame(
        [(2, "UPD", 99.0), (9, "NEW", 1.0)],
        "k long, status string, amt double",
    )
    merge_into(t, src)
    assert _rows(t.read()) == [
        (1, "a", 10.0),
        (2, "UPD", 99.0),
        (3, "c", 30.0),
        (9, "NEW", 1.0),
    ]


def test_merge_is_mvcc_event(spark, warehouse):
    """Pre-merge snapshots resolve to the untouched old rowsets."""
    t = _mk_table(spark, warehouse)
    t.write(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k long, status string, amt double"
        )
    )
    pre_version = t.manifest.max_version
    merge_into(
        t,
        spark.createDataFrame([(1, "UPD", 0.0)], "k long, status string, amt double"),
    )
    assert _rows(t.read(0, pre_version)) == [(1, "a", 10.0), (2, "b", 20.0)]
    assert _rows(t.read()) == [(1, "UPD", 0.0), (2, "b", 20.0)]


def test_merge_writes_one_collapsed_rowset(spark, warehouse):
    """Post-merge reads take the single-collapsed-rowset fast path."""
    t = _mk_table(spark, warehouse)
    t.write(spark.createDataFrame([(1, "a", 1.0)], "k long, status string, amt double"))
    t.write(spark.createDataFrame([(2, "b", 2.0)], "k long, status string, amt double"))
    rs = merge_into(
        t,
        spark.createDataFrame([(3, "c", 3.0)], "k long, status string, amt double"),
    )
    assert rs.collapsed
    cover = t.manifest.capture_consistent_versions()
    assert len(cover) == 1 and cover[0].rowset_id == rs.rowset_id
    assert _rows(t.read()) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]


def test_merge_source_only_touches_matched(spark, warehouse):
    """An empty-overlap source is a pure insert; full-overlap a pure
    update — row counts prove no accidental drops/dups."""
    t = _mk_table(spark, warehouse)
    t.write(
        spark.createDataFrame(
            [(i, "x", float(i)) for i in range(100)],
            "k long, status string, amt double",
        )
    )
    merge_into(
        t,
        spark.createDataFrame(
            [(i, "y", 0.0) for i in range(100, 120)],
            "k long, status string, amt double",
        ),
    )
    assert t.read().count() == 120
    merge_into(
        t,
        spark.createDataFrame(
            [(i, "z", -1.0) for i in range(120)],
            "k long, status string, amt double",
        ),
    )
    df = t.read()
    assert df.count() == 120
    assert df.filter(F.col("status") != "z").count() == 0
