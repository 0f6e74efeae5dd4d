"""MVCC rollback: newer rowsets flip STALE in one metadata save, reads
serve the savepoint snapshot, boundary/spanning cases refuse.
"""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.plans.manifest import VersionGraphError
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable


def _tbl(spark, warehouse, name, model=KeysType.UNIQUE):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=model,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    return OlapTable.create(spark, spec, warehouse)


def test_rollback_restores_prior_snapshot(spark, warehouse):
    t = _tbl(spark, warehouse, "rb1")
    t.write(spark.createDataFrame([(i, 1.0) for i in range(20)], "k long, v double"))
    t.write(spark.createDataFrame([(i, 2.0) for i in range(10)], "k long, v double"))
    assert t.read().filter(F.col("v") == 2.0).count() == 10
    stale = t.rollback(0)
    assert len(stale) == 1
    assert t.manifest.max_version == 0
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {i: 1.0 for i in range(20)}


def test_publish_after_rollback_continues_from_savepoint(spark, warehouse):
    t = _tbl(spark, warehouse, "rb2")
    t.write(spark.createDataFrame([(1, 1.0)], "k long, v double"))  # v0
    t.write(spark.createDataFrame([(1, 2.0)], "k long, v double"))  # v1
    t.rollback(0)
    t.write(spark.createDataFrame([(1, 3.0)], "k long, v double"))  # new v1
    assert t.manifest.max_version == 1
    assert t.read().collect()[0]["v"] == 3.0
    # the rolled-back v=2.0 rowset never resurfaces
    assert t.read(0, 1).filter(F.col("v") == 2.0).count() == 0


def test_rollback_refuses_spanning_rowset(spark, warehouse):
    t = _tbl(spark, warehouse, "rb3", model=KeysType.DUPLICATE)
    t.write(spark.createDataFrame([(1, 1.0)], "k long, v double"))  # v0
    t.write(spark.createDataFrame([(2, 1.0)], "k long, v double"))  # v1
    t.write(spark.createDataFrame([(3, 1.0)], "k long, v double"))  # v2
    from olap_storage_engine_spark.operators.compaction import compact

    compact(t)  # one collapsed rowset spanning [0, 3]
    with pytest.raises(VersionGraphError, match="span"):
        t.rollback(1)


def test_rollback_to_current_is_noop(spark, warehouse):
    t = _tbl(spark, warehouse, "rb4")
    t.write(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    assert t.rollback(t.manifest.max_version) == []
    assert t.read().count() == 1


def test_rollback_beyond_max_is_noop_and_never_moves_max_forward(spark, warehouse):
    """rollback(to >= max_version) must not move max_version FORWARD —
    otherwise the next publish would land past a genuine version hole
    (found by the randomized MVCC model test)."""
    t = _tbl(spark, warehouse, "rb5")
    t.write(spark.createDataFrame([(1, 1.0)], "k long, v double"))  # v0
    assert t.rollback(5) == []
    assert t.manifest.max_version == 0
    t.write(spark.createDataFrame([(2, 2.0)], "k long, v double"))  # v1
    assert t.read().count() == 2


def test_rollback_stales_prepared_rowsets_beyond_savepoint(spark, warehouse):
    """A PREPARED rowset after the savepoint must NOT survive rollback:
    a later commit_rowset() would resurrect the rolled-back interval."""
    from olap_storage_engine_spark.plans.manifest import (
        RowsetMeta,
        RowsetState,
    )

    t = _tbl(spark, warehouse, "rb6", model=KeysType.DUPLICATE)
    t.write(spark.createDataFrame([(1, 1.0)], "k long, v double"))  # v0
    rid = t.manifest.next_rowset_id()
    t.manifest.prepare(
        RowsetMeta(rowset_id=rid, start_version=1, end_version=1, path="x")
    )
    stale = t.rollback(0)
    assert rid in stale
    with pytest.raises(VersionGraphError, match="not PREPARED"):
        t.manifest.commit_rowset(rid)
    states = {d["rowset_id"]: d["state"] for d in t.manifest.doc["rowsets"]}
    assert states[rid] == RowsetState.STALE.value


def test_rollback_unwinds_stream_txn_epochs(spark, warehouse):
    """Rolling back a streamed batch clears/lowers the source's epoch
    watermark so the SAME batch id can be re-ingested (ADVICE r5)."""
    t = _tbl(spark, warehouse, "rb7", model=KeysType.DUPLICATE)
    df0 = spark.createDataFrame([(1, 1.0)], "k long, v double")
    df1 = spark.createDataFrame([(2, 2.0)], "k long, v double")
    t.write(df0, txn=("src", 0))  # v0
    t.write(df1, txn=("src", 1))  # v1
    assert t.manifest.committed_epoch("src") == 1
    t.rollback(0)
    # the epoch watermark rewound to the surviving batch
    assert t.manifest.committed_epoch("src") == 0
    # re-ingest of batch 1 is accepted again (the stream_ingest guard
    # is `batch_id <= committed`)
    t.write(df1, txn=("src", 1))
    assert t.manifest.committed_epoch("src") == 1
    assert t.read().count() == 2
    # rolling back everything drops the source entirely
    t.rollback(-1) if t.manifest.max_version == 0 else t.rollback(0)
    # (v0 itself was txn batch 0; after rolling back past it the
    # watermark must be gone)
    t.rollback(-1)
    assert t.manifest.committed_epoch("src") is None
