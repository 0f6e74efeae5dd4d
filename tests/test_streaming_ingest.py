"""Streaming ingest into the MVCC table (routine-load analogue) and
RANDOM bucketing."""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.streaming.ingest import stream_ingest
from olap_storage_engine_spark.table import OlapTable


def test_stream_ingest_publishes_rowsets(spark, warehouse, tmp_path):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "k long, v double"
    )
    # three source files -> maxFilesPerTrigger=1 gives three micro-batches
    df.repartition(3).write.parquet(src)

    spec = TableSpec(
        name="ingest_t",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest(t, stream)
    q.awaitTermination(120)

    assert t.read().count() == 30
    # each micro-batch became one published rowset
    assert t.compaction_score() >= 2
    assert t.manifest.max_version == t.compaction_score() - 1
    # snapshot of the first version only
    assert 0 < t.read(0, 0).count() < 30


def test_unique_table_absorbs_replayed_batch(spark, warehouse, tmp_path):
    """At-least-once delivery + UNIQUE keys = effective exactly-once."""
    spec = TableSpec(
        name="uniq_ingest",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
    )
    t = OlapTable.create(spark, spec, warehouse)
    batch = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t.write(batch)
    t.write(batch)  # replay
    assert t.read().count() == 10


def test_random_bucketing_writes_and_reads(spark, warehouse):
    spec = TableSpec(
        name="rand_t",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.RANDOM, None, 4),
    )
    t = OlapTable.create(spark, spec, warehouse)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    )
    t.write(df)
    back = t.scan(with_hidden=True)
    buckets = {r["__bk"] for r in back.select("__bk").distinct().collect()}
    assert buckets <= {0, 1, 2, 3} and len(buckets) >= 1
    assert t.read().count() == 100


def test_exactly_once_replayed_batch_skips(spark, warehouse):
    """The txn-epoch contract: a foreachBatch replay with an
    already-committed batch id publishes NOTHING (the epoch was
    recorded in the same manifest save as the rowset)."""
    from olap_storage_engine_spark.spec import (
        BucketSpec,
        BucketType,
        ColumnSpec,
        ColumnType,
        KeysType,
        TableSpec,
    )
    from olap_storage_engine_spark.table import OlapTable

    spec = TableSpec(
        name="eo1",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")

    # simulate the sink's write_batch body directly
    def write_batch(batch_df, batch_id, source_id="src"):
        committed = t.manifest.committed_epoch(source_id)
        if committed is not None and batch_id <= committed:
            return
        t.write(batch_df, txn=(source_id, batch_id))

    write_batch(df, 0)
    write_batch(df, 0)  # crash-replay of the same epoch
    write_batch(df, 1)
    write_batch(df, 0)  # late duplicate of an old epoch
    assert len(t.manifest.visible_rowsets()) == 2
    assert t.manifest.committed_epoch("src") == 1
    assert t.read().count() == 4
    # a different source's epochs are independent
    assert t.manifest.committed_epoch("other") is None


def test_exactly_once_end_to_end_stream(spark, warehouse, tmp_path):
    """Full streaming path with exactly_once=True: two files, one
    batch each — two rowsets, epochs recorded."""
    import os

    from olap_storage_engine_spark.spec import (
        BucketSpec,
        BucketType,
        ColumnSpec,
        ColumnType,
        KeysType,
        TableSpec,
    )
    from olap_storage_engine_spark.streaming.ingest import stream_ingest
    from olap_storage_engine_spark.table import OlapTable

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame([(1, 1.0)], "k long, v double").coalesce(
        1
    ).write.parquet(os.path.join(src, "f1"))
    spark.createDataFrame([(2, 2.0)], "k long, v double").coalesce(
        1
    ).write.parquet(os.path.join(src, "f2"))
    spec = TableSpec(
        name="eo2",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    # exactly_once demands a persistent checkpoint (epoch ids are only
    # monotone within one checkpoint lineage)
    import pytest

    with pytest.raises(ValueError, match="checkpoint_dir"):
        stream_ingest(t, stream, exactly_once=True, source_id="e2e")
    ckpt = str(tmp_path / "ckpt")
    q = stream_ingest(
        t, stream, checkpoint_dir=ckpt, exactly_once=True, source_id="e2e"
    )
    assert q.awaitTermination(120)
    assert t.read().count() == 2
    assert t.manifest.committed_epoch("e2e") is not None


def _gate_spec(name):
    return TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )


def test_gated_ingest_green_batches_commit_with_epochs(
    spark, warehouse, tmp_path
):
    """r10 quality-gated exactly-once: green micro-batches stage,
    audit, and commit with their epoch in the same manifest save."""
    from olap_storage_engine_spark.operators.audit import expect_in_range

    src = str(tmp_path / "gsrc")
    spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double"
    ).repartition(2).write.parquet(src)
    t = OlapTable.create(spark, _gate_spec("gate_ok"), warehouse)
    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest(
        t,
        stream,
        checkpoint_dir=str(tmp_path / "gckpt"),
        exactly_once=True,
        source_id="gate_ok",
        checks=[expect_in_range("v", lo=0.0)],
    )
    q.awaitTermination(120)
    assert t.read().count() == 20
    # epochs recorded atomically with the audited commits
    assert t.manifest.committed_epoch("gate_ok") is not None
    # every published rowset is VISIBLE (none left PREPARED)
    states = {d["state"] for d in t.manifest.doc["rowsets"]}
    assert states == {"VISIBLE"}


def test_gated_ingest_red_batch_halts_and_stays_invisible(
    spark, warehouse, tmp_path
):
    from olap_storage_engine_spark.operators.audit import expect_in_range

    src = str(tmp_path / "rsrc")
    spark.createDataFrame(
        [(1, -5.0), (2, -6.0)], "k long, v double"
    ).coalesce(1).write.parquet(src)
    t = OlapTable.create(spark, _gate_spec("gate_red"), warehouse)
    stream = spark.readStream.schema("k long, v double").parquet(src)
    q = stream_ingest(
        t,
        stream,
        checkpoint_dir=str(tmp_path / "rckpt"),
        exactly_once=True,
        source_id="gate_red",
        checks=[expect_in_range("v", lo=0.0)],
    )
    with pytest.raises(Exception) as exc:
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))
    assert "failed audit" in str(exc.value)
    # nothing visible, epoch never committed -> the batch redelivers
    assert t.read().count() == 0
    assert t.manifest.committed_epoch("gate_red") is None
    assert all(
        d["state"] == "STALE" and d["stale_reason"] == "discarded"
        for d in t.manifest.doc["rowsets"]
    )
