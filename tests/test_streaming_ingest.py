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
