"""Loaders for the driver-generated parquet test tables
(TESTDATA.md: /root/testdata/sf{0.001,0.01,0.1}/*.parquet).

These are thin ``spark.read.parquet`` wrappers — Spark's vectorized
Parquet reader with pushdown/pruning is the entire scan layer
(reference: src/segment.rs:250-310 -> built-in, SURVEY §1.5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_nanos_conf(spark: SparkSession) -> None:
    """TIMESTAMP(NANOS) parquet columns crash Spark's reader unless
    nanosAsLong is on.  It is a runtime SQL conf, so set it here as
    well as in get_spark — the driver may hand us a session built
    without our defaults."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already-set or restricted conf: proceed and let read fail loudly


def ensure_optimizer_conf(spark: SparkSession) -> None:
    """Exclude InferFiltersFromGenerate on externally-built sessions
    too (see session.py: its inferred size()>0 filter duplicates the
    heavy shingle expressions below the spread repartition)."""
    try:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_optimizer_conf(spark)
    if name == "events":
        ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to session-TZ TIMESTAMP (LTZ) whatever the
        # fixture's physical type. Event time must be LTZ for
        # Structured Streaming watermarks (NTZ is rejected); with the
        # UTC session timezone the cast is a pure relabel, so batch
        # results still match the DuckDB oracle's naive timestamps.
        from pyspark.sql import functions as F, types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) fixture read under nanosAsLong —
            # integer division: float division loses precision on
            # 19-digit nanosecond values (> 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # timestamp[us] fixture (isAdjustedToUTC=false) arrives as
            # TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` surfaces."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
