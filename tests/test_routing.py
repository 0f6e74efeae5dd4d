import numpy as np
import pandas as pd
import pytest

from olap_storage_engine_spark.operators.routing import (
    fnv1a64,
    fnv1a64_np,
    route_for_key,
)
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    PartitionPolicy,
    PartitionType,
)

# Public FNV-1a 64 test vectors (Fowler–Noll–Vo reference values)
KNOWN = {
    "": 0xCBF29CE484222325,
    "a": 0xAF63DC4C8601EC8C,
    "foobar": 0x85944171F73967E8,
}


def test_fnv_known_vectors():
    for s, h in KNOWN.items():
        assert fnv1a64(s) == h, s


def test_fnv_vectorized_matches_scalar():
    vals = ["", "a", "foobar", "12345", "order_1000001", "日本語", "x" * 100]
    out = fnv1a64_np(pd.Series(vals))
    for s, h in zip(vals, out):
        assert int(h) == fnv1a64(s), s


def test_fnv_vectorized_empty():
    assert len(fnv1a64_np(pd.Series([], dtype=object))) == 0


def test_bucket_id_col_parity(spark):
    """JVM-side pipeline bucket ids == driver-side scalar routing."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators.routing import bucket_id_col

    keys = [1001001, 1001002, 2002001, 3003003, 0, 999999999]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for n in (4, 7):  # power-of-2 and odd bucket counts
        b = BucketSpec(BucketType.HASH, "k", n)
        got = {
            r["k"]: r["b"]
            for r in df.withColumn("b", bucket_id_col(b)).collect()
        }
        for k in keys:
            assert got[k] == fnv1a64(str(k)) % n, (k, n)


def test_route_for_key():
    policy = PartitionPolicy(
        PartitionType.RANGE, "d",
        bounds=[("p10", "2024-07-01"), ("p11", "2025-01-01")],
    )
    bucket = BucketSpec(BucketType.HASH, "k", 4)
    part, b = route_for_key(policy, bucket, "2024-03-15", "1001001")
    assert part == "p10"
    assert b == fnv1a64("1001001") % 4


def test_partition_label_col(spark):
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators.routing import partition_label_col

    policy = PartitionPolicy(
        PartitionType.RANGE, "d",
        bounds=[("p10", "2024-07-01"), ("p11", "2025-01-01")],
    )
    df = spark.createDataFrame(
        [("2024-03-15",), ("2024-09-20",), ("2026-01-01",)], "d string"
    )
    got = [r[0] for r in df.select(partition_label_col(policy)).collect()]
    assert got == ["p10", "p11", "__unrouted__"]
