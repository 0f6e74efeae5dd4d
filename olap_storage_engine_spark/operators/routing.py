"""Partition + bucket routing (reference: src/partition.rs:28-45,
src/partition.rs:172-189, src/table.rs:32-41).

The reference routes each row to a tablet by (a) RANGE/LIST partition
lookup on the partition key, then (b) FNV-1a-64 hash of the sort key's
string bytes mod num_buckets.  We reproduce (a) as JVM-side CASE
expressions (so Catalyst can prune on the derived partition-label
column) and (b) as a vectorized Arrow-batched pandas UDF used ONLY at
write/routing time — reads never touch Python (SURVEY §7.4 hard-part 3).

FNV-1a 64 is a public-domain hash (Fowler–Noll–Vo); constants are the
standard offset basis 0xcbf29ce484222325 and prime 0x100000001b3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import LongType

from ..spec import BucketSpec, BucketType, PartitionPolicy, PartitionType

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a64(data: bytes | str) -> int:
    """Scalar FNV-1a 64 — the golden implementation tests check the
    vectorized path against."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * FNV_PRIME) & _MASK64
    return h


def fnv1a64_np(values: pd.Series) -> np.ndarray:
    """Vectorized FNV-1a 64 over a string series.

    Strategy: pad all UTF-8 byte strings into one (n_rows, max_len)
    uint8 matrix, then fold position-by-position with a row mask — the
    inner loop runs max_len times (key strings are short), each step a
    whole-column numpy op with explicit uint64 wraparound.
    """
    encoded = values.astype(str).str.encode("utf-8")
    lengths = encoded.str.len().to_numpy()
    n = len(encoded)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    mat = np.zeros((n, max_len), dtype=np.uint8)
    for i, b in enumerate(encoded):  # cheap: memcpy per row
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    with np.errstate(over="ignore"):
        for pos in range(max_len):
            mask = lengths > pos
            h[mask] = (h[mask] ^ mat[mask, pos].astype(np.uint64)) * prime
    return h


@F.pandas_udf(LongType())
def _fnv1a64_udf(values: pd.Series) -> pd.Series:
    # Signed view of the uint64 hash (Spark LongType); bucket math below
    # reconstructs the unsigned value.
    return pd.Series(fnv1a64_np(values).astype(np.int64))


def fnv_hash_col(col: Column | str) -> Column:
    """FNV-1a 64 of a column's string form, as a signed 64-bit long."""
    c = F.col(col) if isinstance(col, str) else col
    return _fnv1a64_udf(c.cast("string"))


def bucket_id_col(bucket: BucketSpec) -> Column:
    """Bucket id for each row under the given spec.

    HASH: unsigned(fnv1a64(str(key))) % num_buckets — bit-exact parity
    with the reference's ``bucket_for_key`` (src/partition.rs:28-38).
    RANDOM: round-robin via spark_partition_id/monotonic id mix; the
    reference uses subsec-nanos (src/partition.rs:39-45) and is
    likewise non-deterministic by design.
    """
    n = bucket.num_buckets
    if bucket.btype == BucketType.RANDOM or bucket.column is None:
        # mix the partition id into the round-robin start offset:
        # monotonically_increasing_id restarts each partition at
        # pid << 33, and 2^33 % n == 0 for any n dividing 2^33, so a
        # bare pmod would restart EVERY partition at bucket 0 — with
        # many small input splits the low buckets systematically
        # over-fill.  Adding pid staggers the starting bucket.
        return F.pmod(
            F.spark_partition_id().cast("long")
            + F.monotonically_increasing_id(),
            F.lit(n),
        ).cast("int")
    h = fnv_hash_col(bucket.column)
    # interpret the signed long as unsigned 64-bit before the modulo:
    # pmod(h, n) on the signed value differs from u64 % n when h < 0
    # unless n divides 2^64; correct via (h % n + (2^64 % n)) % n.
    two64_mod_n = pow(2, 64, n)
    unsigned_mod = F.when(h >= 0, F.pmod(h, F.lit(n))).otherwise(
        F.pmod(F.pmod(h, F.lit(n)) + F.lit(two64_mod_n), F.lit(n))
    )
    return unsigned_mod.cast("int")


def partition_label_col(policy: PartitionPolicy) -> Column:
    """Derived partition-label column, fully JVM-side so writes lay out
    ``partitionBy(label)`` directories and reads get automatic partition
    pruning from Catalyst.

    RANGE: first bound with key < upper (bounds pre-sorted ascending —
    the reference's linear scan, src/partition.rs:180-184, assumes the
    same order).  LIST: exact-match mapping.  Unroutable keys get the
    sentinel ``__unrouted__`` rather than silently landing somewhere.
    """
    if policy.ptype == PartitionType.UNPARTITIONED or policy.column is None:
        return F.lit("__all__")
    key = F.col(policy.column).cast("string")
    if policy.ptype == PartitionType.LIST:
        expr = None
        for val, name in policy.mapping.items():
            cond = key == F.lit(val)
            expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        return (expr.otherwise(F.lit("__unrouted__"))
                if expr is not None else F.lit("__unrouted__"))
    expr = None
    for name, upper in policy.bounds:  # ascending; first match wins
        cond = key < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return (expr.otherwise(F.lit("__unrouted__"))
            if expr is not None else F.lit("__unrouted__"))


def route_for_key(
    policy: PartitionPolicy, bucket: BucketSpec, partition_key, sort_key
) -> tuple[str | None, int]:
    """Driver-side single-row routing (reference: src/table.rs:32-41) —
    used by tests and by point-lookup planning, never in data paths."""
    part = policy.find_partition(partition_key)
    if bucket.btype == BucketType.HASH and bucket.column is not None:
        b = fnv1a64(str(sort_key)) % bucket.num_buckets
    else:
        b = 0
    return part, b
