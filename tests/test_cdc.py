"""Change-data-capture between MVCC snapshots — operators/cdc.

snapshot_changes is the derivative of the version graph: insert /
update / delete rows between any two readable snapshots, with row
identity given by the UNIQUE key model."""

from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.cdc import snapshot_changes
from olap_storage_engine_spark.operators.compaction import (
    delete_where,
    merge_into,
)
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable


def _t(spark, warehouse, name="cdc_t"):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("status", ColumnType.VARCHAR),
            ColumnSpec.value("amount", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdc_insert_update_unchanged(spark, warehouse):
    t = _t(spark, warehouse)
    t.write(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
            "k long, status string, amount double",
        )
    )  # v0
    merge_into(
        t,
        spark.createDataFrame(
            [(2, "B2", 25.0), (4, "D", 40.0)],
            "k long, status string, amount double",
        ),
    )  # v1: update k=2, insert k=4
    ch = _rows(snapshot_changes(t, 0, 1))
    assert ch == [
        ("insert", 4, "D", 40.0),
        ("update", 2, "B2", 25.0),
    ]
    # unchanged keys (1, 3) are not emitted; self-diff is empty
    assert _rows(snapshot_changes(t, 1, 1)) == []


def test_cdc_delete(spark, warehouse):
    t = _t(spark, warehouse, "cdc_d")
    t.write(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0)],
            "k long, status string, amount double",
        )
    )  # v0
    delete_where(t, F.col("k") == 1)  # v1: copy-on-write delete
    ch = _rows(snapshot_changes(t, 0, 1))
    # delete rows carry the OLD values — what a consumer must retract
    assert ch == [("delete", 1, "A", 10.0)]


def test_cdc_spans_multiple_versions(spark, warehouse):
    """CDC between non-adjacent snapshots nets out intermediate churn:
    a key updated twice surfaces once, with the final values."""
    t = _t(spark, warehouse, "cdc_m")
    t.write(
        spark.createDataFrame([(1, "A", 1.0)], "k long, status string, amount double")
    )  # v0
    merge_into(
        t,
        spark.createDataFrame(
            [(1, "A1", 2.0)], "k long, status string, amount double"
        ),
    )  # v1
    merge_into(
        t,
        spark.createDataFrame(
            [(1, "A2", 3.0), (2, "B", 9.0)],
            "k long, status string, amount double",
        ),
    )  # v2
    assert _rows(snapshot_changes(t, 0, 2)) == [
        ("insert", 2, "B", 9.0),
        ("update", 1, "A2", 3.0),
    ]


def test_cdc_rejects_duplicate_model(spark, warehouse):
    """Key tuples are not row identity on a DUPLICATE table — the diff
    must refuse rather than silently go many-to-many."""
    import pytest

    spec = TableSpec(
        name="cdc_dup",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("amount", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse, overwrite=True)
    t.write(spark.createDataFrame([(1, 1.0)], "k long, amount double"))
    with pytest.raises(ValueError, match="DUPLICATE"):
        snapshot_changes(t, 0, 0)


def test_cdc_null_key_classified_correctly(spark, warehouse):
    """Presence is a literal marker, not key-isNotNull: a row whose key
    column is genuinely NULL (matched across snapshots via eqNullSafe)
    must diff as update/unchanged, never as insert+delete."""
    t = _t(spark, warehouse, "cdc_nullk")
    t.write(
        spark.createDataFrame(
            [(None, "A", 10.0), (2, "B", 20.0)],
            "k long, status string, amount double",
        )
    )  # v0
    t.write(
        spark.createDataFrame(
            [(None, "A9", 11.0)], "k long, status string, amount double"
        )
    )  # v1: NULL-key row updated (UNIQUE collapse via eqNullSafe grouping)
    ch = _rows(snapshot_changes(t, 0, 1))
    assert ch == [("update", None, "A9", 11.0)]
    assert _rows(snapshot_changes(t, 0, 0)) == []


def test_cdc_randomized_vs_python_reference(spark, warehouse):
    """Seeded random merge/delete histories, CDC diffed against a
    brute-force Python dict reference over every snapshot pair."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        t = _t(spark, warehouse, f"cdc_r{seed}")
        # version 0: random base
        state_by_ver = []
        base = {
            k: (f"s{rng.randrange(4)}", float(rng.randrange(100)))
            for k in rng.sample(range(30), 12)
        }
        t.write(
            spark.createDataFrame(
                [(k, s, a) for k, (s, a) in base.items()],
                "k long, status string, amount double",
            )
        )
        state_by_ver.append(dict(base))
        cur = dict(base)
        # versions 1..3: random merges and deletes
        for v in range(1, 4):
            if rng.random() < 0.4 and cur:
                doomed = rng.sample(sorted(cur), max(1, len(cur) // 4))
                delete_where(t, F.col("k").isin(doomed))
                for k in doomed:
                    cur.pop(k)
            else:
                src = {
                    k: (f"s{rng.randrange(4)}", float(rng.randrange(100)))
                    for k in rng.sample(range(40), 6)
                }
                merge_into(
                    t,
                    spark.createDataFrame(
                        [(k, s, a) for k, (s, a) in src.items()],
                        "k long, status string, amount double",
                    ),
                )
                cur.update(src)
            state_by_ver.append(dict(cur))

        for lo in range(4):
            for hi in range(lo, 4):
                old, new = state_by_ver[lo], state_by_ver[hi]
                want = []
                for k in sorted(set(old) | set(new)):
                    if k not in old:
                        want.append(("insert", k, *new[k]))
                    elif k not in new:
                        want.append(("delete", k, *old[k]))
                    elif old[k] != new[k]:
                        want.append(("update", k, *new[k]))
                got = _rows(snapshot_changes(t, lo, hi))
                assert got == sorted(want), (seed, lo, hi)
