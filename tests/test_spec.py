import pytest

from olap_storage_engine_spark.spec import (
    AggregateType,
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    PartitionPolicy,
    PartitionType,
    TableSpec,
)


def _spec():
    return TableSpec(
        name="t",
        columns=[
            ColumnSpec.key("d", ColumnType.DATE),
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64, AggregateType.SUM),
            ColumnSpec.value("s", ColumnType.VARCHAR, AggregateType.REPLACE),
        ],
        keys_type=KeysType.AGGREGATE,
        partition=PartitionPolicy(
            PartitionType.RANGE, "d",
            bounds=[("p1", "2024-07-01"), ("p2", "2025-01-01")],
        ),
        bucket=BucketSpec(BucketType.HASH, "k", 4),
    )


def test_json_roundtrip():
    s = _spec()
    s2 = TableSpec.from_json(s.to_json())
    assert s2.to_dict() == s.to_dict()
    assert s2.key_names() == ["d", "k"]
    assert s2.value_names() == ["v", "s"]
    assert s2.schema_hash() == s.schema_hash()


def test_key_constructor_semantics():
    k = ColumnSpec.key("a", ColumnType.INT32)
    assert k.is_key and not k.nullable and k.aggregate_type == AggregateType.NONE
    v = ColumnSpec.value("b", ColumnType.FLOAT64, AggregateType.MAX)
    assert not v.is_key and v.nullable


def test_keys_required_for_non_duplicate():
    with pytest.raises(ValueError):
        TableSpec(
            name="bad",
            columns=[ColumnSpec.value("v", ColumnType.INT64)],
            keys_type=KeysType.UNIQUE,
        )


def test_range_routing():
    """First partition with key < upper bound wins
    (reference: src/partition.rs:172-189, probes from
    examples/basic_usage.rs:142-147)."""
    p = PartitionPolicy(
        PartitionType.RANGE, "d",
        bounds=[("p10", "2024-07-01"), ("p11", "2025-01-01")],
    )
    assert p.find_partition("2024-03-15") == "p10"
    assert p.find_partition("2024-09-20") == "p11"
    assert p.find_partition("2024-11-11") == "p11"
    assert p.find_partition("2025-06-01") is None  # beyond all bounds
    assert p.find_partition(None) is None


def test_range_bounds_sorted_defensively():
    # reference defect (SURVEY §4.4 #6): unsorted items silently
    # mis-route; we sort on construction.
    p = PartitionPolicy(
        PartitionType.RANGE, "d",
        bounds=[("late", "2025-01-01"), ("early", "2024-07-01")],
    )
    assert p.find_partition("2024-01-01") == "early"


def test_list_routing():
    p = PartitionPolicy(
        PartitionType.LIST, "seg", mapping={"A": "pa", "B": "pb"}
    )
    assert p.find_partition("A") == "pa"
    assert p.find_partition("Z") is None


def test_unpartitioned():
    p = PartitionPolicy()
    assert p.find_partition("anything") == "__all__"


def test_spark_schema():
    schema = _spec().spark_schema()
    assert [f.name for f in schema.fields] == ["d", "k", "v", "s"]
    assert not schema["d"].nullable and schema["v"].nullable
