"""Golden tests for the keys-model collapse (SURVEY §5 strategy #2):
hand-written frames including nulls and ties, semantics per
reference src/common.rs:37-57."""

from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.keys_model import (
    SEQ_COL,
    VERSION_COL,
    collapse,
)
from olap_storage_engine_spark.spec import (
    AggregateType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, f"k long, v double, s string, {VERSION_COL} long, {SEQ_COL} long"
    )


def _spec(keys_type, v_agg=AggregateType.NONE, s_agg=AggregateType.NONE):
    return TableSpec(
        name="t",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64, v_agg),
            ColumnSpec.value("s", ColumnType.VARCHAR, s_agg),
        ],
        keys_type=keys_type,
    )


def test_duplicate_keeps_all(spark):
    df = _df(spark, [(1, 1.0, "a", 0, 0), (1, 1.0, "a", 0, 1)])
    out = collapse(df, _spec(KeysType.DUPLICATE))
    assert out.count() == 2
    assert out.columns == ["k", "v", "s"]  # hidden columns dropped


def test_unique_latest_version_wins(spark):
    df = _df(
        spark,
        [
            (1, 1.0, "old", 0, 5),
            (1, 2.0, "new", 1, 0),  # higher version, lower seq: wins
            (2, 9.0, "only", 0, 0),
        ],
    )
    out = {r["k"]: r for r in collapse(df, _spec(KeysType.UNIQUE)).collect()}
    assert out[1]["v"] == 2.0 and out[1]["s"] == "new"
    assert out[2]["s"] == "only"


def test_unique_seq_breaks_ties_within_version(spark):
    df = _df(spark, [(1, 1.0, "first", 0, 0), (1, 2.0, "second", 0, 1)])
    out = collapse(df, _spec(KeysType.UNIQUE)).collect()
    assert len(out) == 1 and out[0]["s"] == "second"


def test_aggregate_sum_ignores_nulls(spark):
    df = _df(
        spark,
        [(1, 1.5, None, 0, 0), (1, None, None, 0, 1), (1, 2.5, None, 1, 2)],
    )
    out = collapse(
        df, _spec(KeysType.AGGREGATE, AggregateType.SUM, AggregateType.REPLACE)
    ).collect()
    assert len(out) == 1
    assert out[0]["v"] == 4.0  # null ignored (SQL semantics)


def test_aggregate_all_null_sum_is_null(spark):
    df = _df(spark, [(1, None, "x", 0, 0), (1, None, "y", 0, 1)])
    out = collapse(
        df, _spec(KeysType.AGGREGATE, AggregateType.SUM, AggregateType.REPLACE)
    ).collect()
    assert out[0]["v"] is None


def test_aggregate_min_max(spark):
    spec = TableSpec(
        name="t",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64, AggregateType.MIN),
            ColumnSpec.value("s", ColumnType.VARCHAR, AggregateType.MAX),
        ],
        keys_type=KeysType.AGGREGATE,
    )
    df = _df(spark, [(1, 3.0, "a", 0, 0), (1, 1.0, "z", 0, 1), (1, 2.0, "m", 1, 2)])
    out = collapse(df, spec).collect()
    assert out[0]["v"] == 1.0 and out[0]["s"] == "z"


def test_aggregate_replace_latest_wins(spark):
    df = _df(
        spark,
        [(1, 1.0, "v0", 0, 9), (1, 2.0, "v1", 1, 0), (2, 5.0, "only", 0, 0)],
    )
    out = {
        r["k"]: r
        for r in collapse(
            df,
            _spec(KeysType.AGGREGATE, AggregateType.SUM, AggregateType.REPLACE),
        ).collect()
    }
    assert out[1]["s"] == "v1"
    assert out[1]["v"] == 3.0  # sum across versions
    assert out[2]["s"] == "only"


def test_collapse_idempotent(spark):
    """collapse(collapse(x)) == collapse(x) for UNIQUE (property from
    SURVEY §5 #3)."""
    df = _df(
        spark,
        [(1, 1.0, "a", 0, 0), (1, 2.0, "b", 1, 1), (2, 3.0, "c", 0, 2)],
    )
    spec = _spec(KeysType.UNIQUE)
    once = collapse(df, spec)
    twice = collapse(
        once.withColumn(VERSION_COL, F.lit(0)).withColumn(
            SEQ_COL, F.monotonically_increasing_id()
        ),
        spec,
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
