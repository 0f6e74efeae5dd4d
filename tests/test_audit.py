"""Write-audit-publish (r10): expectation gates between durability and
visibility over the two-phase publish."""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.audit import (
    expect_in_range,
    expect_min_rows,
    expect_no_nulls,
    expect_unique,
    write_audit_publish,
)
from olap_storage_engine_spark.spec import (
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable


def _make(spark, warehouse, name):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


def test_green_batch_commits_and_red_batch_is_invisible(spark, warehouse):
    t = _make(spark, warehouse, "wap1")
    checks = [expect_min_rows(1), expect_in_range("v", lo=0.0)]
    ok, _, report = write_audit_publish(t, _df(spark, [(1, 1.0)]), checks)
    assert ok and all(p for _, p in report)
    ok2, rid2, report2 = write_audit_publish(
        t, _df(spark, [(2, -5.0)]), checks
    )
    assert not ok2
    assert dict(report2) == {"min_rows(1)": True, "in_range(v,0.0,None)": False}
    got = {r["k"] for r in t.read().collect()}
    assert got == {1}  # the discarded batch never becomes visible
    # the discarded rowset is recorded, never served
    states = {
        d["rowset_id"]: (d["state"], d.get("stale_reason"))
        for d in t.manifest.doc["rowsets"]
    }
    assert states[rid2] == ("STALE", "discarded")


def test_version_slot_not_consumed_by_aborted_batch(spark, warehouse):
    t = _make(spark, warehouse, "wap2")
    checks = [expect_no_nulls("v")]
    write_audit_publish(t, _df(spark, [(1, 1.0)]), checks)
    v_after_good = t.manifest.max_version
    ok, _, _ = write_audit_publish(t, _df(spark, [(2, None)]), checks)
    assert not ok
    assert t.manifest.max_version == v_after_good  # no hole, no advance
    # a later plain write lands cleanly in the reclaimed slot
    t.write(_df(spark, [(3, 3.0)]))
    assert {r["k"] for r in t.read().collect()} == {1, 3}


def test_all_checks_reported_even_after_failure(spark, warehouse):
    t = _make(spark, warehouse, "wap3")
    ok, _, report = write_audit_publish(
        t,
        _df(spark, [(1, -1.0), (1, -1.0)]),
        [
            expect_min_rows(5),
            expect_unique(["k"]),
            expect_in_range("v", lo=0.0),
        ],
    )
    assert not ok
    assert [p for _, p in report] == [False, False, False]


def test_checks_run_against_staged_files_not_input(spark, warehouse):
    """The audit reads the rowset's PARQUET FILES: what readers would
    see, post-routing and post-write — a check passing on the input
    but failing on the files (or vice versa) must follow the files."""
    t = _make(spark, warehouse, "wap4")
    seen_rows = []
    checks = [("probe", lambda df: bool(seen_rows.append(df.count())) or True)]
    write_audit_publish(t, _df(spark, [(1, 1.0), (2, 2.0)]), checks)
    assert seen_rows == [2]
