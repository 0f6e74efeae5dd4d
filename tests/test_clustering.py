"""Z-order clustering: the Morton curve must actually tighten parquet
row-group stats in BOTH dimensions — measured from footers, compared
against a 1-D sorted layout — and the clustered copy must return the
same rows as the source.
"""

import os

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.clustering import (
    rowgroups_matching_box,
    zorder_value,
    zorder_write,
)
from olap_storage_engine_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def li(spark):
    return load_table(spark, SF, "lineitem")


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(
        zorder_value([F.col("a"), F.col("b")], bits=3).alias("z")
    ).collect()[0]["z"]
    # a=101, b=011 -> bit i of a at 2i, of b at 2i+1:
    # i=0: a0=1->bit0, b0=1->bit1; i=1: a1=0->bit2, b1=1->bit3;
    # i=2: a2=1->bit4, b2=0->bit5  => 0b011011 = 27
    assert z == 0b011011


def test_zorder_preserves_rows(spark, li, tmp_path):
    path = str(tmp_path / "zli")
    zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    a = li.groupBy("l_returnflag").count().collect()
    b = back.groupBy("l_returnflag").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_zorder_prunes_both_dimensions(spark, li, tmp_path):
    """The measurable claim: against the same box predicate, the
    Z-order layout leaves far fewer row groups with intersecting
    stats than a layout sorted only by l_partkey (which cannot
    cluster l_suppkey at all)."""
    conf = "spark.sql.files.maxRecordsPerFile"
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    # 64 groups: at 16 both layouts bottom out at the same 2-3
    # boundary groups for a 10% box (the r6 testdata redraw exposed
    # this) — finer granularity lets the 2-D curve actually separate
    # from the 1-D sort instead of tying at the floor.
    zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=64)
    (
        li.repartitionByRange(64, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # wide partkey box (≈50% of the domain) x narrow suppkey box
    # (≈10%): the 1-D partkey sort structurally CANNOT prune below
    # ~50% (suppkey spreads over every slice), while the 2-D curve
    # confines the suppkey band — separation that survives any data
    # redraw, unlike a small-x-small box where curve-perimeter slop
    # ties the two layouts (the r6 redraw exposed exactly that).
    box = {"l_partkey": (0, 999), "l_suppkey": (10, 19)}
    zm, zt = rowgroups_matching_box(zpath, box)
    sm, st = rowgroups_matching_box(spath, box)
    assert zt >= 32 and st >= 32
    assert sm / st >= 0.4, (sm, st)  # 1-D layout cannot prune suppkey
    assert zm / zt < sm / st, (zm, zt, sm, st)
    # and the z fraction must be small in absolute terms
    assert zm / zt < 0.35, (zm, zt)


def test_zorder_scan_matches_oracle(spark):
    import __spark_entry__ as e
    from tools.compare import compare_query

    r = compare_query(
        spark,
        "zorder_scan",
        "/root/testdata/sf0.001",
        e.queries(),
        e.oracle_sql(),
    )
    assert r["status"] == "OK", r
