"""Plan-shape regression tests: the physical plans the 100 TB posture
depends on (SURVEY §4) — partition-directory pruning, parquet pushdown,
broadcast joins, no cartesian products."""

import re

import pytest


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e

    return e


SF = "/root/testdata/sf0.001"


def _plan(spark, entrymod, name):
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_prune_hits_partition_dirs(spark, entrymod):
    plan = _plan(spark, entrymod, "partition_prune_range")
    pf = re.findall(r"PartitionFilters: \[[^\]]+\]", plan)
    assert any("__pt" in f for f in pf), pf


def test_list_prune_hits_partition_dirs(spark, entrymod):
    plan = _plan(spark, entrymod, "partition_prune_list")
    pf = re.findall(r"PartitionFilters: \[[^\]]+\]", plan)
    assert any("__pt" in f and "IN" in f for f in pf), pf


def test_zonemap_filter_pushes_to_parquet(spark, entrymod):
    plan = _plan(spark, entrymod, "filter_range_zonemap")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_point_lookup_pushes_to_parquet(spark, entrymod):
    plan = _plan(spark, entrymod, "filter_equality_point")
    pushed = plan.split("PushedFilters:")[1][:200]
    assert "l_orderkey" in pushed


def test_star_join_broadcasts_dims(spark, entrymod):
    plan = _plan(spark, entrymod, "join_star_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_no_cartesian_in_similarity(spark, entrymod):
    # broadcast nested-loop against the tiny probe set is the intended
    # plan; an un-broadcast cartesian product is not
    plan = _plan(spark, entrymod, "similarity_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_no_cartesian_in_minhash(spark, entrymod):
    plan = _plan(spark, entrymod, "dedup_minhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scan_projection_prunes_columns(spark, entrymod):
    plan = _plan(spark, entrymod, "scan_projection")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # only the projected columns (plus nothing else) are read
    assert cols == {"l_orderkey", "l_extendedprice"}, cols
