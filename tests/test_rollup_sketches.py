"""Rollup routing (A15) and sketch-operator bounds."""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.rollup import covers, route_read
from olap_storage_engine_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    column_profile,
    heavy_hitters,
)
from olap_storage_engine_spark.spec import (
    AggregateType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable


def _agg_table(spark, warehouse, name, key_names, replace=False):
    cols = [ColumnSpec.key(k, ColumnType.INT64) for k in key_names]
    cols.append(
        ColumnSpec.value(
            "v",
            ColumnType.FLOAT64,
            AggregateType.REPLACE if replace else AggregateType.SUM,
        )
    )
    spec = TableSpec(name=name, columns=cols, keys_type=KeysType.AGGREGATE)
    t = OlapTable.create(spark, spec, warehouse)
    n_keys = len(key_names)
    rows = [tuple([i % 7, i % 3][:n_keys] + [float(i)]) for i in range(50)]
    schema = ", ".join(f"{k} long" for k in key_names) + ", v double"
    t.write(spark.createDataFrame(rows, schema))
    return t


def test_route_picks_coarsest_cover(spark, warehouse):
    base = _agg_table(spark, warehouse, "base", ["a", "b"])
    roll = _agg_table(spark, warehouse, "roll", ["a"])
    assert route_read([base, roll], ["a"]).spec.name == "roll"
    assert route_read([base, roll], ["a", "b"]).spec.name == "base"
    with pytest.raises(ValueError):
        route_read([base, roll], ["c"])


def test_replace_disqualifies_coarser_rollup(spark, warehouse):
    rep = _agg_table(spark, warehouse, "rep", ["a", "b"], replace=True)
    # full key set: fine; subset: REPLACE can't re-aggregate
    assert covers(rep, ["a", "b"])
    assert not covers(rep, ["a"])


def test_rollup_answers_match_base(spark, warehouse):
    base = _agg_table(spark, warehouse, "base2", ["a", "b"])
    roll_df = base.read().groupBy("a").agg(F.sum("v").alias("v"))
    spec = TableSpec(
        name="roll2",
        columns=[
            ColumnSpec.key("a", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64, AggregateType.SUM),
        ],
        keys_type=KeysType.AGGREGATE,
    )
    roll = OlapTable.create(spark, spec, warehouse)
    roll.write(roll_df)
    via_base = {
        r["a"]: r["s"]
        for r in base.read().groupBy("a").agg(F.sum("v").alias("s")).collect()
    }
    via_roll = {
        r["a"]: r["s"]
        for r in route_read([base, roll], ["a"])
        .read()
        .groupBy("a")
        .agg(F.sum("v").alias("s"))
        .collect()
    }
    assert via_base == via_roll


@pytest.fixture(scope="module")
def lineitem(spark):
    from olap_storage_engine_spark.sources.testdata import load_table

    return load_table(spark, "/root/testdata/sf0.001", "lineitem")


def test_approx_distinct_within_rsd(spark, lineitem):
    est = approx_distinct(lineitem, ["l_orderkey"], rsd=0.02).collect()[0]
    exact = lineitem.select("l_orderkey").distinct().count()
    assert abs(est["l_orderkey_distinct"] - exact) <= 0.1 * exact


def test_approx_quantiles_bounds(spark, lineitem):
    qs = approx_quantiles(lineitem, "l_quantity", [0.5]).collect()[0][
        "quantiles"
    ]
    lo, hi = (
        lineitem.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    )
    assert lo <= qs[0] <= hi


def test_heavy_hitters_exact(spark, lineitem):
    hh = {r["l_returnflag"]: r for r in heavy_hitters(lineitem, "l_returnflag", 0.1).collect()}
    total = lineitem.count()
    exact = {
        r["l_returnflag"]: r["cnt"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for flag, cnt in exact.items():
        if cnt >= 0.1 * total:
            assert flag in hh and hh[flag]["cnt"] == cnt


def test_column_profile_shape(spark, lineitem):
    prof = column_profile(lineitem, ["l_orderkey", "l_returnflag"]).collect()[0]
    assert prof["l_orderkey_nulls"] == 0
    assert prof["l_returnflag_min"] in ("A", "N", "R")
    assert prof["l_orderkey_distinct"] > 0


def test_column_profile_checked_exact_and_bound(spark, lineitem):
    from olap_storage_engine_spark.operators.sketches import (
        column_profile_checked,
    )

    prof = column_profile_checked(
        lineitem, ["l_orderkey", "l_returnflag"]
    ).collect()[0]
    exact = lineitem.select("l_orderkey").distinct().count()
    assert prof["l_orderkey_distinct_exact"] == exact
    assert prof["l_orderkey_est_ok"] == 1
    assert prof["l_returnflag_est_ok"] == 1
    assert "l_orderkey_est" not in prof.asDict()  # raw estimate hidden


def test_rollup_delta_refresh_matches_full_rebuild(spark, warehouse):
    from olap_storage_engine_spark.operators.rollup import (
        rollup_delta_refresh,
    )

    base = _agg_table(spark, warehouse, "base_inc", ["a", "b"])  # version 0
    # rollup seeded from version 0 only
    roll_spec = TableSpec(
        name="roll_inc",
        columns=[
            ColumnSpec.key("a", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64, AggregateType.SUM),
        ],
        keys_type=KeysType.AGGREGATE,
    )
    roll = OlapTable.create(spark, roll_spec, warehouse)
    roll.write(base.read(0, 0).groupBy("a").agg(F.sum("v").alias("v")))

    # a second base write, then an incremental refresh of just that delta
    base.write(
        spark.createDataFrame(
            [(i % 7, i % 3, float(100 + i)) for i in range(30)],
            "a long, b long, v double",
        )
    )
    rollup_delta_refresh(base, roll, 1, 1)

    got = {
        r["a"]: round(r["v"], 6) for r in roll.read().collect()
    }
    want = {
        r["a"]: round(r["v"], 6)
        for r in base.read().groupBy("a").agg(F.sum("v").alias("v")).collect()
    }
    assert got == want


def test_rollup_delta_refresh_rejects_replace(spark, warehouse):
    base = _agg_table(spark, warehouse, "base_rr", ["a", "b"])
    roll = _agg_table(spark, warehouse, "roll_rr", ["a"], replace=True)
    from olap_storage_engine_spark.operators.rollup import (
        rollup_delta_refresh,
    )

    with pytest.raises(ValueError, match="compose"):
        rollup_delta_refresh(base, roll, 0, 0)


# ---------------------------------------------------- mergeable sketches


def test_sketch_merge_equals_direct_exact_regime(spark, warehouse):
    """Union-merging per-publish partial sketches equals one direct
    sketch over all the data — bit-exact below the sparse-mode
    threshold (the regime where DataSketches HLL is an exact set)."""
    from olap_storage_engine_spark.operators.sketches import (
        group_sketch,
        merge_sketch_estimates,
    )

    df = spark.createDataFrame(
        [(i, i % 5, i % 97) for i in range(2000)], "id long, g long, u long"
    )
    parts = [
        group_sketch(df.filter(F.col("id") % 3 == m), ["g"], "u")
        for m in range(3)
    ]
    merged = merge_sketch_estimates(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), ["g"]
    )
    got = {r["g"]: r["n_distinct"] for r in merged.collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert got == exact


def test_sketch_rollup_estimate_bounded(spark, warehouse):
    """Above the exact regime the merged estimate stays close to the
    exact count, and merging costs no accuracy: the bound (10%) covers
    the direct sketch's own observed error at lgk=12 (~7% worst group
    here); the merged estimate equals the direct sketch's estimate."""
    from olap_storage_engine_spark.operators.sketches import (
        group_sketch,
        merge_sketch_estimates,
    )

    df = spark.createDataFrame(
        [(i, i % 2, i % 40000) for i in range(120000)],
        "id long, g long, u long",
    )
    parts = group_sketch(df.filter(F.col("id") % 2 == 0), ["g"], "u").unionByName(
        group_sketch(df.filter(F.col("id") % 2 == 1), ["g"], "u")
    )
    got = {r["g"]: r["n_distinct"] for r in merge_sketch_estimates(parts, ["g"]).collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
    }
    for g, n in exact.items():
        assert abs(got[g] - n) / n < 0.10
    # merging partials costs nothing vs sketching all rows at once
    direct = {
        r["g"]: r["e"]
        for r in df.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("u", 12)).alias("e"))
        .collect()
    }
    assert got == direct


def test_kll_merge_equals_direct_exact_regime(spark):
    """Merging per-publish KLL partials equals one direct sketch when
    k exceeds the group size (no compaction anywhere -> the sketch IS
    the sorted data), and the quantiles are exact order statistics."""
    from olap_storage_engine_spark.operators.sketches import (
        group_kll_sketch,
        merge_kll_quantiles,
    )

    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(4000)], "id long, g long, v double"
    )
    parts = group_kll_sketch(df.filter(F.col("id") % 2 == 0), ["g"], "v").unionByName(
        group_kll_sketch(df.filter(F.col("id") % 2 == 1), ["g"], "v")
    )
    merged = {
        r["g"]: r for r in merge_kll_quantiles(parts, ["g"], [0.5]).collect()
    }
    direct = {
        r["g"]: r
        for r in merge_kll_quantiles(
            group_kll_sketch(df, ["g"], "v"), ["g"], [0.5]
        ).collect()
    }
    for g in merged:
        assert merged[g]["p5"] == direct[g]["p5"]
        # the median of {g, g+4, ..., g+3996} must be a member value
        assert (merged[g]["p5"] - g) % 4 == 0


def test_kll_rank_error_bounded_vs_exact(spark):
    """Beyond the exact regime (n > k) the merged quantile stays
    within KLL's rank-error bound of the exact percentile."""
    from olap_storage_engine_spark.operators.sketches import (
        group_kll_sketch,
        merge_kll_quantiles,
    )

    n = 50000
    df = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(n)], "id long, g long, v double"
    )
    parts = group_kll_sketch(df.filter(F.col("id") % 2 == 0), ["g"], "v", k=1024).unionByName(
        group_kll_sketch(df.filter(F.col("id") % 2 == 1), ["g"], "v", k=1024)
    )
    got = merge_kll_quantiles(parts, ["g"], [0.5, 0.95], k=1024).collect()[0]
    # k=1024 -> eps ~ 1.7%/sqrt-ish; 2% rank slack is generous
    assert abs(got["p5"] - 0.5 * n) <= 0.02 * n
    assert abs(got["p95"] - 0.95 * n) <= 0.02 * n


def test_theta_retention_matches_exact_self_join(spark):
    """Theta intersection estimates equal the exact day-over-day
    distinct overlap in the exact regime (fixture cardinalities)."""
    from olap_storage_engine_spark.operators.sketches import (
        group_theta_sketch,
        theta_day_over_day_retention,
    )
    from olap_storage_engine_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    sk = group_theta_sketch(ev, ["day"], "user_id")
    got = {
        r["day"]: r["retained_users"]
        for r in theta_day_over_day_retention(sk).collect()
    }
    du = ev.distinct()
    prev = du.select(F.date_add("day", 1).alias("day"), "user_id")
    exact = {
        r["day"]: r["n"]
        for r in du.join(prev, ["day", "user_id"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exact


def test_freq_items_merge_exact_regime(spark):
    """Two truncation-free partials merge to the exact top-k with
    max_err = 0 (the docs_freqitems fixture regime)."""
    from olap_storage_engine_spark.operators.sketches import (
        group_freq_items,
        merge_freq_items,
    )

    rows = [("g", f"w{i % 7}") for i in range(70)] + [
        ("g", "rare") for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "grp string, tok string")
    parts = [
        group_freq_items(df.filter(F.crc32("tok") % 2 == i), ["grp"], "tok", k=16)
        for i in (0, 1)
    ]
    merged = merge_freq_items(parts[0].unionByName(parts[1]), ["grp"], top=8)
    got = {(r["item"]): (r["cnt"], r["max_err"]) for r in merged.collect()}
    assert got["rare"] == (3, 0)
    for i in range(7):
        assert got[f"w{i}"] == (10, 0)


def test_freq_items_residual_bounds_undercount(spark):
    """Beyond the exact regime (per-publish cardinality > k) every
    reported count under-reports its true count by at most max_err —
    the Misra-Gries merge guarantee the rollup documents."""
    from olap_storage_engine_spark.operators.sketches import (
        group_freq_items,
        merge_freq_items,
    )

    # one heavy item + a long tail of singletons that overflow k
    rows = [("g", "heavy")] * 50 + [("g", f"t{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, tok string")
    parts = group_freq_items(df, ["grp"], "tok", k=8)
    merged = merge_freq_items(parts, ["grp"], top=3).collect()
    true_counts = {
        r["tok"]: r["n"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert merged, "top items must survive truncation"
    for r in merged:
        assert r["max_err"] > 0  # truncation really happened
        true = true_counts[r["item"]]
        assert r["cnt"] <= true <= r["cnt"] + r["max_err"], (
            r["item"], r["cnt"], true, r["max_err"],
        )
    # the heavy hitter is never evicted and its count is exact here
    # (it was kept in the single publish's top-k)
    top1 = merged[0]
    assert top1["item"] == "heavy" and top1["cnt"] == 50


def test_join_mv_delta_refresh_equals_full_join(spark, warehouse):
    """The delta-refreshed JOIN MV must equal a from-scratch fact⋈dim
    join after every publish — the invariant that makes serving from
    the denormalized table safe."""
    from olap_storage_engine_spark.operators.rollup import (
        join_mv_delta_refresh,
    )

    fact_spec = TableSpec(
        name="jmv_fact",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    mv_spec = TableSpec(
        name="jmv_mv",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.FLOAT64),
            ColumnSpec.value("d", ColumnType.VARCHAR),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    fact = OlapTable.create(spark, fact_spec, warehouse)
    mv = OlapTable.create(spark, mv_spec, warehouse)
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "dk long, d string"
    )
    import pyspark.sql.functions as SF

    for chunk in range(3):
        rows = [(i, float(i + chunk * 100)) for i in range(chunk * 5, chunk * 5 + 5)]
        rs = fact.write(spark.createDataFrame(rows, "k long, x double"))
        join_mv_delta_refresh(
            fact, dim, mv, rs.start_version, rs.end_version,
            SF.col("k") % 7 == SF.col("dk"),
        )
        expect = sorted(
            (r["k"], r["x"], f"d{r['k'] % 7}")
            for r in fact.read().collect()
        )
        got = sorted(
            (r["k"], r["x"], r["d"]) for r in mv.read().collect()
        )
        assert got == expect, f"after publish {chunk}"


def test_join_agg_mv_partials_merge_to_full_aggregate(spark, warehouse):
    """The AGGREGATE-over-JOIN MV's collapse of per-publish partials
    must equal a from-scratch aggregate of the full fact⋈dim join,
    with exact integer value columns."""
    from olap_storage_engine_spark.operators.rollup import (
        join_agg_mv_delta_refresh,
    )
    import pyspark.sql.functions as SF

    fact_spec = TableSpec(
        name="jam_fact",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    mv_spec = TableSpec(
        name="jam_mv",
        columns=[
            ColumnSpec.key("g", ColumnType.VARCHAR),
            ColumnSpec.value("sx", ColumnType.INT64, AggregateType.SUM),
            ColumnSpec.value("n", ColumnType.INT64, AggregateType.SUM),
        ],
        keys_type=KeysType.AGGREGATE,
    )
    fact = OlapTable.create(spark, fact_spec, warehouse)
    mv = OlapTable.create(spark, mv_spec, warehouse)
    dim = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(10)], "dk long, g string"
    )
    aggs = [
        SF.sum("x").alias("sx"),
        SF.count(SF.lit(1)).cast("long").alias("n"),
    ]
    expect = {}
    for chunk in range(3):
        rows = [(i % 10, i + chunk) for i in range(chunk * 7, chunk * 7 + 7)]
        for k, x in rows:
            g = f"g{k % 3}"
            sx, n = expect.get(g, (0, 0))
            expect[g] = (sx + x, n + 1)
        rs = fact.write(spark.createDataFrame(rows, "k long, x long"))
        join_agg_mv_delta_refresh(
            fact, dim, mv, rs.start_version, rs.end_version,
            SF.col("k") == SF.col("dk"), aggs,
        )
        got = {
            r["g"]: (r["sx"], r["n"]) for r in mv.read().collect()
        }
        assert got == expect, f"after publish {chunk}"
    # one rowset per publish: partials really are merged at read
    assert mv.compaction_score() == 3


def test_join_mv_refresh_is_idempotent_and_tracks_staleness(
    spark, warehouse
):
    """A replayed refresh of an already-applied interval must be a
    no-op (for the AGGREGATE MV a double-applied partial would
    silently double-count), and mv_staleness must count unabsorbed
    fact publishes."""
    import pyspark.sql.functions as SF

    from olap_storage_engine_spark.operators.rollup import (
        join_agg_mv_delta_refresh,
        mv_refreshed_through,
        mv_staleness,
    )

    fact_spec = TableSpec(
        name="idem_fact",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("x", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    mv_spec = TableSpec(
        name="idem_mv",
        columns=[
            ColumnSpec.key("g", ColumnType.INT64),
            ColumnSpec.value("sx", ColumnType.INT64, AggregateType.SUM),
        ],
        keys_type=KeysType.AGGREGATE,
    )
    fact = OlapTable.create(spark, fact_spec, warehouse)
    mv = OlapTable.create(spark, mv_spec, warehouse)
    dim = spark.createDataFrame([(i, i % 2) for i in range(5)], "dk long, g long")
    aggs = [SF.sum("x").alias("sx")]
    on = SF.col("k") == SF.col("dk")

    rs1 = fact.write(spark.createDataFrame([(1, 10), (2, 20)], "k long, x long"))
    assert mv_staleness(mv, fact) == 1
    join_agg_mv_delta_refresh(fact, dim, mv, rs1.start_version, rs1.end_version, on, aggs)
    assert mv_refreshed_through(mv, fact) == rs1.end_version
    assert mv_staleness(mv, fact) == 0
    before = sorted((r["g"], r["sx"]) for r in mv.read().collect())
    # crash-replay: the same interval again — must not double-count
    join_agg_mv_delta_refresh(fact, dim, mv, rs1.start_version, rs1.end_version, on, aggs)
    after = sorted((r["g"], r["sx"]) for r in mv.read().collect())
    assert after == before
    assert mv.compaction_score() == 1  # no second rowset published
    # a new publish raises staleness until refreshed
    rs2 = fact.write(spark.createDataFrame([(3, 30)], "k long, x long"))
    assert mv_staleness(mv, fact) == 1
    join_agg_mv_delta_refresh(fact, dim, mv, rs2.start_version, rs2.end_version, on, aggs)
    assert mv_staleness(mv, fact) == 0
    got = sorted((r["g"], r["sx"]) for r in mv.read().collect())
    assert got == [(0, 20), (1, 40)]


def test_mv_refresh_rejects_gapped_and_overlapping_intervals(
    spark, warehouse
):
    """The refresh watermark is a single high-water epoch, so a gap
    (skipped versions would be recorded as refreshed) or an overlap
    (already-applied versions would double-count on an AGGREGATE MV)
    must fail loud; an exact replay stays a silent no-op."""
    import pyspark.sql.functions as SF
    import pytest as _pt

    from olap_storage_engine_spark.operators.rollup import (
        join_agg_mv_delta_refresh,
    )

    fact = OlapTable.create(
        spark,
        TableSpec(
            name="gap_fact",
            columns=[
                ColumnSpec.key("k", ColumnType.INT64),
                ColumnSpec.value("x", ColumnType.INT64),
            ],
            keys_type=KeysType.DUPLICATE,
        ),
        warehouse,
    )
    mv = OlapTable.create(
        spark,
        TableSpec(
            name="gap_mv",
            columns=[
                ColumnSpec.key("g", ColumnType.INT64),
                ColumnSpec.value("sx", ColumnType.INT64, AggregateType.SUM),
            ],
            keys_type=KeysType.AGGREGATE,
        ),
        warehouse,
    )
    dim = spark.createDataFrame([(i, i % 2) for i in range(10)], "dk long, g long")
    aggs = [SF.sum("x").alias("sx")]
    on = SF.col("k") == SF.col("dk")
    for _ in range(3):  # versions 0,1,2 published
        fact.write(spark.createDataFrame([(1, 10), (2, 20)], "k long, x long"))

    join_agg_mv_delta_refresh(fact, dim, mv, 0, 0, on, aggs)
    # gap: skipping version 1
    with _pt.raises(ValueError, match="non-contiguous"):
        join_agg_mv_delta_refresh(fact, dim, mv, 2, 2, on, aggs)
    # overlap past the watermark: would re-apply version 0
    with _pt.raises(ValueError, match="non-contiguous"):
        join_agg_mv_delta_refresh(fact, dim, mv, 0, 1, on, aggs)
    # exact replay of the committed interval: silent no-op
    join_agg_mv_delta_refresh(fact, dim, mv, 0, 0, on, aggs)
    # the contiguous next interval goes through
    join_agg_mv_delta_refresh(fact, dim, mv, 1, 2, on, aggs)
    got = {r["g"]: r["sx"] for r in mv.read().collect()}
    assert got == {0: 60, 1: 30}
