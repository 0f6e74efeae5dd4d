"""Temporal join operators: as-of, band, chunked interval range join.

Golden tests on hand-built frames (incl. unmatched rows, inclusive
equality, null payload fields) plus an equivalence check of the
chunked range join against the naive filter formulation.
"""

import datetime as dt

from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.temporal import (
    asof_join,
    band_join,
    range_join_chunked,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:30:00"), None),  # null payload field
            ("B", _ts("2024-01-01 09:00:00"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:05:00"), 7),   # equal ts -> inclusive
            ("A", _ts("2024-01-01 10:20:00"), 8),   # between quotes
            ("A", _ts("2024-01-01 10:40:00"), 9),   # after null-px quote
            ("B", _ts("2024-01-01 08:00:00"), 1),   # before any quote
            ("C", _ts("2024-01-01 12:00:00"), 2),   # key with no quotes
        ],
        "sym string, ts timestamp, qty int",
    )


class TestAsofJoin:
    def test_backward_inclusive_and_unmatched(self, spark):
        out = asof_join(
            _trades(spark), _quotes(spark), on="sym", prefix="q_"
        ).orderBy("sym", "ts")
        rows = {(r["sym"], r["qty"]): (r["q_ts"], r["q_px"]) for r in out.collect()}
        assert rows[("A", 7)] == (_ts("2024-01-01 10:05:00"), 101.0)
        assert rows[("A", 8)] == (_ts("2024-01-01 10:05:00"), 101.0)
        # row-atomic carry: the 10:30 quote (px NULL) must win whole,
        # not stitch px from the 10:05 row
        assert rows[("A", 9)] == (_ts("2024-01-01 10:30:00"), None)
        assert rows[("B", 1)] == (None, None)
        assert rows[("C", 2)] == (None, None)
        assert out.count() == 5

    def test_inner_drops_unmatched(self, spark):
        out = asof_join(
            _trades(spark), _quotes(spark), on="sym", how="inner"
        )
        assert out.count() == 3
        assert {r["sym"] for r in out.collect()} == {"A"}

    def test_single_shuffle_no_join(self, spark):
        plan = asof_join(
            _trades(spark), _quotes(spark), on="sym"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # union + window, never a join node


class TestBandJoin:
    def test_band_membership(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:00:00"))], "uid int, ts timestamp"
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 08:59:59")),  # outside (>1h before)
                (1, _ts("2024-01-01 09:00:00")),  # boundary: included
                (1, _ts("2024-01-01 10:00:00")),  # boundary: included
                (1, _ts("2024-01-01 10:00:01")),  # after: excluded
                (2, _ts("2024-01-01 09:30:00")),  # wrong key
            ],
            "uid int, ts timestamp",
        )
        out = band_join(left, right, on="uid", band_before="1 hour")
        assert out.count() == 2

    def test_plan_is_equi_join(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:00:00"))], "uid int, ts timestamp"
        )
        plan = (
            band_join(left, left, on="uid")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestRangeJoinChunked:
    def test_matches_naive_filter(self, spark):
        ev = spark.range(0, 500).select(
            F.col("id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(mins=F.col("id") * 7)
            ).alias("ts"),
        )
        iv = spark.createDataFrame(
            [
                (_ts("2024-01-01 03:00:00"), _ts("2024-01-01 05:30:00")),
                (_ts("2024-01-01 20:10:00"), _ts("2024-01-02 01:00:00")),
            ],
            "start timestamp, end timestamp",
        )
        chunked = range_join_chunked(ev, iv, chunk_seconds=3600)
        naive = ev.crossJoin(iv).filter(
            (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
        )
        assert sorted(
            (r["id"], r["start"]) for r in chunked.collect()
        ) == sorted((r["id"], r["start"]) for r in naive.collect())
        assert chunked.count() > 0

    def test_plan_is_equi_join(self, spark):
        # ts must be non-constant: a literal folds the chunk equality
        # into a constant filter, leaving no join key at all
        ev = spark.range(0, 10).select(
            F.col("id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(hours=F.col("id"))
            ).alias("ts"),
        )
        iv = spark.createDataFrame(
            [(_ts("2024-01-01 03:00:00"), _ts("2024-01-01 05:00:00"))],
            "start timestamp, end timestamp",
        )
        plan = (
            range_join_chunked(ev, iv)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_randomized_vs_python_reference(spark):
    """Seeded random frames, compared against a brute-force Python
    as-of reference (greatest right_ts <= left_ts per key)."""
    import random

    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        base = 1_700_000_000
        left_rows = [
            (rng.randrange(5), base + rng.randrange(10_000), i)
            for i in range(120)
        ]
        right_rows = [
            (rng.randrange(5), base + rng.randrange(10_000), 100 + i)
            for i in range(80)
        ]
        # unique (key, ts) on the right so the match is well-defined
        seen = set()
        right_rows = [
            r for r in right_rows
            if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
        ]
        left = spark.createDataFrame(
            [(k, dt.datetime.utcfromtimestamp(t), i) for k, t, i in left_rows],
            "k long, ts timestamp, lid long",
        )
        right = spark.createDataFrame(
            [(k, dt.datetime.utcfromtimestamp(t), v) for k, t, v in right_rows],
            "k long, ts timestamp, rv long",
        )
        got = {
            r["lid"]: r["r_rv"]
            for r in asof_join(left, right, on="k").collect()
        }
        want = {}
        for k, t, i in left_rows:
            cands = [(rt, rv) for rk, rt, rv in right_rows
                     if rk == k and rt <= t]
            want[i] = max(cands)[1] if cands else None
        assert got == want, f"seed {seed}"


def test_gap_fill_locf_randomized_vs_python_reference(spark):
    """Seeded random sparse daily frames; the spine, zero-fill, and
    LOCF checked against a brute-force Python reference."""
    import datetime
    import random

    from olap_storage_engine_spark.operators.temporal import gap_fill_locf

    for seed in (3, 11):
        rng = random.Random(seed)
        rows = []
        data = {}
        for g in ("a", "b"):
            days = sorted(rng.sample(range(60), rng.randrange(3, 10)))
            for d in days:
                day = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
                n = rng.randrange(1, 5)
                total = round(rng.uniform(0, 100), 4)
                rows.append((g, day, n, total))
                data[(g, day)] = (n, total)
        daily = spark.createDataFrame(
            rows, "g string, day date, n long, total double"
        )
        got = {
            (r["g"], r["day"]): (r["n"], r["total_locf"])
            for r in gap_fill_locf(
                daily, ["g"], "day", count_cols=["n"], locf_cols=["total"]
            ).collect()
        }
        want = {}
        for g in ("a", "b"):
            days = sorted(d for (gg, d) in data if gg == g)
            lo, hi = days[0], days[-1]
            carry = None
            d = lo
            while d <= hi:
                if (g, d) in data:
                    n, total = data[(g, d)]
                    carry = total
                else:
                    n = 0
                want[(g, d)] = (n, carry)
                d += datetime.timedelta(days=1)
        assert got == want, seed


def test_ohlc_resample_invariants_and_ties(spark):
    from olap_storage_engine_spark.operators.temporal import ohlc_resample
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # duplicate timestamps: tie broken by event_id (total order)
        (1, 10, t0, 5.0),
        (1, 11, t0, 3.0),          # same ts, higher event_id
        (1, 12, t0 + dt.timedelta(hours=2), 9.0),
        (1, 13, t0 + dt.timedelta(hours=3), 1.0),
        (2, 20, t0, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r["user_id"]: r for r in ohlc_resample(df, ["user_id"]).collect()}
    u1 = out[1]
    assert u1["open"] == 5.0      # event_id 10 wins the ts tie
    assert u1["close"] == 1.0
    assert u1["high"] == 9.0 and u1["low"] == 1.0 and u1["volume"] == 4
    for r in out.values():
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
