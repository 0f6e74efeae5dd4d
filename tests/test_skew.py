"""Skew mitigation: salted join/agg produce results bit-identical to
their unsalted counterparts."""

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [(1 if i % 10 else i, i, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "k long, rid long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 1000, 7)], "k long, name string"
    )


def test_salted_join_matches_plain(spark, skewed, dim):
    plain = skewed.join(dim, "k").select("k", "rid", "v", "name")
    salted = salted_join(skewed, dim, "k", salt_factor=8, salt_source="rid")
    assert sorted(map(tuple, salted.select("k", "rid", "v", "name").collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_outer(spark, skewed, dim):
    plain = skewed.join(dim, "k", "left").select("k", "rid", "name")
    salted = salted_join(
        skewed, dim, "k", salt_factor=4, salt_source="rid", how="left"
    ).select("k", "rid", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r["k"]): (r["s"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["v"], r["rid"])
        for r in salted_agg(
            skewed, ["k"], {"v": "sum", "rid": "count"}, salt_factor=8
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-9
        assert plain[k][1] == salted[k][1]


def test_salted_agg_rejects_noncomposable(spark, skewed):
    with pytest.raises(ValueError, match="compose"):
        salted_agg(skewed, ["k"], {"v": "avg"})
