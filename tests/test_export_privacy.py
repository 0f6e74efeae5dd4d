"""Training-export shuffle/sharding (operators/export.py) and
k-anonymity release operators (operators/privacy.py)."""

import pytest
from pyspark.sql import Row, functions as F

from olap_storage_engine_spark.operators.export import (
    _CKMOD,
    global_shuffle,
    shard_manifest,
)
from olap_storage_engine_spark.operators.privacy import (
    k_anonymize,
    suppression_report,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, lang=["en", "de", "fr"][i % 3], n_chars=100 + i)
        for i in range(300)
    ]
    return spark.createDataFrame(rows)


def test_global_shuffle_is_a_permutation(spark, docs):
    out = global_shuffle(docs, "doc_id", n_shards=7, seed=1).collect()
    assert len(out) == 300
    assert sorted(r["doc_id"] for r in out) == list(range(300))
    # dense 0..n-1 positions within every shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(7))  # no empty shard at this size
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_global_shuffle_deterministic_and_seed_sensitive(spark, docs):
    a = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in global_shuffle(docs, "doc_id", 7, seed=1).collect()
    }
    b = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in global_shuffle(docs, "doc_id", 7, seed=1).collect()
    }
    c = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in global_shuffle(docs, "doc_id", 7, seed=2).collect()
    }
    assert a == b
    assert a != c
    # actually permutes: shard-0 members aren't a doc_id prefix run
    s0 = sorted(d for d, (s, _) in a.items() if s == 0)
    assert s0 != list(range(len(s0)))


def test_global_shuffle_append_stability(spark, docs):
    """Adding documents never moves an existing row between shards —
    shard id depends only on (key, seed)."""
    before = {
        r["doc_id"]: r["shard"]
        for r in global_shuffle(docs, "doc_id", 7, seed=1).collect()
    }
    more = docs.union(
        spark.createDataFrame(
            [Row(doc_id=300 + i, lang="en", n_chars=1) for i in range(50)]
        )
    )
    after = {
        r["doc_id"]: r["shard"]
        for r in global_shuffle(more, "doc_id", 7, seed=1).collect()
    }
    for d, s in before.items():
        assert after[d] == s


def test_shard_manifest_checksum_is_order_sensitive(spark, docs):
    shuffled = global_shuffle(docs, "doc_id", 4, seed=3).cache()
    base = {
        r["shard"]: (r["n_rows"], r["order_checksum"])
        for r in shard_manifest(shuffled, "doc_id").collect()
    }
    assert sum(n for n, _ in base.values()) == 300
    # swap two positions inside shard 0 -> checksum must change there
    perturbed = shuffled.withColumn(
        "pos",
        F.when(
            (F.col("shard") == 0) & (F.col("pos") == 0), F.lit(1)
        )
        .when((F.col("shard") == 0) & (F.col("pos") == 1), F.lit(0))
        .otherwise(F.col("pos")),
    )
    pert = {
        r["shard"]: (r["n_rows"], r["order_checksum"])
        for r in shard_manifest(perturbed, "doc_id").collect()
    }
    assert pert[0][0] == base[0][0] and pert[0][1] != base[0][1]
    for s in (1, 2, 3):
        assert pert[s] == base[s]
    shuffled.unpersist()
    assert all(0 <= ck < _CKMOD for _, ck in base.values())


def test_k_anonymize_suppresses_small_groups(spark):
    rows = [Row(g="big", v=i) for i in range(10)] + [
        Row(g="tiny", v=99)
    ]
    df = spark.createDataFrame(rows)
    out = k_anonymize(df, ["g"], k=5, agg_cols={"sum_v": F.sum("v")})
    got = out.collect()
    assert [r["g"] for r in got] == ["big"]
    assert got[0]["group_n"] == 10 and got[0]["sum_v"] == 45


def test_suppression_report_accounts_for_every_row(spark):
    rows = (
        [Row(g="a", v=0)] * 7 + [Row(g="b", v=0)] * 3 + [Row(g="c", v=0)] * 5
    )
    df = spark.createDataFrame(rows)
    r = suppression_report(df, ["g"], k=5).collect()[0]
    assert r["k"] == 5
    assert r["groups_total"] == 3 and r["groups_kept"] == 2
    assert r["rows_kept"] == 12 and r["rows_suppressed"] == 3
    assert r["rows_kept"] + r["rows_suppressed"] == df.count()
    # the kept groups are exactly what k_anonymize releases
    kept = k_anonymize(df, ["g"], k=5).count()
    assert kept == r["groups_kept"]
