"""Model-based randomized testing of the MVCC surface: random
interleavings of write / MERGE / DELETE / rollback / compaction
(global and per-partition) applied to BOTH an OlapTable and a plain
in-memory model, with full-read equivalence and data-skipping
equivalence checked after every operation.

This targets the interactions unit tests can't enumerate — rollback
over scoped DML chains, compaction after rollback, skipping across
freshly scoped rowsets — on a UNIQUE-model RANGE-partitioned table.
"""

import random

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.compaction import (
    compact,
    compact_partitions,
    delete_where,
    merge_into,
)
from olap_storage_engine_spark.plans.manifest import VersionGraphError
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    PartitionPolicy,
    PartitionType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable

# 2-digit keys only: RANGE bounds compare stringified keys, and
# 10..59 keeps lexicographic order == numeric order
KEYS = list(range(10, 60))
LABELS = ["pa", "pb", "pc"]


def _label(k: int) -> str:
    return "pa" if k < 20 else ("pb" if k < 40 else "pc")


def _make(spark, warehouse, name):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.UNIQUE,
        partition=PartitionPolicy(
            PartitionType.RANGE,
            "k",
            # string-typed RANGE bounds route on the stringified key:
            # keys are 2-digit padded below so lexicographic == numeric
            bounds=[("pa", "20"), ("pb", "40"), ("pc", "99")],
        ),
        bucket=BucketSpec(BucketType.HASH, "k", 2),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _rows(pairs):
    return [(k, float(v)) for k, v in pairs]


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_random_mvcc_op_sequences_match_model(spark, warehouse, seed):
    rng = random.Random(seed)
    t = _make(spark, warehouse, f"mvcc_{seed}")
    model: dict[int, float] = {}
    history: list[dict[int, float]] = []  # model snapshot per version
    # current name of the value column — the "rename" op below evolves
    # it mid-sequence (r10 non-additive schema evolution), so every
    # write/merge/read goes through the live spec name
    vcol = ["v"]

    def spark_df(pairs):
        return spark.createDataFrame(_rows(pairs), f"k long, {vcol[0]} double")

    def check():
        df = t.read()
        # evolution invariant: reads serve exactly the CURRENT layout,
        # whatever generation each surviving rowset was written under
        assert set(df.columns) == {"k", vcol[0]}, df.columns
        got = {r["k"]: r[vcol[0]] for r in df.collect()}
        assert got == model, (sorted(got.items())[:5], sorted(model.items())[:5])
        lo = rng.randrange(10, 50)
        hi = lo + rng.randrange(0, 25)
        skipped = {
            r["k"]: r[vcol[0]]
            for r in t.read_skipped("k", lo, hi).collect()
        }
        want = {k: v for k, v in model.items() if lo <= k <= hi}
        assert skipped == want, (lo, hi)

    # seed the table so every op has something to act on
    first = [(k, rng.randrange(100)) for k in rng.sample(KEYS, 20)]
    t.write(spark_df(first))
    model.update({k: float(v) for k, v in first})
    history.append(dict(model))
    check()

    # layout toggle targets for the "repartition" op: same label names
    # resolve the same keys, only the boundaries/bucket count move
    alt_layouts = [
        (
            PartitionPolicy(
                PartitionType.RANGE,
                "k",
                bounds=[("pa", "30"), ("pb", "50"), ("pc", "99")],
            ),
            3,
        ),
        (
            PartitionPolicy(
                PartitionType.RANGE,
                "k",
                bounds=[("pa", "20"), ("pb", "40"), ("pc", "99")],
            ),
            2,
        ),
    ]

    for step in range(10):
        op = rng.choice(
            ["write", "merge", "delete", "rollback", "compact", "pcompact",
             "rename", "adddrop", "repartition"]
        )
        if op == "repartition":
            from olap_storage_engine_spark.operators.compaction import (
                repartition_table,
            )

            pol, nb = alt_layouts[step % 2]
            repartition_table(
                t,
                new_partition=pol,
                new_bucket=BucketSpec(BucketType.HASH, "k", nb),
            )
            # the rewrite spans [0, max]: like compact, earlier history
            # boundaries are erased (rollback below them would refuse)
            history = [dict(model)]
            check()
            continue
        if op == "rename":
            # non-additive evolution interleaved with MVCC: old rowset
            # generations keep the old physical name; every read after
            # this (including post-rollback covers) must serve the new
            new = f"v{step}_{seed}"
            t.rename_column(vcol[0], new)
            vcol[0] = new
            # metadata-only: no data version advances, so no history
            # snapshot — rollback indexes stay aligned with versions
        elif op == "adddrop":
            # add a throwaway column, write a batch carrying it, drop
            # it again — surviving reads must never surface it, and the
            # batch's (k, v) data must still serve
            aux = f"aux{step}"
            t.add_column(ColumnSpec.value(aux, ColumnType.INT64))
            batch = [(k, rng.randrange(100)) for k in rng.sample(KEYS, 4)]
            t.write(
                spark.createDataFrame(
                    [(k, float(v), k) for k, v in batch],
                    f"k long, {vcol[0]} double, {aux} long",
                )
            )
            model.update({k: float(v) for k, v in batch})
            history.append(dict(model))
            t.drop_column(aux)
        elif op == "write":
            batch = [(k, rng.randrange(100)) for k in rng.sample(KEYS, rng.randrange(1, 8))]
            t.write(spark_df(batch))
            model.update({k: float(v) for k, v in batch})
            history.append(dict(model))
        elif op == "merge":
            batch = [(k, rng.randrange(100, 200)) for k in rng.sample(KEYS, rng.randrange(1, 6))]
            merge_into(t, spark_df(batch))
            model.update({k: float(v) for k, v in batch})
            history.append(dict(model))
        elif op == "delete":
            lo = rng.randrange(10, 55)
            hi = lo + rng.randrange(1, 10)
            delete_where(t, F.col("k").between(lo, hi))
            for k in [k for k in model if lo <= k <= hi]:
                del model[k]
            history.append(dict(model))
        elif op == "rollback":
            if len(history) < 2:
                continue
            to = rng.randrange(0, len(history) - 1)
            try:
                t.rollback(to)
            except VersionGraphError:
                continue  # spanning rowset (post-compaction): refused
            model = dict(history[to])
            history = history[: to + 1]
        elif op == "compact":
            compact(t)
            # compaction collapses [0, max+1] into one spanning rowset;
            # results invariant, history boundaries partially erased
            history = [dict(model)]
        elif op == "pcompact":
            compact_partitions(t, [rng.choice(LABELS)])
            # scoped compaction spans [0, max] for that label's chain:
            # earlier rollback boundaries may now refuse — model keeps
            # history; rollback op above tolerates the refusal
            history.append(dict(model))
        check()
