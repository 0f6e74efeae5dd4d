"""Model-based randomized testing of the schema-evolution surface:
random chains of add / drop / rename / widen (including re-adding a
dropped name at a different type) interleaved with writes, applied to
BOTH an OlapTable and an in-memory column model, with full-read
equivalence checked after every op.  Complements test_mvcc_model
(which randomizes the DML/MVCC surface with light evolution) by
stressing DEEP evolution chains across many rowset generations."""

import random

import pytest
from pyspark.sql import functions as F

from olap_storage_engine_spark.spec import (
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable

_TYPES = {
    ColumnType.INT64: ("long", lambda rng: rng.randrange(-(2**40), 2**40)),
    ColumnType.FLOAT64: ("double", lambda rng: float(rng.randrange(1000))),
    ColumnType.VARCHAR: ("string", lambda rng: f"s{rng.randrange(100)}"),
    ColumnType.INT32: ("int", lambda rng: rng.randrange(-(2**30), 2**30)),
}


@pytest.mark.parametrize("seed", [11, 57, 203])
def test_random_evolution_chains_match_model(spark, warehouse, seed):
    rng = random.Random(seed)
    spec = TableSpec(
        name=f"evo_{seed}",
        columns=[
            ColumnSpec.key("k", ColumnType.INT64),
            ColumnSpec.value("v", ColumnType.FLOAT64),
        ],
        keys_type=KeysType.DUPLICATE,
    )
    t = OlapTable.create(spark, spec, warehouse, overwrite=True)
    # model: ordered {current_name: ColumnType} for value columns, and
    # per-row dicts keyed by the CURRENT column names at write time —
    # the read must serve them under the names/types of the final
    # schema, nulls where a column didn't exist yet
    cols: dict = {"v": ColumnType.FLOAT64}
    rows: list[dict] = []  # each: {"k": int, <value colname>: value}
    next_k = [0]
    fresh = [0]
    dropped: list = []  # (name, old_type) available for re-add

    def write_batch():
        n = rng.randrange(1, 5)
        batch = []
        for _ in range(n):
            row = {"k": next_k[0]}
            next_k[0] += 1
            for name, ct in cols.items():
                row[name] = _TYPES[ct][1](rng)
            batch.append(row)
        schema = ", ".join(
            ["k long"] + [f"{n2} {_TYPES[ct][0]}" for n2, ct in cols.items()]
        )
        t.write(
            spark.createDataFrame(
                [tuple(r[c] for c in ["k", *cols]) for r in batch], schema
            )
        )
        # remember values under the CURRENT names; renames remap later
        rows.extend(batch)

    def check():
        want_cols = {"k", *cols}
        df = t.read()
        assert set(df.columns) == want_cols, (df.columns, want_cols)
        got = {r["k"]: {c: r[c] for c in cols} for r in df.collect()}
        want = {
            r["k"]: {c: r.get(c) for c in cols} for r in rows
        }
        assert got == want

    write_batch()
    check()
    for step in range(12):
        op = rng.choice(
            ["write", "add", "drop", "rename", "widen", "readd"]
        )
        if op == "readd":
            # the hard case: a DROPPED name re-added at a DIFFERENT
            # type — old generations' stale bytes must never leak
            cand = [
                (n, ct) for n, ct in dropped if n not in cols
            ]
            if not cand:
                continue
            name, old_ct = rng.choice(cand)
            choices = [
                ct
                for ct in (
                    ColumnType.INT64,
                    ColumnType.VARCHAR,
                    ColumnType.FLOAT64,
                )
                if ct != old_ct
            ]
            ct = rng.choice(choices)
            t.add_column(ColumnSpec.value(name, ct))
            cols[name] = ct
            check()
            continue
        if op == "write":
            write_batch()
        elif op == "add":
            name = f"c{fresh[0]}"
            fresh[0] += 1
            ct = rng.choice(
                [ColumnType.INT64, ColumnType.VARCHAR, ColumnType.INT32]
            )
            t.add_column(ColumnSpec.value(name, ct))
            cols[name] = ct
        elif op == "drop":
            droppable = [c for c in cols if len(cols) > 1]
            if not droppable:
                continue
            name = rng.choice(droppable)
            t.drop_column(name)
            dropped.append((name, cols[name]))
            del cols[name]
            for r in rows:
                r.pop(name, None)
        elif op == "rename":
            name = rng.choice(list(cols))
            new = f"r{fresh[0]}"
            fresh[0] += 1
            t.rename_column(name, new)
            cols[new] = cols.pop(name)
            for r in rows:
                if name in r:
                    r[new] = r.pop(name)
        elif op == "widen":
            widenable = [
                c for c, ct in cols.items() if ct == ColumnType.INT32
            ]
            if not widenable:
                continue
            name = rng.choice(widenable)
            t.widen_column(name, ColumnType.INT64)
            cols[name] = ColumnType.INT64
        check()
    # the final table reloads from its sidecar and replays identically
    t2 = OlapTable.load(spark, warehouse, f"evo_{seed}")
    assert set(t2.read().columns) == {"k", *cols}
    assert t2.read().count() == len(rows)
