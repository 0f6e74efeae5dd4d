"""Change-data-capture between MVCC snapshots.

The engine's version graph (plans/manifest.py, mirroring the
reference's rowset-version model in src/tablet.rs:38-65) keeps every
published snapshot readable — time travel (``read_as_of``/``read(0,
v)``) is already a declared query.  CDC is the derivative of that
surface: *what changed between two snapshots*, emitted as typed change
rows — what a downstream consumer (an index refresh, a replication
feed, an incremental training-data pipeline) actually wants on each
publish.

Defined for UNIQUE/AGGREGATE-key tables, where the key tuple gives row
identity across versions:

* key in new only                  -> ``insert``
* key in old only                  -> ``delete``
* key in both, any value differs   -> ``update`` (new values)
* key in both, all values equal    -> (not emitted)

Scale shape: ONE key-partitioned full-outer join of the two collapsed
snapshots — both sides hash-shuffle on the key (co-partitioned, so the
join itself is local), value comparison is row-local, and nothing is
collected.  At 100 TB the common case is v_from/v_to one publish
apart, where the new-side cover is the delta rowsets plus the keys
they touch — the join stays proportional to the snapshots, never to
history depth.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..spec import KeysType
from ..table import OlapTable


def snapshot_changes(
    table: OlapTable, v_from: int, v_to: int
) -> DataFrame:
    """Typed change feed between snapshot ``v_from`` and snapshot
    ``v_to`` (both inclusive version upper bounds, as in ``read``).

    Returns (change_op, *key_cols, *value_cols): value columns carry
    the NEW values for insert/update and the OLD values for delete —
    the row a consumer needs to apply the change downstream.
    """
    keys = table.spec.key_names()
    if not keys:
        raise ValueError("snapshot_changes requires a keyed table")
    if table.spec.keys_type == KeysType.DUPLICATE:
        # Key tuples are not row identity on a DUPLICATE table — the
        # full-outer diff would silently go many-to-many.
        raise ValueError(
            "snapshot_changes is defined only for UNIQUE/AGGREGATE key "
            f"models; table {table.spec.name!r} is DUPLICATE"
        )
    cols = [c.name for c in table.spec.columns]
    vals = [c for c in cols if c not in keys]

    old = table.read(0, v_from)
    new = table.read(0, v_to)
    # Presence comes from literal marker columns, not key-isNotNull —
    # a genuinely-NULL key column (joined via eqNullSafe) would
    # otherwise misclassify the row as insert+delete.
    o = old.select(
        [F.col(c).alias(f"__o_{c}") for c in cols]
        + [F.lit(True).alias("__o_present")]
    )
    n = new.select(
        [F.col(c).alias(f"__n_{c}") for c in cols]
        + [F.lit(True).alias("__n_present")]
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")

    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    same_vals = (
        reduce(
            lambda a, b: a & b,
            [
                F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
                for c in vals
            ],
        )
        if vals
        else F.lit(True)
    )
    op = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same_vals, F.lit("update"))
    )
    picked = [
        F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k)
        for k in keys
    ] + [
        F.when(F.col("change_op") == "delete", F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in vals
    ]
    return (
        j.withColumn("change_op", op)
        .filter(F.col("change_op").isNotNull())
        .select("change_op", *picked)
    )
