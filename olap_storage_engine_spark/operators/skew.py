"""Skew-mitigation operators: salted join and salted aggregation.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime by splitting oversized partitions, but it only works
for sort-merge joins after a shuffle materializes; salting is the
plan-level tool when one join key dominates so heavily that even a
split partition's build side won't fit, or when the engine must bound
worst-case memory BEFORE runtime.  The classic recipe:

* left (large, skewed) side: append a deterministic salt in
  [0, salt_factor) derived by hashing a high-cardinality column — the
  hot key's rows spread over ``salt_factor`` reducers;
* right (smaller) side: replicate each row once per salt value
  (explode over sequence) so every salted left row still finds its
  match;
* join on (key, salt); drop the salt.

Cost: right side × salt_factor — use for moderate dimension sides
where broadcast is too big but replication is affordable.  Results are
bit-identical to the unsalted join (tests assert it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt_factor: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the join key salted ``salt_factor`` ways.

    ``salt_source`` names a left column used to derive the
    deterministic salt (defaults to the first join key — fine when the
    skew is in VALUES per key, e.g. a hot key with many rows spread by
    another attribute; pass a row-unique column like an id for the
    general case).

    Only inner and left joins are supported: the replicated right side
    would emit each unmatched right row ``salt_factor`` times under
    right/full outer joins."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the right side is "
            "replicated per salt, so right/full outer results diverge"
        )
    keys = [on] if isinstance(on, str) else list(on)
    src = salt_source or keys[0]
    l_salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(src)), F.lit(salt_factor))
    )
    # no cast around the explode (generators can't nest in expressions);
    # the int/long mismatch on the salt key coerces in the join condition
    r_salted = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return l_salted.join(r_salted, [*keys, SALT_COL], how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_factor: int = 8,
) -> DataFrame:
    """Two-stage aggregation with an explicit salt: partial aggregate
    on (keys, salt), final aggregate on keys.  Spark's hash aggregate
    already does map-side partials for algebraic functions, so this is
    only for aggregates where the partial state per hot key exceeds a
    task (e.g. collect-like states); supported re-aggregations: sum,
    min, max, count (count re-aggregates as sum)."""
    refold = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}
    for fn in aggs.values():
        if fn not in refold:
            raise ValueError(f"salted_agg: {fn} does not compose")
    # any salt assignment yields the same final result; seeded rand is
    # cheap and spreads a hot key's rows uniformly
    salted = df.withColumn(
        SALT_COL, F.floor(F.rand(seed=0) * salt_factor).cast("int")
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, refold[fn])(f"__p_{c}").alias(c)
            for c, fn in aggs.items()
        ]
    )
