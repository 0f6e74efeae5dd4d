"""Rollup (materialized pre-aggregation) routing — reference A15.

The reference declares ``rollup_indexes`` per partition
(src/partition.rs:75,88-89) — alternate pre-aggregated projections with
a coarser key set — but never populates or routes to them.  Here both
halves are real: a rollup is an AGGREGATE-model OlapTable derived from
a base table (built in fixtures / by the user), and ``route_read``
picks the best materialization for a requested key subset the way a
Doris query planner picks a rollup index: the table with the FEWEST key
columns that still covers the requested keys (coarser = less data to
re-aggregate).

Routing is correct only for re-aggregatable value semantics
(SUM/MIN/MAX compose; REPLACE does not — those columns disqualify a
rollup unless the requested keys equal its full key set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..spec import AggregateType, KeysType
from ..table import OlapTable


def covers(table: OlapTable, group_keys: list[str]) -> bool:
    """Can this materialization answer a group-by on ``group_keys``?"""
    keys = set(table.spec.key_names())
    if not set(group_keys) <= keys:
        return False
    if set(group_keys) == keys:
        return True
    # strict subset -> values will be re-aggregated; only associative
    # aggregate types survive a second collapse
    reagg_ok = {AggregateType.SUM, AggregateType.MIN, AggregateType.MAX}
    return all(
        AggregateType(c.aggregate_type) in reagg_ok
        for c in table.spec.value_columns()
    )


def route_read(
    candidates: list[OlapTable], group_keys: list[str]
) -> OlapTable:
    """Pick the coarsest covering materialization (fewest key columns);
    raises if none covers."""
    viable = [t for t in candidates if covers(t, group_keys)]
    if not viable:
        raise ValueError(
            f"no materialization covers group keys {group_keys}"
        )
    return min(viable, key=lambda t: len(t.spec.key_names()))


def rollup_read(
    candidates: list[OlapTable],
    group_keys: list[str],
    range_lo: str | None = None,
    range_hi: str | None = None,
    in_values: list | None = None,
) -> DataFrame:
    """Routed read: collapse view of the chosen materialization, ready
    for the caller's groupBy(group_keys).

    Pruning bounds pass straight through to ``read_pruned`` so a routed
    read keeps the base table's partition-directory pruning — without
    this, a one-year read of a RANGE-partitioned rollup lists every
    partition (reference: src/partition.rs:172-189 routes reads AND
    writes through find_partition; so do we)."""
    chosen = route_read(candidates, group_keys)
    if range_lo is None and range_hi is None and in_values is None:
        return chosen.read()
    return chosen.read_pruned(
        range_lo=range_lo, range_hi=range_hi, in_values=in_values
    )


def join_mv_delta_refresh(
    fact: OlapTable,
    dim: DataFrame,
    mv: OlapTable,
    lo: int,
    hi: int,
    on,
) -> None:
    """Incremental JOIN materialized-view maintenance — the
    denormalization twin of ``rollup_delta_refresh``: the MV holds the
    fact PRE-JOINED to a dimension, and each fact publish appends only
    ``delta_fact ⋈ dim`` (one broadcast join over the delta, never a
    re-join of the full fact).  Because the MV is a DUPLICATE-model
    table and fact rowsets are disjoint by version, the refreshed MV
    equals a from-scratch join by construction (pinned by
    tests/test_rollup.py).

    Contract: APPEND-ONLY facts and a STATIC dimension (the
    star-schema norm — dims change by slowly-rewriting partitions; a
    dim update rewrites the affected MV partitions or rebuilds, same
    caveat as shingle_index_delta_refresh).  ``on`` is the join
    condition or column name; the dim side is broadcast — dimension
    tables are broadcast-sized at any fact scale.

    At 100 TB this converts every serving-path fact⋈dim shuffle into
    a publish-time broadcast over the delta: queries against the MV
    scan pre-joined rows with zero exchanges before aggregation.

    CRASH-SAFE and IDEMPOTENT: the refresh publishes with
    ``txn=("mv:"+fact_name, hi)`` — the refreshed-through fact
    version commits in the SAME manifest CAS as the MV rowset (the
    stream_ingest epoch pattern), so a replayed refresh of an
    already-applied interval is a no-op and ``mv_staleness`` can
    always answer "how far behind the fact is this MV".
    """
    from pyspark.sql import functions as F

    if _mv_already_refreshed(fact, mv, hi):
        return
    _mv_check_contiguous(fact, mv, lo)
    delta = fact.read(lo, hi)
    joined = delta.join(F.broadcast(dim), on)
    mv.write(
        joined.select(*[c.name for c in mv.spec.columns]),
        txn=(_mv_source_id(fact), hi),
    )


def _mv_source_id(fact: OlapTable) -> str:
    return f"mv:{fact.spec.name}"


def _mv_already_refreshed(fact: OlapTable, mv: OlapTable, hi: int) -> bool:
    done = mv.manifest.committed_epoch(_mv_source_id(fact))
    return done is not None and hi <= done


def _mv_check_contiguous(fact: OlapTable, mv: OlapTable, lo: int) -> None:
    """The epoch record is a single high watermark, so refresh
    intervals MUST arrive contiguously: committing [5,5] before [3,4]
    would record "refreshed through 5" and silently no-op the skipped
    versions forever; re-running [2,5] when 3 is committed would
    re-apply versions 2-3 (double-count on an AGGREGATE MV).  Both are
    caller bugs the watermark cannot represent — fail loud instead."""
    done = mv.manifest.committed_epoch(_mv_source_id(fact))
    committed = int(done) if done is not None else -1
    if lo != committed + 1:
        raise ValueError(
            f"non-contiguous MV refresh: committed through version "
            f"{committed}, refresh starts at {lo} — intervals must be "
            f"applied in publish order (expected lo={committed + 1}); "
            "a gap would be recorded as refreshed, an overlap would "
            "double-apply"
        )


def mv_refreshed_through(mv: OlapTable, fact: OlapTable) -> int:
    """Highest fact version whose refresh has committed into this MV
    (-1 if never refreshed — versions are 0-based, an empty table's
    max_version is -1) — read from the manifest's atomically
    maintained epoch record, never inferred from data."""
    done = mv.manifest.committed_epoch(_mv_source_id(fact))
    return int(done) if done is not None else -1


def mv_staleness(mv: OlapTable, fact: OlapTable) -> int:
    """How many published fact versions this MV has not absorbed —
    the ops signal behind "is my MV current?".  0 = fresh."""
    cur = fact.manifest.max_version
    return max(0, cur - mv_refreshed_through(mv, fact))


def join_agg_mv_delta_refresh(
    fact: OlapTable,
    dim: DataFrame,
    mv: OlapTable,
    lo: int,
    hi: int,
    on,
    agg_exprs: list,
) -> None:
    """Incremental AGGREGATE-over-JOIN materialized view — the classic
    async-MV shape (a pre-aggregated star join), composing the two
    existing disciplines: each fact publish joins ONLY the delta to
    the broadcast dim (``join_mv_delta_refresh``) and writes the
    delta's PARTIAL aggregate into an AGGREGATE-model table whose
    keys-model collapse merges partials at read time
    (``rollup_delta_refresh``) — the refresh is just a write, no
    read-modify-write, and the MV stays queryable throughout.

    ``agg_exprs`` are the partial aggregates, aliased to the MV's
    value columns; they must be associative (SUM/MIN/MAX — the
    ``covers`` rule).  Exactness discipline: sum money as integer
    micro-units (decimal-per-row, scaled, cast long) so merging
    partials is exact integer math — no float-summation order between
    partial and collapse can perturb the checked value.

    At 100 TB the serving read scans |group keys| pre-aggregated rows
    per publish (merged by collapse), never the fact; refresh cost is
    one broadcast join + one combine aggregate over the delta.
    Crash-safe/idempotent via the same epoch txn as
    ``join_mv_delta_refresh`` — an AGGREGATE-model MV double-applying
    a replayed partial would silently DOUBLE-COUNT, so the epoch skip
    is load-bearing here, not just an optimization."""
    from pyspark.sql import functions as F

    if _mv_already_refreshed(fact, mv, hi):
        return
    _mv_check_contiguous(fact, mv, lo)
    delta = fact.read(lo, hi)
    joined = delta.join(F.broadcast(dim), on)
    keys = mv.spec.key_names()
    mv.write(
        joined.groupBy(*keys).agg(*agg_exprs),
        txn=(_mv_source_id(fact), hi),
    )


def rollup_delta_refresh(
    base: OlapTable, rollup: OlapTable, lo: int, hi: int
) -> None:
    """Incremental rollup maintenance: aggregate ONLY the base rowsets
    covering versions [lo, hi] and publish the partial as a new rollup
    rowset.  Because the rollup is an AGGREGATE-model table with
    associative value semantics, its own collapse view (and the next
    compaction) merges the partial into the existing state — the
    incremental refresh IS just a write, no read-modify-write cycle,
    no locking, and the rollup stays queryable throughout.

    At 100 TB this is the difference between re-aggregating the full
    base per refresh and touching only the newly-published delta.
    REPLACE-typed value columns don't compose across partials and are
    rejected (same rule as read routing in ``covers``)."""
    from pyspark.sql import functions as F

    fns = {
        AggregateType.SUM: F.sum,
        AggregateType.MIN: F.min,
        AggregateType.MAX: F.max,
    }
    aggs = []
    for c in rollup.spec.value_columns():
        at = AggregateType(c.aggregate_type)
        if at not in fns:
            raise ValueError(
                f"rollup column {c.name}: {at} does not compose "
                "across incremental partials"
            )
        aggs.append(fns[at](c.name).alias(c.name))
    delta = base.read(lo, hi)
    rollup.write(delta.groupBy(*rollup.spec.key_names()).agg(*aggs))
