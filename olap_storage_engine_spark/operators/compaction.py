"""Compaction — scoring, scheduling, and the rewrite itself.

reference: src/tablet.rs:147-152 (score = count of VISIBLE rowsets),
src/storage.rs:92-99 (rank all tablets, take top 10),
src/common.rs:63 + README "不可变 Rowset" (rewrite semantics: new rowset
covering the merged [start, end]; old rowsets become STALE).  The
reference implements scoring + stale-marking only; the rewrite here is
the *intended* semantics made real — and it applies the keys-model
collapse physically (merge-on-write), so post-compaction reads skip the
merge-on-read work entirely.

Scale posture: compaction is an executor-side rewrite (read cover ->
collapse -> write), scheduled driver-side from manifest metadata alone.
At 100 TB you run it per-partition: the version cover is resolved once,
but the rewrite job's shuffle is partition-parallel and incremental
(compact the top-K highest-scoring tables/partitions per round, exactly
the reference's top-10 policy).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from ..plans.manifest import RowsetState
from ..table import OlapTable

DEFAULT_CANDIDATES = 10  # reference: src/storage.rs:96


@dataclass
class CompactionTask:
    table_name: str
    score: int


def compute_compaction_score(table: OlapTable) -> int:
    """reference: src/tablet.rs:147-152."""
    return table.manifest.compaction_score()


def schedule_compaction(
    tables: list[OlapTable], top_k: int = DEFAULT_CANDIDATES
) -> list[CompactionTask]:
    """Rank candidates by score descending, take the top K
    (reference: src/storage.rs:92-99, src/tablet.rs:223-236)."""
    scored = sorted(
        (CompactionTask(t.spec.name, compute_compaction_score(t)) for t in tables),
        key=lambda c: -c.score,
    )
    return scored[: top_k]


def compact(table: OlapTable, lo: int = 0, hi: int | None = None) -> None:
    """Rewrite the version cover [lo, hi] into one rowset.

    Reads the cover, applies the keys-model collapse physically, writes
    a single new rowset spanning the merged interval (flagged
    ``collapsed`` so steady-state reads skip merge-on-read), then marks
    the old cover STALE (reference: src/tablet.rs:155-165).  Query
    results are invariant under compaction — pinned by tests.
    """
    if hi is None:
        hi = table.manifest.max_version
    cover = table.manifest.capture_consistent_versions(lo, hi)
    if len(cover) <= 1:
        return  # nothing to merge
    merged = table.read(lo, hi)
    # The collapsed result is version-stamped at `hi` on write; the new
    # rowset covers [lo, hi] so existing snapshots keep resolving.
    table.write(merged, start_version=lo, end_version=hi, collapsed=True)
    for rs in cover:
        table.manifest.mark_stale(rs.rowset_id)


def compact_cumulative(table: OlapTable) -> None:
    """Cumulative compaction (reference: src/common.rs:63 Cumulative +
    src/meta.rs:139 cumulative_layer_point, write-only there): merge
    only the rowsets ABOVE the cumulative layer point — the recent
    small ingests — then advance the point past them.  Base data below
    the point is untouched, so the frequent compaction job stays small.
    """
    clp = table.manifest.cumulative_layer_point
    hi = table.manifest.max_version
    if hi < clp:
        return
    compact(table, clp, hi)
    table.manifest.cumulative_layer_point = hi + 1


def compact_base(table: OlapTable) -> None:
    """Base compaction (reference: src/common.rs:63 Base): merge
    everything below the cumulative layer point into one base rowset —
    the infrequent heavy job."""
    clp = table.manifest.cumulative_layer_point
    if clp <= 0:
        return
    compact(table, 0, clp - 1)


def garbage_collect(
    table: OlapTable,
    prepared_ttl_sec: float | None = 24 * 3600.0,
    now: float | None = None,
) -> list[str]:
    """Delete the data directories of STALE rowsets (the reference only
    marks GC intent; physical deletion is deferred — we do both), and
    abort orphaned two-phase publishes: a PREPARED rowset older than
    ``prepared_ttl_sec`` is a crashed phase-1 write whose committer is
    never coming back — it's marked STALE and reclaimed with the rest.
    Pass ``prepared_ttl_sec=None`` to leave PREPARED rowsets alone."""
    import os
    import shutil
    import time

    if now is None:
        now = time.time()
    removed = []
    for rs in table.manifest.rowsets():
        if (
            rs.state == RowsetState.PREPARED
            and prepared_ttl_sec is not None
            and now - rs.created_at > prepared_ttl_sec
        ):
            table.manifest.mark_stale(rs.rowset_id)
            rs.state = RowsetState.STALE
        if rs.state == RowsetState.STALE:
            d = os.path.join(table.root, rs.path)
            if os.path.exists(d):
                shutil.rmtree(d)
                removed.append(rs.path)
    return removed


def merge_into(table: OlapTable, source, key_cols: list[str] | None = None):
    """MERGE INTO — copy-on-write upsert, the DML sibling of
    ``delete_where``:

    * rows whose key tuple matches a source row take the SOURCE row
      (update),
    * target rows with no source match survive unchanged,
    * source rows with a new key tuple are inserted,

    all in ONE rewrite: the current collapsed snapshot anti-joined
    against the source keys, unioned with the source, written as a
    single collapsed rowset covering [0, max_version + 1].  Like
    DELETE, the merge is an MVCC event — every prior snapshot
    (``read(0, v)`` / ``read_as_of``) still resolves to the untouched
    old rowsets (pinned by tests).

    The reference declares exactly these semantics in its Unique keys
    model (src/common.rs:40-41 — "equal key tuple collapses to the
    latest version's row") but has no targeted DML; on a UNIQUE table a
    plain ``write(source)`` is already an upsert *at read time* — this
    operator is the compacted form: post-merge reads take the
    single-collapsed-rowset fast path instead of merge-on-read.

    Precondition: ``source`` has one row per key tuple and the target's
    exact column set.  Scale: one key-shuffle (or broadcast, when the
    source is dim-sized — Catalyst decides) anti-join plus the rewrite;
    at 100 TB run it per-partition like compaction, touching only
    partitions the source keys route to.

    Returns the published RowsetMeta of the merged rowset.
    """
    if key_cols is None:
        key_cols = table.spec.key_names()
    hi = table.manifest.max_version
    current = table.read(0, hi)
    src = source.select(*current.columns)
    remaining = current.join(
        src.select(*key_cols), on=key_cols, how="anti"
    )
    merged = remaining.unionByName(src)
    return table.write(
        merged, start_version=0, end_version=hi + 1, collapsed=True
    )


def delete_where(table: OlapTable, predicate) -> int:
    """Row-level DELETE as a copy-on-write rewrite — beyond the
    reference (which has no delete path at all), following the
    Doris-family semantics its data model implies: the surviving rows
    are written as ONE new rowset covering [0, max_version + 1], so

    * reads at the new version see the deletion,
    * every prior snapshot (``read(0, v)`` / ``read_as_of``) still
      resolves to the untouched old rowsets — deletes are MVCC events,
      not in-place mutations;
    * the old cover is left VISIBLE for time travel and reclaimed by
      normal compaction/GC policy later.

    Returns the number of rows deleted.  Scale: one filter-rewrite job
    over the current cover (executor-side); at 100 TB run it
    per-partition like compaction.

    NULL semantics match SQL DELETE: only rows where the predicate is
    TRUE are removed — rows where it evaluates to NULL (e.g. a null
    column under ``>``) survive, which plain ``filter(~predicate)``
    would silently drop.
    """
    hi = table.manifest.max_version
    current = table.read(0, hi)
    n_before = current.count()
    remaining = current.filter(~(predicate.eqNullSafe(F.lit(True))))
    rs = table.write(
        remaining, start_version=0, end_version=hi + 1, collapsed=True
    )
    return n_before - rs.num_rows
