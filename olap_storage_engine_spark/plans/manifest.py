"""MVCC version manifest — rowset publish, snapshot covers, staleness.

Re-implements the *semantics* of the reference's tablet/rowset version
layer (reference: src/meta.rs:80-141 RowsetMeta, src/tablet.rs:14-69
VersionGraph + BFS cover, src/tablet.rs:116-165 publish/stale) as a
small driver-side Python module over a JSON manifest file that lives
next to the table's Parquet data.

Scale posture: the manifest is metadata-only (one JSON doc per table,
O(#rowsets) in size) and is read/written on the driver; executors only
ever see the resolved list of Parquet paths.  This is the same division
of labor as Delta/Iceberg metadata vs data, at 1/1000 the complexity —
at 100 TB the manifest for a 10k-rowset table is still <10 MB of JSON.

Concurrency model: SINGLE WRITER per table, the same contract as the
reference's per-tablet meta (one owner mutates a tablet's version
graph).  Concurrent readers are safe — the JSON is rewritten
atomically per publish and snapshot reads resolve from an in-memory
copy.  Multi-writer coordination (CAS on the manifest file, a
metastore, or a log) is deployment infrastructure the engine
deliberately leaves to the catalog layer, exactly as Delta does with
its LogStore.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from dataclasses import dataclass, field
from enum import Enum


class RowsetState(str, Enum):
    """reference: src/meta.rs:85.  PREPARED rowsets have data on disk
    but are invisible to reads until committed (two-phase publish);
    VISIBLE rowsets form the version graph; STALE ones await GC.  (The
    reference also declares Committed but never reaches it — SURVEY
    §1.1; prepare->visible is the observable machine.)"""

    PREPARED = "PREPARED"
    VISIBLE = "VISIBLE"
    STALE = "STALE"


@dataclass
class RowsetMeta:
    """An immutable data bundle covering versions [start, end]
    (reference: src/meta.rs:90-121)."""

    rowset_id: int
    start_version: int
    end_version: int
    path: str  # directory of parquet files, relative to the table root
    num_rows: int = 0
    data_size: int = 0
    state: RowsetState = RowsetState.VISIBLE
    created_at: float = 0.0
    # True when this rowset's files physically hold the keys-model
    # collapsed data (written by compaction) — reads of a single
    # collapsed rowset skip the merge-on-read work entirely
    collapsed: bool = False

    def __post_init__(self) -> None:
        self.state = RowsetState(self.state)
        if self.start_version > self.end_version:
            raise ValueError(
                f"rowset {self.rowset_id}: start {self.start_version} > "
                f"end {self.end_version}"
            )

    @property
    def span(self) -> int:
        return self.end_version - self.start_version + 1

    def to_dict(self) -> dict:
        return {
            "rowset_id": self.rowset_id,
            "start_version": self.start_version,
            "end_version": self.end_version,
            "path": self.path,
            "num_rows": self.num_rows,
            "data_size": self.data_size,
            "state": self.state.value,
            "created_at": self.created_at,
            "collapsed": self.collapsed,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "RowsetMeta":
        return cls(**{**d, "state": RowsetState(d.get("state", "VISIBLE"))})


class VersionGraphError(Exception):
    """Raised on version holes or invalid publishes."""


class VersionGraph:
    """Version-interval cover resolution (reference: src/tablet.rs:14-69).

    Model: each VISIBLE rowset [s, e] is an edge s -> e+1 in a DAG over
    version boundaries.  A consistent snapshot of [lo, hi] is a path
    lo -> hi+1; the BFS prefers largest-span edges first so compacted
    rowsets win over the base rowsets they replace, yielding the
    minimal file set (reference: src/tablet.rs:38-65, largest-span
    ordering at :47-48).
    """

    def __init__(self, rowsets: list[RowsetMeta]):
        self.edges: dict[int, list[RowsetMeta]] = {}
        for rs in rowsets:
            if rs.state == RowsetState.VISIBLE:
                self.edges.setdefault(rs.start_version, []).append(rs)
        for outs in self.edges.values():
            outs.sort(key=lambda r: -r.span)

    def find_covering_path(self, lo: int, hi: int) -> list[RowsetMeta] | None:
        """BFS for a path lo -> hi+1; None when a hole exists."""
        target = hi + 1
        best: dict[int, list[RowsetMeta]] = {lo: []}
        q: deque[int] = deque([lo])
        while q:
            node = q.popleft()
            if node == target:
                return best[node]
            for rs in self.edges.get(node, []):
                nxt = rs.end_version + 1
                if nxt <= target and nxt not in best:
                    best[nxt] = best[node] + [rs]
                    q.append(nxt)
        return best.get(target)

    def has_version_holes(self, lo: int, hi: int) -> bool:
        """reference: src/tablet.rs:67-69."""
        return self.find_covering_path(lo, hi) is None


class Manifest:
    """Per-table manifest: spec + rowsets + max_version, persisted as
    ``_manifest.json`` in the table root directory.

    Single-writer by design (the reference is likewise a single-process
    engine); multi-writer atomicity would be the one reason to swap
    this for Delta Lake (SURVEY §7.1 decision).
    """

    FILENAME = "_manifest.json"

    def __init__(self, table_root: str, doc: dict | None = None):
        self.table_root = table_root
        self.doc = doc or {
            "rowsets": [],
            "max_version": -1,
            "next_rowset_id": 1,
            # boundary between base data and the cumulative layer
            # (reference: src/meta.rs:139 cumulative_layer_point — a
            # write-only field there; advanced by compaction here)
            "cumulative_layer_point": 0,
        }

    # -- persistence ---------------------------------------------------
    @property
    def path(self) -> str:
        return os.path.join(self.table_root, self.FILENAME)

    @classmethod
    def load(cls, table_root: str) -> "Manifest":
        with open(os.path.join(table_root, cls.FILENAME)) as f:
            return cls(table_root, json.load(f))

    def save(self) -> None:
        os.makedirs(self.table_root, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.doc, f, indent=1)
        os.replace(tmp, self.path)  # atomic on POSIX

    # -- rowset accounting ---------------------------------------------
    def rowsets(self) -> list[RowsetMeta]:
        return [RowsetMeta.from_dict(d) for d in self.doc["rowsets"]]

    def visible_rowsets(self) -> list[RowsetMeta]:
        return [r for r in self.rowsets() if r.state == RowsetState.VISIBLE]

    @property
    def max_version(self) -> int:
        return self.doc["max_version"]

    @property
    def cumulative_layer_point(self) -> int:
        return self.doc.get("cumulative_layer_point", 0)

    @cumulative_layer_point.setter
    def cumulative_layer_point(self, v: int) -> None:
        self.doc["cumulative_layer_point"] = v
        self.save()

    def next_rowset_id(self) -> int:
        rid = self.doc.get("next_rowset_id", 1)
        self.doc["next_rowset_id"] = rid + 1
        return rid

    def publish(self, rs: RowsetMeta) -> None:
        """Commit a rowset (reference: src/storage.rs:79-87 +
        src/tablet.rs:116-128): reject duplicate ids, mark VISIBLE,
        extend the graph, bump max_version."""
        if any(d["rowset_id"] == rs.rowset_id for d in self.doc["rowsets"]):
            raise VersionGraphError(f"duplicate rowset id {rs.rowset_id}")
        rs.state = RowsetState.VISIBLE
        rs.created_at = rs.created_at or time.time()
        self.doc["rowsets"].append(rs.to_dict())
        self.doc["max_version"] = max(self.max_version, rs.end_version)
        self.save()

    def prepare(self, rs: RowsetMeta) -> None:
        """Two-phase publish, phase 1: record the rowset with data on
        disk but invisible to reads (excluded from the version graph)."""
        if any(d["rowset_id"] == rs.rowset_id for d in self.doc["rowsets"]):
            raise VersionGraphError(f"duplicate rowset id {rs.rowset_id}")
        rs.state = RowsetState.PREPARED
        rs.created_at = rs.created_at or time.time()
        self.doc["rowsets"].append(rs.to_dict())
        self.save()

    def commit_rowset(self, rowset_id: int) -> None:
        """Two-phase publish, phase 2: PREPARED -> VISIBLE, extend the
        graph, bump max_version."""
        for d in self.doc["rowsets"]:
            if d["rowset_id"] == rowset_id:
                if d["state"] != RowsetState.PREPARED.value:
                    raise VersionGraphError(
                        f"rowset {rowset_id} is {d['state']}, not PREPARED"
                    )
                d["state"] = RowsetState.VISIBLE.value
                self.doc["max_version"] = max(
                    self.max_version, d["end_version"]
                )
                self.save()
                return
        raise VersionGraphError(f"rowset {rowset_id} not found")

    def mark_stale(self, rowset_id: int) -> None:
        """reference: src/tablet.rs:155-165."""
        for d in self.doc["rowsets"]:
            if d["rowset_id"] == rowset_id:
                d["state"] = RowsetState.STALE.value
                self.save()
                return
        raise VersionGraphError(f"rowset {rowset_id} not found")

    # -- snapshot reads -------------------------------------------------
    def capture_consistent_versions(
        self, lo: int = 0, hi: int | None = None
    ) -> list[RowsetMeta]:
        """Resolve the minimal VISIBLE rowset cover of [lo, hi]
        (reference: src/tablet.rs:131-144); raises on holes."""
        if hi is None:
            hi = self.max_version
        if hi < lo:
            return []
        cover = VersionGraph(self.rowsets()).find_covering_path(lo, hi)
        if cover is None:
            raise VersionGraphError(
                f"version hole: no consistent cover for [{lo}, {hi}]"
            )
        return cover

    def compaction_score(self) -> int:
        """Count of VISIBLE rowsets (reference: src/tablet.rs:147-152)."""
        return len(self.visible_rowsets())
