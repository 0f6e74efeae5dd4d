"""A custom binary SEGMENT format + a first-class Spark Python
DataSource that reads it with footer validation, zone-map block
pruning, and key-range filter pushdown.

This is the Spark-4-idiomatic re-expression of the reference engine's
own read stack (reference parity: segment open/footer validation is
src/segment.rs A2; per-block min/max zone maps pruning key predicates
is the A16 zone-map idea; short-key block seek is A18) — instead of a
bespoke scan executor, the format plugs into Spark as a
`pyspark.sql.datasource.DataSource`, so Catalyst plans it, predicates
arrive through `pushFilters`, and block pruning happens at PARTITION
PLANNING time: pruned blocks are never scheduled, let alone read.

Layout (little-endian):

    header:  magic 'OSEG' | u32 version | u64 n_rows | u32 block_rows
    body:    fixed 22-byte records, doc_id-sorted:
             i64 doc_id | i32 n_chars | 2s lang | 8s source
    footer:  u32 n_blocks | n_blocks x (u64 start_row, u32 n,
             i64 min_id, i64 max_id) | u32 crc32(body) | magic 'GESO'

Fail-loud: bad magic (either end), truncated body, or a body CRC
mismatch raises ValueError at open — the reference's segment-open
contract.  The record width is fixed so a block's byte range is
computable from its row range; `read()` seeks straight to it.

At 100 TB the real engine tables are Parquet (TESTDATA through
OlapTable); this source exists to prove the extension surface: any
bespoke on-disk format the reference (or a migration from it) leaves
behind can be mounted as a Spark table with pushdown, without JVM
code.  Scale shape: one block = one InputPartition = one task;
`block_rows` plays `maxPartitionBytes`.

Since r11 the format also has a DISTRIBUTED WRITE path
(``OlapSegWriter``): each task writes one complete segment under a
temp name, the driver's two-phase commit renames them and publishes
``_SEG_MANIFEST.json`` with per-file (rows, min_id, max_id) zone
maps, and directory reads resolve files only through the manifest —
file-level pruning at planning time, block-level pruning in the task.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

MAGIC = b"OSEG"
END_MAGIC = b"GESO"
VERSION = 1
# committed-files manifest of a multi-segment DIRECTORY table (the
# distributed write path); carries per-file row counts and doc_id
# zone maps so the reader prunes whole FILES at planning time
MANIFEST_NAME = "_SEG_MANIFEST.json"
_REC = struct.Struct("<qi2s8s")
# the same 22-byte record as an (unaligned) numpy dtype, for the
# batch decode path — itemsize must equal _REC.size
_NP_REC = [("doc_id", "<i8"), ("n_chars", "<i4"),
           ("lang", "S2"), ("source", "S8")]
_HEADER = struct.Struct("<4sIQI")
_BLOCK = struct.Struct("<QIqq")

SEGMENT_SCHEMA = "doc_id bigint, n_chars bigint, lang string, source string"


def write_segment(rows, path: str, block_rows: int = 256) -> int:
    """Write (doc_id, n_chars, lang, source) tuples as ONE segment
    file.  Rows are sorted by doc_id (the short-key order that makes
    the zone maps selective).  Returns the number of rows written.
    This is the per-task building block: the distributed write path
    (``OlapSegWriter``) calls it once per input partition and commits
    the resulting files through the directory manifest."""
    recs = sorted(rows, key=lambda r: r[0])
    body = bytearray()
    blocks = []
    for start in range(0, len(recs), block_rows):
        chunk = recs[start : start + block_rows]
        blocks.append(
            (start, len(chunk), chunk[0][0], chunk[-1][0])
        )
        for doc_id, n_chars, lang, source in chunk:
            body += _REC.pack(
                int(doc_id),
                int(n_chars),
                lang.encode()[:2].ljust(2),
                source.encode()[:8].ljust(8),
            )
    with open(path, "wb") as fh:
        fh.write(_HEADER.pack(MAGIC, VERSION, len(recs), block_rows))
        fh.write(bytes(body))
        fh.write(struct.pack("<I", len(blocks)))
        for b in blocks:
            fh.write(_BLOCK.pack(*b))
        fh.write(struct.pack("<I", zlib.crc32(bytes(body))))
        fh.write(END_MAGIC)
    return len(recs)


def open_segment(path: str):
    """Validate the segment and return (n_rows, block_rows, blocks)
    where blocks = [(start_row, n, min_id, max_id), ...].  Raises
    ValueError on any structural damage (reference segment-open
    parity: never serve rows from a segment that fails validation)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < _HEADER.size + 8 or buf[:4] != MAGIC:
        raise ValueError("segment: bad magic or truncated header")
    magic, version, n_rows, block_rows = _HEADER.unpack_from(buf, 0)
    if version != VERSION:
        raise ValueError(f"segment: unsupported version {version}")
    if buf[-4:] != END_MAGIC:
        raise ValueError("segment: bad end magic")
    body_len = n_rows * _REC.size
    body_end = _HEADER.size + body_len
    (n_blocks,) = struct.unpack_from("<I", buf, body_end)
    foot_end = body_end + 4 + n_blocks * _BLOCK.size
    if foot_end + 8 != len(buf):
        raise ValueError("segment: footer length mismatch")
    (crc,) = struct.unpack_from("<I", buf, foot_end)
    if crc != zlib.crc32(buf[_HEADER.size : body_end]):
        raise ValueError("segment: body CRC mismatch")
    blocks = [
        _BLOCK.unpack_from(buf, body_end + 4 + i * _BLOCK.size)
        for i in range(n_blocks)
    ]
    return n_rows, block_rows, blocks


def read_block(path: str, start_row: int, n: int, lo=None, hi=None):
    """Yield records of one block, applying the pushed doc_id range
    exactly (block pruning is block-granular; pushed filters must be
    row-exact, so the residual range re-applies here).  Row-at-a-time
    convenience API for tests/tools; the Spark scan path uses
    `read_block_batch` (one Arrow batch per block) instead."""
    with open(path, "rb") as fh:
        fh.seek(_HEADER.size + start_row * _REC.size)
        buf = fh.read(n * _REC.size)
    for doc_id, n_chars, lang, source in _REC.iter_unpack(buf):
        if lo is not None and doc_id < lo:
            continue
        if hi is not None and doc_id > hi:
            # records are doc_id-sorted within the block
            break
        yield (
            doc_id,
            n_chars,
            lang.decode().strip(),
            source.decode().strip(),
        )


def read_block_batch(path: str, start_row: int, n: int, lo=None, hi=None):
    """Decode one block into a single `pyarrow.RecordBatch`: the
    fixed-width body maps straight onto a numpy structured dtype via
    `frombuffer` (zero parse loop), the residual doc_id range becomes
    two binary searches on the sorted id column (row-exact pushdown),
    and the padded 2s/8s byte fields become Arrow strings with one
    vectorized trim.  Returns None when the range selects no rows.

    This is the scale-safe scan path: a 100 TB segment set decodes at
    memcpy speed per task instead of `struct.iter_unpack` per row —
    the Python DataSource contract lets `read()` yield RecordBatches,
    so rows cross into the JVM as Arrow buffers, not pickled tuples."""
    import numpy as np
    import pyarrow as pa

    with open(path, "rb") as fh:
        fh.seek(_HEADER.size + start_row * _REC.size)
        buf = fh.read(n * _REC.size)
    arr = np.frombuffer(buf, dtype=_NP_REC)
    ids = arr["doc_id"]
    s, e = 0, len(arr)
    if lo is not None:
        s = int(np.searchsorted(ids, lo, side="left"))
    if hi is not None:
        e = int(np.searchsorted(ids, hi, side="right"))
    if e <= s:
        return None
    sl = arr[s:e]
    return pa.RecordBatch.from_arrays(
        [
            pa.array(sl["doc_id"], type=pa.int64()),
            pa.array(sl["n_chars"], type=pa.int64()),
            pa.array(np.char.strip(np.char.decode(sl["lang"], "ascii"))),
            pa.array(np.char.strip(np.char.decode(sl["source"], "ascii"))),
        ],
        names=["doc_id", "n_chars", "lang", "source"],
    )


def make_datasource():
    """Build the DataSource class (deferred import so the module can
    be imported where pyspark.sql.datasource is unavailable)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    class _BlockPartition(InputPartition):
        def __init__(self, path, start_row, n, lo, hi):
            self.path = path
            self.start_row = start_row
            self.n = n
            self.lo = lo
            self.hi = hi

    class _FilePartition(InputPartition):
        """One committed segment FILE of a directory table; the task
        opens it (validation), prunes blocks from its footer, and
        yields one Arrow batch per surviving block."""

        def __init__(self, path, lo, hi):
            self.path = path
            self.lo = lo
            self.hi = hi

    class _EmptyPartition(InputPartition):
        """An all-pruned scan still needs one partition; it yields
        nothing (never touches the path — which may be a directory)."""

    class OlapSegReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("olapseg: 'path' option is required")
            self.lo = None  # inclusive doc_id lower bound
            self.hi = None  # inclusive doc_id upper bound

        def pushFilters(self, filters):
            """Accept doc_id range/equality predicates (served by the
            footer zone maps); everything else is returned unsupported
            and Spark re-applies it above the scan.

            IN-lists get the zone-map treatment too, but are ALSO
            yielded back: the reader prunes files/blocks from the
            list's [min, max] envelope (planning-time skipping), while
            Spark keeps the exact membership test above the scan — a
            filter may be used for pruning without being claimed as
            row-exact, the parquet stats+residual split."""
            for f in filters:
                att = getattr(f, "attribute", None)
                if att == ("doc_id",):
                    if isinstance(f, EqualTo):
                        self.lo = max2(self.lo, f.value)
                        self.hi = min2(self.hi, f.value)
                        continue
                    if isinstance(f, GreaterThan):
                        self.lo = max2(self.lo, f.value + 1)
                        continue
                    if isinstance(f, GreaterThanOrEqual):
                        self.lo = max2(self.lo, f.value)
                        continue
                    if isinstance(f, LessThan):
                        self.hi = min2(self.hi, f.value - 1)
                        continue
                    if isinstance(f, LessThanOrEqual):
                        self.hi = min2(self.hi, f.value)
                        continue
                    if isinstance(f, In) and f.value:
                        vals = [v for v in f.value if v is not None]
                        if vals:
                            self.lo = max2(self.lo, min(vals))
                            self.hi = min2(self.hi, max(vals))
                        # fall through: yield — Spark re-applies the
                        # exact membership; we only harvested bounds
                yield f

        def partitions(self):
            if os.path.isdir(self.path):
                return self._dir_partitions()
            _, _, blocks = open_segment(self.path)
            parts = []
            for start_row, n, min_id, max_id in blocks:
                if self.lo is not None and max_id < self.lo:
                    continue
                if self.hi is not None and min_id > self.hi:
                    continue
                parts.append(
                    _BlockPartition(self.path, start_row, n, self.lo, self.hi)
                )
            # an all-pruned scan still needs one (empty) partition
            return parts or [_EmptyPartition()]

        def _dir_partitions(self):
            """Multi-segment directory (the distributed write layout):
            one InputPartition per committed file that SURVIVES the
            manifest's file-level zone maps — planning cost is
            O(#files) manifest metadata on the driver, never file
            bytes; the surviving tasks validate their own segment at
            open and prune blocks from its footer (two-level skipping,
            the engine's rowset-stats + parquet-stats split)."""
            man = os.path.join(self.path, MANIFEST_NAME)
            if not os.path.exists(man):
                raise ValueError(
                    f"olapseg: {self.path} has no {MANIFEST_NAME} — "
                    "directory was never committed (or is not a "
                    "segment table); refusing to guess at files"
                )
            with open(man) as f:
                entries = json.load(f)["files"]
            parts = []
            for ent in entries:
                if self.lo is not None and ent["max_id"] < self.lo:
                    continue
                if self.hi is not None and ent["min_id"] > self.hi:
                    continue
                parts.append(
                    _FilePartition(
                        os.path.join(self.path, ent["file"]),
                        self.lo,
                        self.hi,
                    )
                )
            return parts or [_EmptyPartition()]

        def read(self, part):
            if isinstance(part, _EmptyPartition):
                return
            if isinstance(part, _FilePartition):
                # task-side: validate the segment (footer + CRC — the
                # same fail-loud open contract as single files, paid
                # where the data is, not on the driver), then stream
                # the footer-surviving blocks as Arrow batches
                _, _, blocks = open_segment(part.path)
                for start_row, n, min_id, max_id in blocks:
                    if part.lo is not None and max_id < part.lo:
                        continue
                    if part.hi is not None and min_id > part.hi:
                        continue
                    batch = read_block_batch(
                        part.path, start_row, n, part.lo, part.hi
                    )
                    if batch is not None:
                        yield batch
                return
            batch = read_block_batch(
                part.path, part.start_row, part.n, part.lo, part.hi
            )
            if batch is not None:
                yield batch

    def max2(a, b):
        return b if a is None else max(a, b)

    def min2(a, b):
        return b if a is None else min(a, b)

    from dataclasses import dataclass

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    @dataclass
    class _SegCommit(WriterCommitMessage):
        tmp_name: str | None  # None = empty input partition, no file
        n_rows: int
        min_id: int | None
        max_id: int | None

    class OlapSegWriter(DataSourceWriter):
        """DISTRIBUTED segment write with a two-phase commit — the
        write-path twin of the reader (reference parity: segment
        finalize A4 + the engine's PREPARED→VISIBLE rowset publish,
        expressed through Spark's DataSourceWriter protocol):

        * each task sorts ITS rows by doc_id and writes ONE complete
          segment (header/body/zone-map footer/CRC) under a
          ``_tmp-*.oseg`` name — invisible to every reader,
        * the driver's ``commit()`` renames the temp files to
          ``part-*.oseg`` and publishes ``_SEG_MANIFEST.json`` listing
          the committed files WITH per-file (rows, min_id, max_id) —
          readers resolve files only through the manifest, so a
          crashed job's temp files (``abort()`` also unlinks them) or
          an interrupted overwrite can never serve partial data,
        * ``overwrite`` replaces the manifest atomically and unlinks
          the files it orphaned; append unions the file lists.

        At scale: file count = write parallelism (size input
        partitions to the segment size you want), commit cost is
        O(#files) driver metadata, and the per-file zone maps feed
        planning-time FILE pruning on the read side.  Single writer
        per table by contract (same as the engine manifest; an object
        store would guard the manifest swap with a conditional put).
        """

        def __init__(self, options, overwrite):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("olapseg: 'path' option is required")
            self.block_rows = int(options.get("block_rows", "256"))
            self.overwrite = overwrite

        def write(self, iterator):
            import uuid

            rows = [
                (r["doc_id"], r["n_chars"], r["lang"], r["source"])
                for r in iterator
            ]
            if not rows:
                return _SegCommit(None, 0, None, None)
            os.makedirs(self.path, exist_ok=True)
            tmp = f"_tmp-{uuid.uuid4().hex}.oseg"
            n = write_segment(
                rows, os.path.join(self.path, tmp), self.block_rows
            )
            ids = [r[0] for r in rows]
            return _SegCommit(tmp, n, int(min(ids)), int(max(ids)))

        def commit(self, messages):
            man_path = os.path.join(self.path, MANIFEST_NAME)
            old_files = []
            old_doc = {}
            if os.path.exists(man_path):
                with open(man_path) as f:
                    old_doc = json.load(f)
                old_files = old_doc["files"]
            entries = [] if self.overwrite else list(old_files)
            for i, m in enumerate(messages):
                if m is None or m.tmp_name is None:
                    continue
                final = f"part-{i:05d}-{m.tmp_name[len('_tmp-'):]}"
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, final),
                )
                entries.append(
                    {
                        "file": final,
                        "rows": m.n_rows,
                        "min_id": m.min_id,
                        "max_id": m.max_id,
                    }
                )
            doc = {
                "files": entries,
                "total_rows": sum(e["rows"] for e in entries),
            }
            if "last_batch_id" in old_doc:
                # a batch rewrite (compaction) of a STREAM-written
                # table must not reopen the exactly-once window — the
                # stream's replay watermark survives the overwrite
                doc["last_batch_id"] = old_doc["last_batch_id"]
            tmp_man = man_path + ".tmp"
            with open(tmp_man, "w") as f:
                json.dump(doc, f, indent=1)
            os.replace(tmp_man, man_path)  # readers flip atomically
            if self.overwrite:
                keep = {e["file"] for e in entries}
                for e in old_files:
                    if e["file"] not in keep:
                        try:
                            os.remove(os.path.join(self.path, e["file"]))
                        except OSError:
                            pass

        def abort(self, messages):
            for m in messages:
                if m is None or m.tmp_name is None:
                    continue
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass

    from pyspark.sql.datasource import DataSourceStreamWriter

    class OlapSegStreamWriter(DataSourceStreamWriter):
        """STREAMING sink for the segment format with EXACTLY-ONCE
        micro-batch commits — the same contract as the engine's
        ``stream_ingest`` epoch pattern, applied at the foreign-format
        boundary: tasks write temp segments, and the driver's
        per-batch ``commit`` appends them to ``_SEG_MANIFEST.json``
        together with ``last_batch_id`` in ONE atomic manifest swap.
        A replayed micro-batch (restart between sink commit and
        checkpoint advance) finds ``batchId <= last_batch_id``,
        unlinks its temp files, and changes nothing — duplicates are
        structurally impossible, not just unlikely."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("olapseg: 'path' option is required")
            self.block_rows = int(options.get("block_rows", "256"))

        def write(self, iterator):
            import uuid

            rows = [
                (r["doc_id"], r["n_chars"], r["lang"], r["source"])
                for r in iterator
            ]
            if not rows:
                return _SegCommit(None, 0, None, None)
            os.makedirs(self.path, exist_ok=True)
            tmp = f"_tmp-{uuid.uuid4().hex}.oseg"
            n = write_segment(
                rows, os.path.join(self.path, tmp), self.block_rows
            )
            ids = [r[0] for r in rows]
            return _SegCommit(tmp, n, int(min(ids)), int(max(ids)))

        def _drop_temps(self, messages):
            for m in messages:
                if m is None or m.tmp_name is None:
                    continue
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass

        def commit(self, messages, batchId):
            os.makedirs(self.path, exist_ok=True)
            man_path = os.path.join(self.path, MANIFEST_NAME)
            doc = {"files": [], "total_rows": 0}
            if os.path.exists(man_path):
                with open(man_path) as f:
                    doc = json.load(f)
            last = doc.get("last_batch_id", -1)
            if batchId <= last:
                # replayed micro-batch: already committed — idempotent
                self._drop_temps(messages)
                return
            entries = list(doc["files"])
            for i, m in enumerate(messages):
                if m is None or m.tmp_name is None:
                    continue
                final = (
                    f"part-b{batchId:06d}-{i:05d}-"
                    f"{m.tmp_name[len('_tmp-'):]}"
                )
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, final),
                )
                entries.append(
                    {
                        "file": final,
                        "rows": m.n_rows,
                        "min_id": m.min_id,
                        "max_id": m.max_id,
                    }
                )
            tmp_man = man_path + ".tmp"
            with open(tmp_man, "w") as f:
                json.dump(
                    {
                        "files": entries,
                        "total_rows": sum(e["rows"] for e in entries),
                        "last_batch_id": batchId,
                    },
                    f,
                    indent=1,
                )
            os.replace(tmp_man, man_path)

        def abort(self, messages, batchId):
            self._drop_temps(messages)

    class OlapSegDataSource(DataSource):
        @classmethod
        def name(cls):
            return "olapseg"

        def schema(self):
            return SEGMENT_SCHEMA

        def reader(self, schema):
            return OlapSegReader(self.options)

        def _check_write_schema(self, schema):
            want = [s.strip().split(" ")[0] for s in SEGMENT_SCHEMA.split(",")]
            got = [f.name for f in schema.fields]
            if got != want:
                raise ValueError(
                    f"olapseg: writer schema must be {want}, got {got}"
                )

        def writer(self, schema, overwrite):
            self._check_write_schema(schema)
            return OlapSegWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite):
            self._check_write_schema(schema)
            return OlapSegStreamWriter(self.options)

    return OlapSegDataSource


def compact_segments(
    spark, path: str, target_rows: int = 2500, block_rows: int = 256
):
    """Small-file MAINTENANCE for a segment directory table — the
    operational answer to what a streaming sink inevitably produces
    (one file per micro-batch per task): read the manifest-resolved
    table, rewrite it as ceil(total_rows/target_rows) doc_id-range-
    partitioned segments in one distributed job, and let the batch
    writer's two-phase overwrite swap the manifest atomically and
    unlink the replaced files — a concurrent reader resolves the old
    file set or the new one, never a mix.  Range partitioning keeps
    each output file a contiguous doc_id interval, so the rewritten
    zone maps are maximally selective (the same reason the engine's
    own compaction sorts on the short key).

    No-op (returns unchanged counts) when the table is already at or
    under the target file count — safe to run on a schedule.
    Returns (files_before, files_after).
    """
    import math

    from pyspark.sql import functions as _F

    register(spark)
    man_path = os.path.join(path, MANIFEST_NAME)
    with open(man_path) as f:
        man = json.load(f)
    n_out = max(1, math.ceil(man["total_rows"] / target_rows))
    if len(man["files"]) <= n_out:
        return len(man["files"]), len(man["files"])
    df = spark.read.format("olapseg").option("path", path).load()
    (
        df.repartitionByRange(n_out, _F.col("doc_id"))
        .write.format("olapseg")
        .option("path", path)
        .option("block_rows", str(block_rows))
        .mode("overwrite")
        .save()
    )
    with open(man_path) as f:
        man2 = json.load(f)
    return len(man["files"]), len(man2["files"])


def delete_range_from_segments(
    spark, path: str, lo: int, hi: int, block_rows: int = 256
):
    """Surgical range DELETE on a segment directory table — the
    engine's scoped-DML discipline (operators/compaction.py
    partition-scoped rewrite) applied at the foreign-format boundary:
    the manifest's per-file zone maps pick ONLY the files whose
    [min_id, max_id] intersects [lo, hi]; those files rewrite
    executor-side (one task per touched file, through the same
    fail-loud ``open_segment`` + ``write_segment`` pair every path
    uses), and one atomic manifest swap publishes untouched entries +
    rewritten entries while unlinking the replaced files.  I/O is
    proportional to TOUCHED bytes at any table size — a delete of one
    day's ids from a year-sized table reads one day's files.  A file
    whose every row falls in the range simply disappears; the
    stream-replay watermark survives the swap (same rule as
    compaction).

    Bounds are INCLUSIVE on both ends (zone-map convention).
    Returns (files_rewritten, files_untouched, rows_deleted).
    """
    register(spark)
    man_path = os.path.join(path, MANIFEST_NAME)
    with open(man_path) as f:
        man = json.load(f)
    touched = [
        e
        for e in man["files"]
        if not (e["max_id"] < lo or e["min_id"] > hi)
    ]
    untouched = [
        e for e in man["files"] if e["max_id"] < lo or e["min_id"] > hi
    ]
    if not touched:
        return 0, len(untouched), 0
    paths_df = spark.createDataFrame(
        [(os.path.join(path, e["file"]),) for e in touched],
        "old_path string",
    ).repartition(len(touched))

    def rewrite(batches):
        import uuid as _uuid

        import pandas as _pd

        for pdf in batches:
            out = []
            for fp in pdf["old_path"]:
                _, _, blocks = open_segment(fp)  # fail-loud validate
                rows = [
                    r
                    for b in blocks
                    for r in read_block(fp, b[0], b[1])
                ]
                kept = [r for r in rows if not (lo <= r[0] <= hi)]
                deleted = len(rows) - len(kept)
                new_name = None
                n = mn = mx = None
                if kept:
                    new_name = f"_tmp-{_uuid.uuid4().hex}.oseg"
                    write_segment(
                        kept,
                        os.path.join(os.path.dirname(fp), new_name),
                        block_rows,
                    )
                    ids = [r[0] for r in kept]
                    n, mn, mx = len(kept), min(ids), max(ids)
                out.append(
                    (os.path.basename(fp), new_name, n, mn, mx, deleted)
                )
            yield _pd.DataFrame(
                out,
                columns=[
                    "old_file", "tmp_file", "rows",
                    "min_id", "max_id", "deleted",
                ],
            )

    res = paths_df.mapInPandas(
        rewrite,
        "old_file string, tmp_file string, rows bigint, "
        "min_id bigint, max_id bigint, deleted bigint",
    ).collect()  # bounded: one row per TOUCHED file (driver metadata)
    entries = list(untouched)
    rows_deleted = 0
    for r in res:
        rows_deleted += int(r["deleted"])
        if r["tmp_file"] is None:
            continue  # fully-deleted file: no successor
        final = f"part-del-{r['tmp_file'][len('_tmp-'):]}"
        os.replace(
            os.path.join(path, r["tmp_file"]),
            os.path.join(path, final),
        )
        entries.append(
            {
                "file": final,
                "rows": int(r["rows"]),
                "min_id": int(r["min_id"]),
                "max_id": int(r["max_id"]),
            }
        )
    doc = {
        "files": entries,
        "total_rows": sum(e["rows"] for e in entries),
    }
    if "last_batch_id" in man:
        doc["last_batch_id"] = man["last_batch_id"]
    tmp_man = man_path + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp_man, man_path)
    for r in res:
        try:
            os.remove(os.path.join(path, r["old_file"]))
        except OSError:
            pass
    return len(touched), len(untouched), rows_deleted


_REGISTERED = set()


def register(spark) -> None:
    """Idempotently register the 'olapseg' format on this session and
    enable Python-source filter pushdown (off by default in Spark 4;
    without it a reader implementing pushFilters is rejected)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_datasource())
    _REGISTERED.add(key)
