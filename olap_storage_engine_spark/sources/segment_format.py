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
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"OSEG"
END_MAGIC = b"GESO"
VERSION = 1
_REC = struct.Struct("<qi2s8s")
# the same 22-byte record as an (unaligned) numpy dtype, for the
# batch decode path — itemsize must equal _REC.size
_NP_REC = [("doc_id", "<i8"), ("n_chars", "<i4"),
           ("lang", "S2"), ("source", "S8")]
_HEADER = struct.Struct("<4sIQI")
_BLOCK = struct.Struct("<QIqq")

SEGMENT_SCHEMA = "doc_id bigint, n_chars bigint, lang string, source string"


def write_segment(rows, path: str, block_rows: int = 256) -> int:
    """Write (doc_id, n_chars, lang, source) tuples as one segment.
    Rows are sorted by doc_id (the short-key order that makes the
    zone maps selective).  Returns the number of rows written.
    Fixture/driver-side by design — the distributed path is the
    READER; real segments come from the system being migrated."""
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
            and Spark re-applies it above the scan."""
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
                yield f

        def partitions(self):
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
            return parts or [_BlockPartition(self.path, 0, 0, 0, -1)]

        def read(self, part):
            batch = read_block_batch(
                part.path, part.start_row, part.n, part.lo, part.hi
            )
            if batch is not None:
                yield batch

    def max2(a, b):
        return b if a is None else max(a, b)

    def min2(a, b):
        return b if a is None else min(a, b)

    class OlapSegDataSource(DataSource):
        @classmethod
        def name(cls):
            return "olapseg"

        def schema(self):
            return SEGMENT_SCHEMA

        def reader(self, schema):
            return OlapSegReader(self.options)

    return OlapSegDataSource


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
