"""Custom binary segment format + the olapseg Python DataSource:
round-trip, open-validation failures, and zone-map pushdown pruning
at partition-planning time."""

import struct

import pytest

from olap_storage_engine_spark.sources.segment_format import (
    SEGMENT_SCHEMA,
    make_datasource,
    open_segment,
    register,
    write_segment,
)

ROWS = [(i, 100 + i, "en" if i % 3 else "de", f"src{i % 5}") for i in range(1000)]


@pytest.fixture(scope="module")
def seg(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("seg") / "t.oseg")
    n = write_segment(ROWS, p, block_rows=100)
    assert n == 1000
    return p


def test_open_validates_and_indexes(seg):
    n_rows, block_rows, blocks = open_segment(seg)
    assert n_rows == 1000 and block_rows == 100
    assert len(blocks) == 10
    assert blocks[0] == (0, 100, 0, 99)
    assert blocks[-1] == (900, 100, 900, 999)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"XSEG" + b[4:],  # bad magic
        lambda b: b[:-4] + b"XXXX",  # bad end magic
        lambda b: b[:300] + bytes([b[300] ^ 0xFF]) + b[301:],  # CRC flip
        lambda b: b[:-40],  # truncated footer
    ],
)
def test_open_rejects_corruption(seg, tmp_path, mutate):
    buf = open(seg, "rb").read()
    bad = tmp_path / "bad.oseg"
    bad.write_bytes(mutate(buf))
    with pytest.raises(ValueError):
        open_segment(str(bad))


def test_spark_roundtrip_all_rows(spark, seg):
    register(spark)
    df = spark.read.format("olapseg").option("path", seg).load()
    assert df.schema.simpleString() == (
        "struct<" + SEGMENT_SCHEMA.replace(" ", ":").replace(",:", ",") + ">"
    )
    got = sorted(
        (r["doc_id"], r["n_chars"], r["lang"], r["source"])
        for r in df.collect()
    )
    assert got == sorted(ROWS)


def test_pushdown_prunes_blocks_at_planning(seg):
    """The doc_id range reaches the reader and prunes whole blocks
    from the partition plan (not a post-filter)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    cls = make_datasource()
    ds = cls(options={"path": seg})
    r = ds.reader(None)
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 250),
                LessThan(("doc_id",), 450),
            ]
        )
    )
    assert unsupported == []  # both served by the zone maps
    parts = r.partitions()
    # rows 250..449 live in blocks 2,3,4 (100-row blocks)
    assert len(parts) == 3
    # read() yields one Arrow batch per block (residual range applied)
    batches = [b for p in parts for b in r.read(p)]
    ids = sorted(i for b in batches for i in b.column("doc_id").to_pylist())
    assert ids == list(range(250, 450))


def test_pushdown_returns_unsupported_filters(seg):
    from pyspark.sql.datasource import EqualTo

    cls = make_datasource()
    r = cls(options={"path": seg}).reader(None)
    leftover = list(
        r.pushFilters([EqualTo(("lang",), "en"), EqualTo(("doc_id",), 123)])
    )
    # lang predicate bounces back to Spark; doc_id=123 pins one block
    assert len(leftover) == 1 and leftover[0].attribute == ("lang",)
    parts = r.partitions()
    assert len(parts) == 1
    (batch,) = list(r.read(parts[0]))
    assert batch.column("doc_id").to_pylist() == [123]


def test_spark_filtered_scan_matches(spark, seg):
    register(spark)
    from pyspark.sql import functions as F

    df = (
        spark.read.format("olapseg")
        .option("path", seg)
        .load()
        .filter((F.col("doc_id") >= 990) | (F.col("doc_id") < 5))
    )
    # an OR of ranges is not pushable as one range -> correctness must
    # not depend on pushdown; Spark re-applies the predicate
    assert sorted(r["doc_id"] for r in df.collect()) == list(range(0, 5)) + list(
        range(990, 1000)
    )


def test_batch_decode_matches_row_decode(seg):
    """read_block_batch is byte-for-byte equivalent to the row path
    (same residual range semantics, same string trim)."""
    import numpy as np

    from olap_storage_engine_spark.sources import segment_format as sf

    assert np.dtype(sf._NP_REC).itemsize == sf._REC.size
    rows = list(sf.read_block(seg, 200, 100, lo=233, hi=257))
    batch = sf.read_block_batch(seg, 200, 100, lo=233, hi=257)
    assert [tuple(r.values()) for r in batch.to_pylist()] == rows
    assert sf.read_block_batch(seg, 200, 100, lo=500, hi=400) is None


def _seg_df(spark, rows):
    from olap_storage_engine_spark.sources.segment_format import (
        SEGMENT_SCHEMA,
    )

    return spark.createDataFrame(rows, SEGMENT_SCHEMA)


def _rb(*tuples):
    """One pyarrow RecordBatch in the writer's schema — the writers
    are Arrow-batched (DataSourceArrowWriter, r12), so direct protocol
    tests feed batches, never Rows."""
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [
            pa.array([t[0] for t in tuples], pa.int64()),
            pa.array([t[1] for t in tuples], pa.int64()),
            pa.array([t[2] for t in tuples]),
            pa.array([t[3] for t in tuples]),
        ],
        names=["doc_id", "n_chars", "lang", "source"],
    )


def test_distributed_write_roundtrip_and_manifest(spark, tmp_path):
    """Each task writes one complete segment; commit publishes the
    manifest with per-file zone maps; the reader resolves files only
    through the manifest."""
    import json
    import os

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, 100 + i, "en" if i % 3 else "de", f"s{i % 5}") for i in range(2000)]
    _seg_df(spark, rows).repartition(4, "doc_id").write.format(
        "olapseg"
    ).option("path", d).mode("append").save()
    man = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man["total_rows"] == 2000 and len(man["files"]) == 4
    for e in man["files"]:
        assert e["min_id"] <= e["max_id"] and e["rows"] > 0
    back = spark.read.format("olapseg").option("path", d).load()
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_write_overwrite_unlinks_orphans_append_unions(spark, tmp_path):
    import os

    from olap_storage_engine_spark.sources.segment_format import register

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, i, "en", "s") for i in range(300)]
    _seg_df(spark, rows).repartition(3).write.format("olapseg").option(
        "path", d
    ).mode("append").save()
    _seg_df(spark, rows[:50]).repartition(1).write.format(
        "olapseg"
    ).option("path", d).mode("overwrite").save()
    segs = [f for f in os.listdir(d) if f.endswith(".oseg")]
    assert len(segs) == 1  # overwrite removed the three orphans
    assert (
        spark.read.format("olapseg").option("path", d).load().count() == 50
    )
    _seg_df(spark, rows[50:100]).repartition(1).write.format(
        "olapseg"
    ).option("path", d).mode("append").save()
    assert (
        spark.read.format("olapseg").option("path", d).load().count() == 100
    )


def test_dir_reader_prunes_files_at_planning(spark, tmp_path):
    """Manifest zone maps prune whole files before any task runs."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from olap_storage_engine_spark.sources.segment_format import (
        make_datasource,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    # range-partitioned write -> contiguous per-file id ranges
    rows = [(i, i, "en", "s") for i in range(1000)]
    _seg_df(spark, rows).repartitionByRange(4, "doc_id").write.format(
        "olapseg"
    ).option("path", d).mode("append").save()
    r = make_datasource()(options={"path": d}).reader(None)
    unsupported = list(
        r.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 10), LessThan(("doc_id",), 20)]
        )
    )
    assert unsupported == []
    parts = r.partitions()
    assert len(parts) == 1  # 3 of 4 files never scheduled
    ids = sorted(
        i for p in parts for b in r.read(p)
        for i in b.column("doc_id").to_pylist()
    )
    assert ids == list(range(10, 20))


def test_dir_without_manifest_refuses(spark, tmp_path):
    import os

    from olap_storage_engine_spark.sources.segment_format import (
        make_datasource,
    )

    d = str(tmp_path / "t")
    os.makedirs(d)
    r = make_datasource()(options={"path": d}).reader(None)
    with pytest.raises(ValueError, match="no _SEG_MANIFEST"):
        r.partitions()


def test_writer_abort_unlinks_temps_and_schema_is_validated(
    spark, tmp_path
):
    import os

    from pyspark.sql.types import StructType

    from olap_storage_engine_spark.sources.segment_format import (
        SEGMENT_SCHEMA,
        make_datasource,
    )
    from pyspark.sql.types import _parse_datatype_string

    cls = make_datasource()
    ds = cls(options={"path": str(tmp_path / "t")})
    schema = _parse_datatype_string(SEGMENT_SCHEMA)
    w = ds.writer(schema, overwrite=False)

    msg = w.write(iter([_rb((1, 2, "en", "s"))]))
    assert msg.n_rows == 1 and msg.min_id == msg.max_id == 1
    assert os.path.exists(str(tmp_path / "t" / msg.tmp_name))
    w.abort([msg, None])
    assert not os.path.exists(str(tmp_path / "t" / msg.tmp_name))
    bad = _parse_datatype_string("a bigint, b bigint, c string, d string")
    with pytest.raises(ValueError, match="writer schema"):
        ds.writer(bad, overwrite=False)


def test_stream_writer_exactly_once_replay(spark, tmp_path):
    """A replayed micro-batch (same batchId) must be a structural
    no-op: temp files unlinked, manifest untouched; the next batchId
    commits normally."""
    import json
    import os

    from pyspark.sql.types import _parse_datatype_string

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        SEGMENT_SCHEMA,
        make_datasource,
    )

    d = str(tmp_path / "t")
    schema = _parse_datatype_string(SEGMENT_SCHEMA)
    w = make_datasource()(options={"path": d}).streamWriter(schema, False)
    m0 = w.write(iter([_rb((1, 5, "en", "s"))]))
    w.commit([m0], 0)
    man = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man["total_rows"] == 1 and man["last_batch_id"] == 0
    # replay of batch 0
    m1 = w.write(iter([_rb((1, 5, "en", "s"))]))
    w.commit([m1], 0)
    man2 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man2 == man  # byte-identical manifest
    assert not os.path.exists(os.path.join(d, m1.tmp_name))
    # next batch commits
    m2 = w.write(iter([_rb((2, 6, "de", "s"))]))
    w.commit([m2], 1)
    man3 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man3["total_rows"] == 2 and man3["last_batch_id"] == 1


def test_stream_writer_end_to_end(spark, tmp_path):
    import os
    import tempfile

    from olap_storage_engine_spark.sources.segment_format import register

    register(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(i, 10 + i, "en", f"s{i % 3}") for i in range(400)]
    _seg_df(spark, rows).coalesce(1).write.parquet(os.path.join(src, "p"))
    d = str(tmp_path / "t")
    stream = (
        spark.readStream.schema(_seg_df(spark, rows[:1]).schema)
        .parquet(os.path.join(src, "p"))
    )
    q = (
        stream.writeStream.format("olapseg")
        .option("path", d)
        .option("checkpointLocation", tempfile.mkdtemp())
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.format("olapseg").option("path", d).load()
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_compact_segments_collapses_files_and_preserves_rows(
    spark, tmp_path
):
    import json
    import os

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        compact_segments,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, i, "en", f"s{i % 3}") for i in range(1000)]
    _seg_df(spark, rows).repartition(10).write.format("olapseg").option(
        "path", d
    ).mode("append").save()
    before, after = compact_segments(spark, d, target_rows=500)
    assert (before, after) == (10, 2)
    back = spark.read.format("olapseg").option("path", d).load()
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # contiguous zone maps after the range-partitioned rewrite
    man = json.load(open(os.path.join(d, MANIFEST_NAME)))
    spans = sorted((e["min_id"], e["max_id"]) for e in man["files"])
    assert spans[0][1] < spans[1][0]  # non-overlapping files
    # already-at-target is a no-op
    assert compact_segments(spark, d, target_rows=500) == (2, 2)
    # orphaned fragments physically removed
    assert len([f for f in os.listdir(d) if f.endswith(".oseg")]) == 2


def test_compact_preserves_stream_replay_watermark(spark, tmp_path):
    """Compacting a stream-written table must not reopen the
    exactly-once window: last_batch_id survives the batch overwrite."""
    import json
    import os

    from pyspark.sql.types import _parse_datatype_string

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        SEGMENT_SCHEMA,
        compact_segments,
        make_datasource,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    schema = _parse_datatype_string(SEGMENT_SCHEMA)
    w = make_datasource()(options={"path": d}).streamWriter(schema, False)
    for b in range(4):
        msgs = [
            w.write(iter([_rb((b * 10 + j, 1, "en", "s"))]))
            for j in range(3)
        ]
        w.commit(msgs, b)
    man = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert len(man["files"]) == 12 and man["last_batch_id"] == 3
    before, after = compact_segments(spark, d, target_rows=6)
    assert (before, after) == (12, 2)
    man2 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man2["last_batch_id"] == 3  # watermark survived
    # a replay of batch 3 after compaction is still a no-op
    m = w.write(iter([_rb((999, 1, "en", "s"))]))
    w.commit([m], 3)
    assert json.load(open(os.path.join(d, MANIFEST_NAME)))["total_rows"] == 12


def test_in_list_prunes_by_envelope_but_stays_unsupported(spark, seg):
    """An IN-list narrows the zone-map envelope (planning-time block
    pruning) while remaining in the unsupported set so Spark
    re-applies the exact membership above the scan."""
    from pyspark.sql.datasource import In

    from olap_storage_engine_spark.sources.segment_format import (
        make_datasource,
    )

    r = make_datasource()(options={"path": seg}).reader(None)
    leftover = list(r.pushFilters([In(("doc_id",), (250, 260, 255))]))
    assert len(leftover) == 1 and isinstance(leftover[0], In)
    parts = r.partitions()
    assert len(parts) == 1  # rows 250..260 live in one 100-row block
    ids = {i for p in parts for b in r.read(p)
           for i in b.column("doc_id").to_pylist()}
    # envelope read returns the whole [250, 260] span; Spark's
    # re-applied IN keeps only the members — end-to-end check:
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.sources.segment_format import register

    register(spark)
    df = (
        spark.read.format("olapseg").option("path", seg).load()
        .filter(F.col("doc_id").isin(250, 260, 255))
    )
    assert sorted(x["doc_id"] for x in df.collect()) == [250, 255, 260]
    assert ids >= {250, 255, 260}


def test_range_delete_rewrites_only_touched_files(spark, tmp_path):
    """Zone-map-scoped DELETE: untouched files stay byte-identical on
    disk, touched files rewrite without the range, a fully-covered
    file disappears, and the manifest stays consistent."""
    import json
    import os

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        delete_range_from_segments,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, i, "en", f"s{i % 3}") for i in range(1000)]
    # range-partitioned write -> 4 contiguous files of ~250 ids
    _seg_df(spark, rows).repartitionByRange(4, "doc_id").write.format(
        "olapseg"
    ).option("path", d).mode("append").save()
    man0 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    spans = sorted(
        (e["min_id"], e["max_id"], e["file"]) for e in man0["files"]
    )
    # delete the SECOND file's whole span plus a sliver of the third
    lo, hi = spans[1][0], spans[1][1] + 10
    before_bytes = {
        e["file"]: open(os.path.join(d, e["file"]), "rb").read()
        for e in man0["files"]
    }
    fr, fu, nd = delete_range_from_segments(spark, d, lo, hi)
    assert fr == 2 and fu == 2
    assert nd == hi - lo + 1
    man1 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man1["total_rows"] == 1000 - nd
    # untouched files preserved byte-identically under the same name
    kept_names = {e["file"] for e in man1["files"]}
    for name in (spans[0][2], spans[3][2]):
        assert name in kept_names
        assert (
            open(os.path.join(d, name), "rb").read() == before_bytes[name]
        )
    # the fully-covered file left no successor; the partial one did
    assert spans[1][2] not in kept_names
    back = spark.read.format("olapseg").option("path", d).load()
    expect = sorted(t for t in rows if not (lo <= t[0] <= hi))
    assert sorted(map(tuple, back.collect())) == expect
    # no-op outside every zone map
    assert delete_range_from_segments(spark, d, 10_000, 20_000) == (
        0,
        len(man1["files"]),
        0,
    )


# ------------------------------------------------------------------
# r12: Arrow-batched write path, per-file blooms, CAS-guarded manifest
# swaps, stray-temp hygiene
# ------------------------------------------------------------------


def test_writers_are_arrow_batched(spark):
    """Pin the batch-wise write protocol: both writers subclass the
    Arrow writer bases, so tasks receive RecordBatches — there is no
    row-at-a-time Python anywhere on the segment write path."""
    from pyspark.sql.datasource import (
        DataSourceArrowWriter,
        DataSourceStreamArrowWriter,
    )
    from pyspark.sql.types import _parse_datatype_string

    ds = make_datasource()(options={"path": "/tmp/x"})
    schema = _parse_datatype_string(SEGMENT_SCHEMA)
    assert isinstance(ds.writer(schema, False), DataSourceArrowWriter)
    assert isinstance(
        ds.streamWriter(schema, False), DataSourceStreamArrowWriter
    )


def test_batch_write_matches_row_write_bytes(tmp_path):
    """write_segment_batches is byte-for-byte the row API: same sort,
    same space padding, same footer, same CRC."""
    import pyarrow as pa

    from olap_storage_engine_spark.sources.segment_format import (
        build_bloom,
        write_segment_batches,
    )

    rows = [(i * 7 % 100, 10 + i, "en" if i % 2 else "x", f"s{i % 4}")
            for i in range(100)]
    p_row = str(tmp_path / "row.oseg")
    p_bat = str(tmp_path / "bat.oseg")
    write_segment(rows, p_row, block_rows=16)
    # feed as two out-of-order batches: the writer must globally sort
    n, mn, mx, bloom = write_segment_batches(
        [_rb(*rows[50:]), _rb(*rows[:50])], p_bat, block_rows=16
    )
    assert (n, mn, mx) == (100, 0, 99)
    assert open(p_row, "rb").read() == open(p_bat, "rb").read()
    import numpy as np

    assert bloom == build_bloom(np.array(sorted(r[0] for r in rows)))
    # empty input writes nothing
    assert write_segment_batches(
        [], str(tmp_path / "e.oseg"), 16
    ) == (0, None, None, None)


def test_bloom_no_false_negatives_and_low_fpp():
    import numpy as np

    from olap_storage_engine_spark.sources.segment_format import (
        bloom_may_contain_any,
        build_bloom,
    )

    ids = np.arange(0, 5000, 2, dtype=np.int64)  # evens
    b = build_bloom(ids)
    # every present id answers True (probe one-by-one: no false negs)
    for v in [0, 2, 1234, 4998]:
        assert bloom_may_contain_any(b, [v])
    # absent ids (odds) answer False almost always (~1% fpp)
    fp = sum(bloom_may_contain_any(b, [v]) for v in range(1, 5000, 2))
    assert fp < 2500 * 0.05
    # any-semantics: one present among absents -> True
    assert bloom_may_contain_any(b, [1, 3, 2, 5])
    assert not bloom_may_contain_any(b, [])


def test_dir_point_lookup_prunes_by_bloom(spark, tmp_path):
    """A point probe inside a file's [min,max] envelope but absent
    from its id set is rejected by the manifest bloom: the file is
    never scheduled (planning-time, zero file bytes)."""
    from pyspark.sql.datasource import EqualTo

    from olap_storage_engine_spark.sources.segment_format import (
        make_datasource,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    # file A holds evens 0..198, file B holds evens 200..398 -> probe
    # id 101 is inside A's envelope [0,198] but absent from its set
    rows = [(i, i, "en", "s") for i in range(0, 400, 2)]
    _seg_df(spark, rows).repartitionByRange(2, "doc_id").write.format(
        "olapseg"
    ).option("path", d).mode("append").save()
    r = make_datasource()(options={"path": d}).reader(None)
    list(r.pushFilters([EqualTo(("doc_id",), 101)]))
    parts = r.partitions()
    # envelope admits file A; bloom rejects it -> empty partition only
    assert len(parts) == 1 and type(parts[0]).__name__ == "_EmptyPartition"
    # a PRESENT id is served by exactly the one owning file
    r2 = make_datasource()(options={"path": d}).reader(None)
    list(r2.pushFilters([EqualTo(("doc_id",), 202)]))
    parts2 = r2.partitions()
    assert len(parts2) == 1 and type(parts2[0]).__name__ == "_FilePartition"
    (batch,) = list(r2.read(parts2[0]))
    assert batch.column("doc_id").to_pylist() == [202]
    # end-to-end through Spark: exact answer either way
    df = spark.read.format("olapseg").option("path", d).load()
    from pyspark.sql import functions as F

    assert df.filter(F.col("doc_id") == 101).count() == 0
    assert df.filter(F.col("doc_id") == 202).count() == 1


def test_manifest_commit_is_cas_guarded(spark, tmp_path, monkeypatch):
    """The read-modify-write race the CAS closes: writer B loads the
    manifest, writer A publishes, then B tries to publish its merge —
    B must raise ManifestConflictError instead of silently dropping
    A's files.  Simulated by making B's commit observe the
    pre-publish (stale) manifest load."""
    import json
    import os

    import pytest as _pytest

    import olap_storage_engine_spark.sources.segment_format as sf
    from olap_storage_engine_spark.plans.manifest import (
        ManifestConflictError,
    )
    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
    )
    from pyspark.sql.types import _parse_datatype_string

    d = str(tmp_path / "t")
    schema = _parse_datatype_string(SEGMENT_SCHEMA)
    ds = make_datasource()(options={"path": d})
    w1 = ds.writer(schema, overwrite=False)
    w2 = ds.writer(schema, overwrite=False)
    m1 = w1.write(iter([_rb((1, 1, "en", "s"))]))
    m2 = w2.write(iter([_rb((2, 2, "de", "s"))]))
    w1.commit([m1])  # wins; manifest at generation 1
    man = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man["generation"] == 1 and man["total_rows"] == 1
    # w2 observed the table BEFORE w1 published (the race window)
    real_load = sf._load_manifest
    monkeypatch.setattr(
        sf,
        "_load_manifest",
        lambda p: ({}, 0, real_load(p)[2]),
    )
    with _pytest.raises(ManifestConflictError):
        w2.commit([m2])  # stale generation 0 vs disk 1 -> conflict
    monkeypatch.undo()
    # the winner's manifest is untouched
    man2 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man2 == man
    # a fresh commit (observing generation 1) appends fine
    w3 = ds.writer(schema, overwrite=False)
    m3 = w3.write(iter([_rb((3, 3, "fr", "s"))]))
    w3.commit([m3])
    man3 = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man3["generation"] == 2 and man3["total_rows"] == 2


def test_commit_sweeps_stray_temps(spark, tmp_path):
    """An ABANDONED attempt's _tmp-*.oseg (never surfaced in commit
    messages) is unlinked by the next successful commit — but only
    once older than the sweep age gate: a FRESH temp may belong to a
    live concurrent writer and must survive."""
    import os
    import time

    from pyspark.sql.types import _parse_datatype_string

    def make_stray_named(name, age_sec):
        stray = os.path.join(d, name)
        open(stray, "wb").write(b"garbage")
        old = time.time() - age_sec
        os.utime(stray, (old, old))
        return stray

    def make_stray(age_sec):
        return make_stray_named("_tmp-deadbeef.oseg", age_sec)

    d = str(tmp_path / "t")
    os.makedirs(d)
    schema = _parse_datatype_string(SEGMENT_SCHEMA)
    ds = make_datasource()(options={"path": d})
    # fresh stray (a concurrent writer's in-flight temp): survives —
    # as does a MIDDLE-AGED one (2 h: an early task of a long job
    # still waiting for its driver's commit; the gate is 24 h, an
    # upper bound on sane single-job runtime)
    stray = make_stray(0)
    mid = make_stray_named("_tmp-midaged.oseg", 2 * 3600)
    w = ds.writer(schema, overwrite=False)
    m = w.write(iter([_rb((1, 1, "en", "s"))]))
    w.commit([m])
    assert os.path.exists(stray) and os.path.exists(mid)
    os.remove(mid)
    # abandoned stray (older than the 24 h gate): reclaimed
    stray = make_stray(2 * 86400)
    w2 = ds.writer(schema, overwrite=False)
    m2 = w2.write(iter([_rb((2, 2, "en", "s"))]))
    w2.commit([m2])
    assert not os.path.exists(stray)
    # stream commit sweeps abandoned temps too
    stray = make_stray(2 * 86400)
    sw = ds.streamWriter(schema, False)
    sm = sw.write(iter([_rb((3, 3, "en", "s"))]))
    sw.commit([sm], 0)
    assert not os.path.exists(stray)


def test_stream_reader_incremental_pickup(spark, tmp_path):
    """The streaming READ side (r12): the first poll consumes every
    committed file; files committed AFTER the stream starts arrive in
    the next micro-batch — offsets are consumed-manifest-entry counts,
    so the source never re-reads old files."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.sources.segment_format import register

    register(spark)
    d = str(tmp_path / "t")
    rows1 = [(i, 10 + i, "en", "s") for i in range(400)]
    _seg_df(spark, rows1).repartitionByRange(2, "doc_id").write.format(
        "olapseg"
    ).option("path", d).mode("overwrite").save()
    stream = spark.readStream.format("olapseg").option("path", d).load()
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("tc")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("seg_incr_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r["lang"], r["n"]) for r in spark.sql(
            "select * from seg_incr_test").collect()}
        assert got == {("en", 400)}
        # append-commit two more files while the stream is live
        rows2 = [(i, 10 + i, "de", "s") for i in range(400, 600)]
        _seg_df(spark, rows2).repartition(2).write.format(
            "olapseg"
        ).option("path", d).mode("append").save()
        q.processAllAvailable()
        got = {(r["lang"], r["n"]) for r in spark.sql(
            "select * from seg_incr_test").collect()}
        assert got == {("en", 400), ("de", 200)}
    finally:
        q.stop()


def test_stream_reader_rejects_rewritten_history(spark, tmp_path):
    """A manifest that shrank below a consumed offset (compaction or
    delete rewrote history) must fail loudly, never re-serve rewritten
    files as new rows — the CDC-read contract."""
    import pytest as _pytest

    from olap_storage_engine_spark.sources.segment_format import (
        make_datasource,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, i, "en", "s") for i in range(500)]
    _seg_df(spark, rows).repartition(5).write.format("olapseg").option(
        "path", d
    ).mode("append").save()
    r = make_datasource()(options={"path": d}).streamReader(None)
    assert r.initialOffset() == {"n_files": 0, "epoch": 0}
    assert r.latestOffset() == {"n_files": 5, "epoch": 0}
    parts = r.partitions(
        {"n_files": 0, "epoch": 0}, {"n_files": 5, "epoch": 0}
    )
    assert len(parts) == 5
    ids = sorted(
        i
        for p in parts
        for b in r.read(p)
        for i in b.column("doc_id").to_pylist()
    )
    assert ids == list(range(500))
    # compaction rewrites history: consumed offset now exceeds files
    from olap_storage_engine_spark.sources.segment_format import (
        compact_segments,
    )

    before, after = compact_segments(spark, d, target_rows=500)
    assert after < before
    with _pytest.raises(ValueError, match="history was rewritten"):
        r.partitions(
            {"n_files": 5, "epoch": 0}, {"n_files": 5 + 1, "epoch": 0}
        )
    # the EPOCH catches rewrites even when the file count still
    # covers the consumed offsets (a bare count check would silently
    # re-serve rewritten files)
    with _pytest.raises(ValueError, match="history was rewritten"):
        r.partitions(
            {"n_files": 0, "epoch": 0}, {"n_files": after, "epoch": 0}
        )
    # latestOffset reflects the rewrite: new count, bumped epoch
    assert r.latestOffset() == {"n_files": after, "epoch": 1}


def test_bloom_is_capped_to_metadata_budget():
    """A file with more distinct ids than the bloom budget supports
    gets NO bloom (None) — the manifest stays metadata-sized and the
    reader falls back to zone maps — rather than a bloated or
    saturated one."""
    import numpy as np

    from olap_storage_engine_spark.sources import segment_format as sf

    small = sf.build_bloom(np.arange(1000, dtype=np.int64))
    assert small is not None and small["m"] <= sf._BLOOM_MAX_BITS
    over = (sf._BLOOM_MAX_BITS // sf._BLOOM_BITS_PER_KEY) + 100
    big = sf.build_bloom(np.arange(over, dtype=np.int64))
    assert big is None


def test_vacuum_reclaims_orphans_only(spark, tmp_path):
    """vacuum_segments removes aged UNREFERENCED .oseg files (a
    CAS-losing commit's renamed parts, abandoned temps) and nothing
    else: manifest-referenced files and FRESH unreferenced files (a
    live concurrent writer's window) survive."""
    import os
    import time

    from olap_storage_engine_spark.sources.segment_format import (
        register,
        vacuum_segments,
    )

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, i, "en", "s") for i in range(100)]
    _seg_df(spark, rows).repartition(2).write.format("olapseg").option(
        "path", d
    ).mode("append").save()

    def orphan(name, age_sec):
        fp = os.path.join(d, name)
        open(fp, "wb").write(b"orphan")
        old = time.time() - age_sec
        os.utime(fp, (old, old))
        return fp

    aged_part = orphan("part-99999-deadbeef.oseg", 2 * 86400)
    aged_tmp = orphan("_tmp-deadbeef.oseg", 2 * 86400)
    fresh_part = orphan("part-88888-cafebabe.oseg", 0)
    assert vacuum_segments(d) == 2
    assert not os.path.exists(aged_part)
    assert not os.path.exists(aged_tmp)
    assert os.path.exists(fresh_part)  # live-writer window: untouched
    # referenced files intact; table still reads exactly
    back = spark.read.format("olapseg").option("path", d).load()
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # idempotent; the fresh orphan goes once aged
    os.utime(fresh_part, (time.time() - 2 * 86400,) * 2)
    assert vacuum_segments(d) == 1
    assert vacuum_segments(d) == 0


def test_compaction_loses_to_concurrent_commit(spark, tmp_path):
    """A rewrite job pins the generation it planned at: a commit that
    lands while the rewrite runs makes the overwrite CONFLICT (before
    renaming any temp — nothing orphaned) instead of silently
    unlinking the newcomer's files."""
    import json
    import os

    import pytest as _pytest

    from olap_storage_engine_spark.plans.manifest import (
        ManifestConflictError,
    )
    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        make_datasource,
        register,
    )
    from pyspark.sql.types import _parse_datatype_string

    register(spark)
    d = str(tmp_path / "t")
    rows = [(i, i, "en", "s") for i in range(100)]
    _seg_df(spark, rows).repartition(2).write.format("olapseg").option(
        "path", d
    ).mode("append").save()  # generation 1, 2 files
    schema = _parse_datatype_string(
        "doc_id bigint, n_chars bigint, lang string, source string"
    )
    ds = make_datasource()(options={"path": d, "expected_gen": "1"})
    w = ds.writer(schema, overwrite=True)  # the "compaction" rewrite
    m = w.write(iter([_rb((500, 1, "en", "s"))]))
    # a concurrent stream batch commits while the rewrite job runs
    _seg_df(spark, [(1000, 1, "de", "s")]).repartition(1).write.format(
        "olapseg"
    ).option("path", d).mode("append").save()  # generation 2
    with _pytest.raises(ManifestConflictError, match="generation moved"):
        w.commit([m])
    # nothing orphaned: the rewrite's temp is still a temp (abortable)
    assert os.path.exists(os.path.join(d, m.tmp_name))
    # the newcomer's file and rows survive in the manifest
    man = json.load(open(os.path.join(d, MANIFEST_NAME)))
    assert man["total_rows"] == 101 and man["generation"] == 2
    back = spark.read.format("olapseg").option("path", d).load()
    assert back.count() == 101


def test_batch_writer_rejects_nulls_and_overflow(tmp_path):
    """The Arrow write path fails LOUDLY where silent numpy casts
    would corrupt: nulls (the format has no validity bitmap) and
    n_chars outside int32 (the record stores i32)."""
    import pyarrow as pa
    import pytest as _pytest

    from olap_storage_engine_spark.sources.segment_format import (
        write_segment_batches,
    )

    def rb(ids, nchars, langs, srcs):
        return pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(nchars, pa.int64()),
                pa.array(langs),
                pa.array(srcs),
            ],
            names=["doc_id", "n_chars", "lang", "source"],
        )

    p = str(tmp_path / "t.oseg")
    with _pytest.raises(ValueError, match="null values"):
        write_segment_batches(
            [rb([1, 2], [5, None], ["en", "de"], ["s", "s"])], p
        )
    with _pytest.raises(ValueError, match="null values"):
        write_segment_batches(
            [rb([1, 2], [5, 6], ["en", None], ["s", "s"])], p
        )
    with _pytest.raises(ValueError, match="int32 range"):
        write_segment_batches(
            [rb([1, 2], [5, 2**40], ["en", "de"], ["s", "s"])], p
        )


def test_rewrite_epoch_continuity(spark, tmp_path):
    """Appends (batch append, stream batch) preserve the rewrite
    epoch; overwrite and scoped delete bump it — the incremental
    reader's rewrite detector."""
    import json
    import os

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        delete_range_from_segments,
        register,
    )

    register(spark)
    d = str(tmp_path / "t")

    def epoch():
        return json.load(open(os.path.join(d, MANIFEST_NAME))).get(
            "rewrite_epoch", 0
        )

    rows = [(i, i, "en", "s") for i in range(100)]
    # CREATION via overwrite is not a rewrite (nothing existed): a
    # stream offset minted before the table was created stays valid
    _seg_df(spark, rows).repartition(2).write.format("olapseg").option(
        "path", d
    ).mode("overwrite").save()
    assert epoch() == 0
    _seg_df(spark, [(200, 1, "de", "s")]).repartition(1).write.format(
        "olapseg"
    ).option("path", d).mode("append").save()
    assert epoch() == 0  # append extends history
    delete_range_from_segments(spark, d, 0, 10)
    assert epoch() == 1  # delete rewrites it
    _seg_df(spark, rows).repartition(1).write.format("olapseg").option(
        "path", d
    ).mode("overwrite").save()
    assert epoch() == 2  # overwrite of existing files rewrites it


def test_malformed_manifest_fails_loudly(spark, tmp_path):
    """A manifest that exists but lacks the 'files' key must raise,
    never serve an empty scan as if the table were empty."""
    import json
    import os

    import pytest as _pytest

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        make_datasource,
    )

    d = str(tmp_path / "t")
    os.makedirs(d)
    with open(os.path.join(d, MANIFEST_NAME), "w") as f:
        json.dump({"totally": "unrelated"}, f)
    r = make_datasource()(options={"path": d}).reader(None)
    with _pytest.raises(ValueError, match="malformed"):
        r.partitions()


def test_generation_claim_cas_sweeps_crashed_temps(tmp_path):
    """A writer that crashed between writing its unique temp and the
    link/replace leaks one '<manifest>.*.tmp' per crash; the next
    put's recovery reclaims aged ones (fresh ones survive — they may
    be a live writer's in-flight temp)."""
    import json
    import os
    import time

    from olap_storage_engine_spark.plans.manifest import (
        GenerationClaimCas,
    )

    cas = GenerationClaimCas()
    path = str(tmp_path / "doc.json")
    cas.put_if_generation(path, {"v": "a"}, 0)
    aged = f"{path}.12345.deadbeef.tmp"
    open(aged, "w").write("{}")
    os.utime(aged, (time.time() - 2 * 86400,) * 2)
    fresh = f"{path}.12345.cafebabe.tmp"
    open(fresh, "w").write("{}")
    cas.put_if_generation(path, {"v": "b"}, 1)
    assert not os.path.exists(aged)
    assert os.path.exists(fresh)
    assert json.load(open(path))["v"] == "b"


def test_vacuum_refuses_missing_or_corrupt_manifest(tmp_path):
    """vacuum_segments mirrors the reader's fail-loud stance: a
    missing or 'files'-less manifest raises instead of treating the
    live set as empty — which would delete EVERY aged data file in a
    single-file-layout export or a table whose manifest was lost."""
    import json
    import os
    import time

    import pytest as _pytest

    from olap_storage_engine_spark.sources.segment_format import (
        MANIFEST_NAME,
        vacuum_segments,
        write_segment,
    )

    d = str(tmp_path / "export")
    os.makedirs(d)
    # a single-file-layout export: data, no manifest (by design)
    seg = os.path.join(d, "documents.oseg")
    write_segment([(1, 5, "en", "s")], seg)
    os.utime(seg, (time.time() - 2 * 86400,) * 2)
    with _pytest.raises(ValueError, match="refusing to vacuum"):
        vacuum_segments(d)
    assert os.path.exists(seg)  # nothing was deleted
    # manifest present but corrupt (no 'files'): same stance
    with open(os.path.join(d, MANIFEST_NAME), "w") as f:
        json.dump({"generation": 3}, f)
    with _pytest.raises(ValueError, match="corrupt manifest"):
        vacuum_segments(d)
    assert os.path.exists(seg)


def test_batch_write_utf8_matches_row_write(tmp_path):
    """Non-ASCII lang/source: the Arrow write path UTF-8-encodes then
    truncates at the field's BYTE width, byte-identical to the row
    API's .encode()[:w].ljust(w) — pre-r13 it raised an opaque
    ascii-codec UnicodeEncodeError from numpy instead."""
    from olap_storage_engine_spark.sources.segment_format import (
        open_segment,
        read_block,
        write_segment,
        write_segment_batches,
    )

    rows = [
        (1, 5, "é", "süß"),        # 2-byte char exactly fills lang
        (2, 6, "日本", "データ源"),  # truncation splits a multibyte char
        (3, 7, "", "s"),           # empty pads with spaces
        (4, 8, "en", "plain"),
    ]
    p_row = str(tmp_path / "row.oseg")
    p_bat = str(tmp_path / "bat.oseg")
    write_segment(rows, p_row, block_rows=2)
    n, mn, mx, _ = write_segment_batches([_rb(*rows)], p_bat, block_rows=2)
    assert (n, mn, mx) == (4, 1, 4)
    assert open(p_row, "rb").read() == open(p_bat, "rb").read()
    # the 2-byte 'é' survives the roundtrip intact (hi=1 stops before
    # doc 2, whose truncated lang is deliberately not valid UTF-8 —
    # the same contract as the row API's byte-width cut)
    nrows, block_rows, blocks = open_segment(p_bat)
    assert (nrows, block_rows) == (4, 2)
    (row1,) = read_block(p_bat, 0, 2, hi=1)
    assert row1 == (1, 5, "é", "süß")


def test_planning_caches_invalidate_on_rewrite(tmp_path):
    """The planning-side (mtime_ns, size)-keyed caches serve repeated
    plans without re-parsing/re-validating, and a rewrite of the
    underlying file invalidates them — stale metadata must never
    outlive the bytes it describes."""
    import json
    import os

    from olap_storage_engine_spark.sources import segment_format as sf

    # footer cache: same stat key -> same object; rewrite -> fresh
    p = str(tmp_path / "t.oseg")
    sf.write_segment([(i, i, "en", "s") for i in range(10)], p, 4)
    a = sf.open_segment_cached(p)
    assert sf.open_segment_cached(p) is a  # cache hit
    sf.write_segment([(i, i, "en", "s") for i in range(20)], p, 4)
    b = sf.open_segment_cached(p)
    assert b is not a and b[0] == 20
    # corrupt the file: the cached validator must re-run and raise
    with open(p, "r+b") as f:
        f.seek(30)
        f.write(b"\xff\xff\xff")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sf.open_segment_cached(p)

    # manifest cache: same key -> same doc object; rewrite -> fresh
    d = str(tmp_path / "tbl")
    os.makedirs(d)
    man = os.path.join(d, sf.MANIFEST_NAME)
    with open(man, "w") as f:
        json.dump({"files": [], "generation": 1}, f)
    doc1, g1, _ = sf._load_manifest_read_cached(d)
    doc2, _, _ = sf._load_manifest_read_cached(d)
    assert doc1 is doc2 and g1 == 1
    with open(man, "w") as f:
        json.dump({"files": [], "generation": 2, "pad": "x"}, f)
    doc3, g3, _ = sf._load_manifest_read_cached(d)
    assert g3 == 2 and doc3 is not doc1


def test_three_way_writer_compactor_vacuum_interleavings(spark, tmp_path):
    """VERDICT r12 task 8: the r12 CAS fixes were found by review, not
    test — encode them.  Drive two appenders, a compaction rewrite,
    and vacuum through the interleavings the protocol admits (writer
    protocol objects give deterministic control without threads) and
    check the manifest invariants after EVERY step: unique live names,
    every live file on disk with a footer matching its manifest entry,
    total_rows consistent, and the readable row set exactly the
    committed union."""
    import json
    import os

    import pytest as _pytest

    from olap_storage_engine_spark.plans.manifest import (
        ManifestConflictError,
    )
    from olap_storage_engine_spark.sources import segment_format as sf
    from pyspark.sql.types import _parse_datatype_string

    sf.register(spark)
    d = str(tmp_path / "t")
    man_path_ = lambda: os.path.join(d, sf.MANIFEST_NAME)
    schema = _parse_datatype_string(sf.SEGMENT_SCHEMA)

    committed = set()  # the rows that MUST be readable at all times

    def invariants():
        man = json.load(open(man_path_()))
        names = [e["file"] for e in man["files"]]
        assert len(names) == len(set(names)), "duplicate live names"
        on_disk = {f for f in os.listdir(d) if f.endswith(".oseg")}
        assert set(names) <= on_disk, "manifest points at missing file"
        assert man["total_rows"] == sum(e["rows"] for e in man["files"])
        for e in man["files"]:
            n, _, blocks = sf.open_segment(os.path.join(d, e["file"]))
            assert n == e["rows"]
            assert blocks[0][2] == e["min_id"]
            assert blocks[-1][3] == e["max_id"]
        got = sorted(
            map(
                tuple,
                spark.read.format("olapseg")
                .option("path", d)
                .load()
                .collect(),
            )
        )
        assert got == sorted(committed), "readable rows != committed"
        return man

    def protocol_write(rows_, overwrite=False, expected_gen=None):
        opts = {"path": d}
        if expected_gen is not None:
            opts["expected_gen"] = str(expected_gen)
        ds = sf.make_datasource()(options=opts)
        w = ds.writer(schema, overwrite=overwrite)
        msg = w.write(iter([_rb(*rows_)]))
        return w, msg

    # setup: two committed appends -> 2 files, generation 2
    base = [(i, i, "en", "s") for i in range(40)]
    more = [(i, i, "de", "s") for i in range(100, 140)]
    for batch in (base, more):
        w, m = protocol_write(batch)
        w.commit([m])
        committed.update(batch)
        invariants()

    # Interleaving 1 — two appenders race: both stage, B commits
    # first, A commits second.  Appends UNION (A reloads the
    # generation at commit), so BOTH survive — no lost update.
    rows_a = [(200 + i, 1, "en", "s") for i in range(5)]
    rows_b = [(300 + i, 1, "de", "s") for i in range(5)]
    wa, ma = protocol_write(rows_a)
    wb, mb = protocol_write(rows_b)
    wb.commit([mb])
    committed.update(rows_b)
    invariants()
    wa.commit([ma])
    committed.update(rows_a)
    invariants()

    # Interleaving 2 — compactor vs appender: the rewrite pins the
    # generation it planned at; an append lands mid-job; the rewrite
    # must CONFLICT before renaming anything (no orphan), and abort()
    # reclaims its temp.
    gen_planned = json.load(open(man_path_()))["generation"]
    wc, mc = protocol_write(
        sorted(committed)[:10], overwrite=True, expected_gen=gen_planned
    )
    rows_mid = [(400, 1, "en", "s")]
    wm, mm = protocol_write(rows_mid)
    wm.commit([mm])
    committed.update(rows_mid)
    invariants()
    with _pytest.raises(ManifestConflictError, match="generation moved"):
        wc.commit([mc])
    assert os.path.exists(os.path.join(d, mc.tmp_name))  # still a temp
    invariants()
    wc.abort([mc])
    assert not os.path.exists(os.path.join(d, mc.tmp_name))
    invariants()

    # Interleaving 3 — a writer that renamed its parts and THEN lost
    # the raw CAS (the window the expected_gen pre-check can't close):
    # its part files are orphans invisible to readers; vacuum(0)
    # reclaims them; nothing live is touched.
    w3, m3 = protocol_write([(500, 1, "en", "s")])
    orphan = f"part-99999-{m3.tmp_name[len('_tmp-'):]}"
    os.replace(os.path.join(d, m3.tmp_name), os.path.join(d, orphan))
    man_now = json.load(open(man_path_()))
    with _pytest.raises(ManifestConflictError):
        sf._cas_publish(
            man_path_(),
            dict(man_now, stale=True),
            man_now["generation"] - 1,  # loaded before the last commit
        )
    assert os.path.exists(os.path.join(d, orphan))
    invariants()  # orphan invisible: readable set unchanged
    removed = sf.vacuum_segments(d, min_age_sec=0.0)
    assert removed == 1
    assert not os.path.exists(os.path.join(d, orphan))
    invariants()

    # Interleaving 4 — vacuum vs an IN-FLIGHT writer: a fresh renamed
    # part (between task rename and manifest publish) and a fresh temp
    # must BOTH survive an age-gated vacuum; completing the commit
    # then exposes the rows.
    w4, m4 = protocol_write([(600, 1, "en", "s")])
    assert sf.vacuum_segments(d, min_age_sec=3600.0) == 0
    assert os.path.exists(os.path.join(d, m4.tmp_name))
    invariants()
    w4.commit([m4])
    committed.add((600, 1, "en", "s"))
    invariants()

    # Interleaving 5 — compactor wins cleanly when nothing races: the
    # rewrite replaces the many small files, unlinks what it orphaned,
    # and the row set is unchanged.
    gen_now = json.load(open(man_path_()))["generation"]
    files_before = len(json.load(open(man_path_()))["files"])
    assert files_before > 1
    wq, mq = protocol_write(
        sorted(committed), overwrite=True, expected_gen=gen_now
    )
    wq.commit([mq])
    man_final = invariants()
    assert len(man_final["files"]) == 1
    assert man_final["rewrite_epoch"] >= 1
    # no stray part files: overwrite unlinked everything it replaced
    on_disk = {f for f in os.listdir(d) if f.endswith(".oseg")}
    assert on_disk == {man_final["files"][0]["file"]}


def test_stream_sink_concurrency_interleavings(spark, tmp_path):
    """VERDICT r13 task 7: extend the appender×compactor×vacuum
    matrix with the STREAMING sink actor — OlapSegStreamWriter
    commits through the same CAS but never appeared in an
    interleaving.  Drives: a batch appender landing between
    micro-batches, a compaction rewrite that must preserve
    last_batch_id (so replay stays refused across history rewrites),
    a micro-batch that LOSES the CAS race to a concurrent appender
    landing inside its commit window (renamed parts become invisible
    orphans; the replayed attempt lands exactly once; vacuum reclaims
    the orphans), and an age-gated vacuum sparing an in-flight
    micro-batch temp.  Manifest invariants checked after every
    step."""
    import json
    import os

    import pytest as _pytest

    from olap_storage_engine_spark.plans.manifest import (
        ManifestConflictError,
    )
    from olap_storage_engine_spark.sources import segment_format as sf
    from pyspark.sql.types import _parse_datatype_string

    sf.register(spark)
    d = str(tmp_path / "t")
    man_path_ = lambda: os.path.join(d, sf.MANIFEST_NAME)
    schema = _parse_datatype_string(sf.SEGMENT_SCHEMA)

    committed = set()

    def invariants():
        man = json.load(open(man_path_()))
        names = [e["file"] for e in man["files"]]
        assert len(names) == len(set(names)), "duplicate live names"
        on_disk = {f for f in os.listdir(d) if f.endswith(".oseg")}
        assert set(names) <= on_disk, "manifest points at missing file"
        assert man["total_rows"] == sum(e["rows"] for e in man["files"])
        got = sorted(
            map(
                tuple,
                spark.read.format("olapseg")
                .option("path", d)
                .load()
                .collect(),
            )
        )
        assert got == sorted(committed), "readable rows != committed"
        return man

    def protocol_write(rows_, overwrite=False, expected_gen=None):
        opts = {"path": d}
        if expected_gen is not None:
            opts["expected_gen"] = str(expected_gen)
        ds = sf.make_datasource()(options=opts)
        w = ds.writer(schema, overwrite=overwrite)
        msg = w.write(iter([_rb(*rows_)]))
        return w, msg

    sw = sf.make_datasource()(options={"path": d}).streamWriter(
        schema, overwrite=False
    )

    # micro-batch 0 commits cleanly
    rows0 = [(i, i, "en", "s") for i in range(10)]
    sw.commit([sw.write(iter([_rb(*rows0)]))], 0)
    committed.update(rows0)
    invariants()

    # Interleaving S1 — a batch APPENDER lands between micro-batches;
    # batch 1 commits on top: both survive (append-union, the stream
    # commit reloads the generation it publishes against).
    rows_app = [(100 + i, 1, "de", "s") for i in range(5)]
    wa, ma = protocol_write(rows_app)
    wa.commit([ma])
    committed.update(rows_app)
    invariants()
    rows1 = [(200 + i, 1, "en", "s") for i in range(5)]
    sw.commit([sw.write(iter([_rb(*rows1)]))], 1)
    committed.update(rows1)
    man = invariants()
    assert man["last_batch_id"] == 1

    # Interleaving S2 — COMPACTION rewrites history between
    # micro-batches; last_batch_id must survive the rewrite, so a
    # replayed batch 1 (restart between sink commit and checkpoint
    # advance, now ACROSS a compaction) is still refused: temps
    # dropped, nothing changes.
    gen_now = json.load(open(man_path_()))["generation"]
    wc, mc = protocol_write(
        sorted(committed), overwrite=True, expected_gen=gen_now
    )
    wc.commit([mc])
    man = invariants()
    assert len(man["files"]) == 1
    assert man["last_batch_id"] == 1, "rewrite dropped the batch ledger"
    m1r = sw.write(iter([_rb(*rows1)]))  # the replay's fresh attempt
    sw.commit([m1r], 1)
    assert not os.path.exists(os.path.join(d, m1r.tmp_name))
    invariants()  # readable set unchanged — exactly-once held

    # Interleaving S3 — the LOST RACE: a concurrent appender publishes
    # inside batch 2's commit window (after the stream renamed its
    # parts, before its CAS).  The stream commit must conflict; its
    # renamed parts are invisible orphans; the replayed attempt lands
    # exactly once; vacuum(0) reclaims the orphans only.
    rows2 = [(300 + i, 1, "en", "s") for i in range(5)]
    m2 = sw.write(iter([_rb(*rows2)]))
    rows_race = [(400, 1, "de", "s")]
    real_pub = sf._cas_publish

    def racing_pub(man_path, doc, expected_gen, cas=None):
        sf._cas_publish = real_pub  # fire exactly once
        wx, mx = protocol_write(rows_race)
        wx.commit([mx])
        committed.update(rows_race)
        return real_pub(man_path, doc, expected_gen, cas)

    sf._cas_publish = racing_pub
    try:
        with _pytest.raises(ManifestConflictError):
            sw.commit([m2], 2)
    finally:
        sf._cas_publish = real_pub
    orphans = {
        f
        for f in os.listdir(d)
        if f.startswith("part-b000002-") and f.endswith(".oseg")
    }
    assert orphans, "lost race left no renamed part (test premise)"
    invariants()  # orphans invisible: readable set == committed
    m2r = sw.write(iter([_rb(*rows2)]))
    sw.commit([m2r], 2)
    committed.update(rows2)
    invariants()
    removed = sf.vacuum_segments(d, min_age_sec=0.0)
    assert removed == len(orphans)
    for f in orphans:
        assert not os.path.exists(os.path.join(d, f))
    invariants()

    # Interleaving S4 — vacuum vs an IN-FLIGHT micro-batch: the
    # staged temp survives an age-gated vacuum; committing then
    # exposes the rows exactly once.
    rows3 = [(500, 1, "en", "s")]
    m3 = sw.write(iter([_rb(*rows3)]))
    assert sf.vacuum_segments(d, min_age_sec=3600.0) == 0
    assert os.path.exists(os.path.join(d, m3.tmp_name))
    invariants()
    sw.commit([m3], 3)
    committed.update(rows3)
    man = invariants()
    assert man["last_batch_id"] == 3


def test_single_file_task_read_validates(tmp_path):
    """The single-file block task validates the segment in the
    EXECUTOR worker before serving (r13: the planning-side footer
    cache must never become the only validation for a worker's
    lifetime).  A fresh worker (cold cache) reading a corrupted
    segment raises instead of decoding garbage."""
    import pytest as _pytest

    from olap_storage_engine_spark.sources import segment_format as sf

    p = str(tmp_path / "t.oseg")
    sf.write_segment([(i, i, "en", "s") for i in range(100)], p, 25)
    r = sf.make_datasource()(options={"path": p}).reader(None)
    parts = r.partitions()  # driver-side validation, cache warm
    assert len(parts) == 4
    # bytes rot after planning; a new executor worker has a cold cache
    with open(p, "r+b") as f:
        f.seek(40)
        f.write(b"\xde\xad")
    sf._FOOTER_CACHE.clear()
    with _pytest.raises(ValueError):
        list(r.read(parts[0]))


def test_single_file_task_detects_swapped_file(tmp_path):
    """A VALID but DIFFERENT segment swapped in between planning and
    task execution passes CRC — the task must still refuse, because
    the planned (start_row, n) offsets describe the OLD layout."""
    import os

    import pytest as _pytest

    from olap_storage_engine_spark.sources import segment_format as sf

    p = str(tmp_path / "t.oseg")
    sf.write_segment([(i, i, "en", "s") for i in range(100)], p, 25)
    r = sf.make_datasource()(options={"path": p}).reader(None)
    parts = r.partitions()
    assert len(parts) == 4
    # writer replaces the file with a valid segment of another layout
    p2 = str(tmp_path / "new.oseg")
    sf.write_segment([(i, i, "de", "s") for i in range(10)], p2, 4)
    os.replace(p2, p)
    sf._FOOTER_CACHE.clear()  # fresh executor worker
    with _pytest.raises(ValueError, match="changed between planning"):
        list(r.read(parts[0]))


def test_single_file_task_detects_same_layout_swap(tmp_path):
    """The hard case (r13 ADVICE): the swapped-in segment has an
    IDENTICAL block layout — same row count, same block_rows, so every
    (start_row, n) matches the planned block — but holds DIFFERENT
    rows.  The task-side check must compare the block's id envelope
    too, not just offsets, or the swap silently serves wrong rows."""
    import os

    import pytest as _pytest

    from olap_storage_engine_spark.sources import segment_format as sf

    p = str(tmp_path / "t.oseg")
    sf.write_segment([(i, i, "en", "s") for i in range(100)], p, 25)
    r = sf.make_datasource()(options={"path": p}).reader(None)
    parts = r.partitions()
    assert len(parts) == 4
    # equal-cardinality overwrite: 100 rows, block_rows=25, but the
    # doc_id space is shifted — every (start_row, n) pair is identical
    p2 = str(tmp_path / "new.oseg")
    sf.write_segment(
        [(i + 1000, i, "de", "s") for i in range(100)], p2, 25
    )
    os.replace(p2, p)
    sf._FOOTER_CACHE.clear()  # fresh executor worker
    with _pytest.raises(ValueError, match="changed between planning"):
        list(r.read(parts[0]))


def test_footer_cache_not_poisoned_by_mid_read_swap(tmp_path):
    """stat-read-STAT (r13 ADVICE): a rewrite landing between the
    cache's stat and its read must not insert the NEW file's footer
    under the OLD stat key — later callers with the old version still
    on disk elsewhere would be served a misattributed footer.  The
    read's own result is fine (it is the current file); only the
    cache insert must be suppressed."""
    import os

    from olap_storage_engine_spark.sources import segment_format as sf

    p = str(tmp_path / "t.oseg")
    sf.write_segment([(i, i, "en", "s") for i in range(20)], p, 5)
    p2 = str(tmp_path / "new.oseg")
    sf.write_segment([(i, i, "de", "s") for i in range(8)], p2, 4)

    sf._FOOTER_CACHE.clear()
    real_open = sf.open_segment

    def swapping_open(path):
        # simulate the race: the rewrite lands AFTER the caller's
        # stat but BEFORE/DURING its read — the bytes read belong to
        # the new version while the pre-read stat key names the old
        os.replace(p2, p)
        return real_open(path)

    sf.open_segment = swapping_open
    try:
        res = sf.open_segment_cached(p)
    finally:
        sf.open_segment = real_open
    # the returned footer is the new file's (4 blocks of the 8-row
    # segment = 2 blocks) — correct for the current file...
    assert len(res[2]) == 2
    # ...but it must NOT be cached: the pre-read key named the old
    # version.  A subsequent call re-reads and caches under the key
    # that actually matches the bytes.
    assert p not in sf._FOOTER_CACHE
    res2 = sf.open_segment_cached(p)
    assert len(res2[2]) == 2
    assert p in sf._FOOTER_CACHE
