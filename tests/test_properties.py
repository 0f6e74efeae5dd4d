"""Property-based tests (hypothesis) for the pure-Python engine parts
— SURVEY §5 strategy #3.  Spark-free, so hundreds of examples are
cheap."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from olap_storage_engine_spark.operators.routing import fnv1a64, fnv1a64_np
from olap_storage_engine_spark.plans.manifest import RowsetMeta, VersionGraph
from olap_storage_engine_spark.spec import PartitionPolicy, PartitionType


@given(st.lists(st.text(max_size=40), max_size=30))
@settings(max_examples=200, deadline=None)
def test_fnv_vectorized_equals_scalar(strings):
    out = fnv1a64_np(pd.Series(strings, dtype=object))
    assert [int(h) for h in out] == [fnv1a64(s) for s in strings]


@given(
    st.lists(
        st.tuples(st.text("abc", min_size=1, max_size=4),
                  st.text("0123456789", min_size=1, max_size=6)),
        min_size=1,
        max_size=10,
    ),
    st.text("0123456789", max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_range_routing_matches_linear_model(bounds, key):
    """Binary-search routing == the reference's linear first-match scan
    over sorted bounds (src/partition.rs:180-184)."""
    policy = PartitionPolicy(PartitionType.RANGE, "c", bounds=bounds)
    expect = None
    for name, upper in policy.bounds:  # sorted ascending by upper
        if key < upper:
            expect = name
            break
    assert policy.find_partition(key) == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 3)),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 9),
)
@settings(max_examples=300, deadline=None)
def test_version_cover_is_valid_chain(intervals, hi):
    """Any cover the BFS returns is a gapless chain lo..hi; and when it
    returns None, no single rowset alone covers the range either."""
    rowsets = [
        RowsetMeta(i + 1, lo, lo + span, f"v{i}")
        for i, (lo, span) in enumerate(intervals)
    ]
    g = VersionGraph(rowsets)
    cover = g.find_covering_path(0, hi)
    if cover is not None:
        pos = 0
        for rs in cover:
            assert rs.start_version == pos
            pos = rs.end_version + 1
        assert pos == hi + 1
    else:
        assert not any(
            rs.start_version == 0 and rs.end_version == hi for rs in rowsets
        )


@given(st.lists(st.integers(0, 5), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_partitions_for_range_covers_routing(keys):
    """Every key routed to a partition must have that partition in the
    pruning result for any range containing the key."""
    policy = PartitionPolicy(
        PartitionType.RANGE, "c",
        bounds=[("p0", "2"), ("p1", "4"), ("p2", "9")],
    )
    for k in keys:
        name = policy.find_partition(str(k))
        if name is None:
            continue
        labels = policy.partitions_for_range(str(k), str(k + 1))
        assert name in labels


@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 100)),
        min_size=1,
        max_size=12,
    ),
    st.integers(0, 100),
    st.integers(0, 100),
)
@settings(max_examples=300, deadline=None)
def test_stats_match_never_skips_a_containing_rowset(ranges, lo, hi):
    """Data-skipping soundness: for ANY stored [min, max] and ANY query
    range, a rowset whose stats contain a value inside the query range
    must match (skipping is only ever allowed when intersection is
    impossible); and missing stats always match."""
    from olap_storage_engine_spark.table import OlapTable

    lo, hi = min(lo, hi), max(lo, hi)
    for a, b in ranges:
        mn, mx = min(a, b), max(a, b)
        rs = RowsetMeta(1, 0, 0, "p", col_stats={"k": [mn, mx]})
        match = OlapTable._stats_match(rs, "k", lo, hi)
        intersects = not (lo > mx or hi < mn)
        assert match == intersects
        # any value both in stats and in range implies a match
        for v in (mn, mx, (mn + mx) // 2):
            if lo <= v <= hi:
                assert match
    assert OlapTable._stats_match(RowsetMeta(1, 0, 0, "p"), "k", lo, hi)
    assert OlapTable._stats_match(
        RowsetMeta(1, 0, 0, "p", col_stats={"other": [0, 1]}), "k", lo, hi
    )


@given(
    st.integers(1, 10),
    st.integers(0, 12),
)
@settings(max_examples=200, deadline=None)
def test_rollback_visible_set_and_respawn(n_versions, cut):
    """Manifest rollback algebra on single-version publish chains:
    rowsets after the cut flip STALE, max_version = cut (clamped), and
    the remaining chain still covers [0, cut]."""
    import tempfile

    from olap_storage_engine_spark.plans.manifest import Manifest

    root = tempfile.mkdtemp(prefix="mrb_")
    m = Manifest(root)
    m.save()
    for v in range(n_versions):
        m.publish(RowsetMeta(v + 1, v, v, f"__rsv={v}_{v}"))
    cut = min(cut, n_versions - 1)
    stale = m.rollback(cut)
    assert m.max_version == cut
    vis = {r.start_version for r in m.visible_rowsets()}
    assert vis == set(range(cut + 1))
    assert len(stale) == n_versions - 1 - cut
    cover = m.capture_consistent_versions(0, cut)
    assert [r.start_version for r in cover] == list(range(cut + 1))


@given(
    st.lists(
        st.tuples(
            st.integers(0, 255),  # y
            st.integers(0, 255),  # cb
            st.integers(0, 255),  # cr
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 4).map(lambda m: 8 * m),  # width, whole MCUs
    st.integers(1, 3).map(lambda m: 8 * m),  # height
)
@settings(max_examples=60, deadline=None)
def test_avi_mjpeg_container_roundtrip(frame_colors, w, h):
    """Any frame count / size / flat-YCbCr content round-trips through
    the AVI container bit-for-bit (frames re-decode to exactly what a
    bare JPEG roundtrip gives), and index-seek sampling slices the
    same bytes the sequential walk would."""
    import numpy as np

    from olap_storage_engine_spark.operators import avicodec as A
    from olap_storage_engine_spark.operators import jpegcodec as J

    jpegs = []
    for y, cb, cr in frame_colors:
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = y, cb, cr
        jpegs.append(J.encode_jpeg(img))
    buf = A.encode_avi_mjpeg(jpegs, w, h)
    meta, ranges = A.parse_avi_mjpeg(buf)
    assert meta["n_frames"] == len(jpegs)
    assert (meta["width"], meta["height"]) == (w, h)
    # indexed byte ranges recover each original frame exactly
    for (s, ln), jb in zip(ranges, jpegs):
        assert buf[s : s + ln] == jb
    # sampled decode == decoding the sampled originals
    for k in (1, 2, 3):
        _, frames = A.decode_frames(buf, every_k=k)
        expect = [J.decode_jpeg(jb) for jb in jpegs[::k]]
        assert len(frames) == len(expect)
        for got, exp in zip(frames, expect):
            assert (got == exp).all()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.integers(min_value=0, max_value=2**31 - 1),
            st.text(alphabet="abcdefgh", min_size=0, max_size=2),
            st.text(alphabet="stuvwxyz", min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=40, deadline=None)
def test_segment_batch_write_roundtrip_property(rows, block_rows, n_batches):
    """Arbitrary rows through the Arrow batch writer, split across
    arbitrary batch boundaries, read back EXACTLY the doc_id-sorted
    input through both the row decoder and the Arrow block decoder —
    and the built bloom has no false negatives."""
    import tempfile

    import numpy as np
    import pyarrow as pa

    from olap_storage_engine_spark.sources import segment_format as sf

    def rb(chunk):
        return pa.RecordBatch.from_arrays(
            [
                pa.array([t[0] for t in chunk], pa.int64()),
                pa.array([t[1] for t in chunk], pa.int64()),
                pa.array([t[2] for t in chunk]),
                pa.array([t[3] for t in chunk]),
            ],
            names=["doc_id", "n_chars", "lang", "source"],
        )

    # split rows into n_batches contiguous chunks (some may be empty)
    k = max(1, len(rows) // n_batches)
    batches = [rb(rows[i : i + k]) for i in range(0, len(rows), k)]
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t.oseg"
        n, mn, mx, bloom = sf.write_segment_batches(
            batches, path, block_rows
        )
        assert n == len(rows)
        ids = sorted(t[0] for t in rows)
        assert (mn, mx) == (ids[0], ids[-1])
        n_rows, br, blocks = sf.open_segment(path)  # fail-loud validate
        assert n_rows == n and br == block_rows
        got = [
            r for b in blocks for r in sf.read_block(path, b[0], b[1])
        ]
        want = sorted(
            ((t[0], t[1], t[2], t[3]) for t in rows),
            key=lambda t: t[0],
        )
        # stored strings are space-padded/truncated; decode strips
        want = [(a, b, c[:2].strip(), s[:8].strip()) for a, b, c, s in want]
        got = [(a, b, c.strip(), s.strip()) for a, b, c, s in got]
        assert sorted(got) == sorted(want)
        # Arrow decode agrees with the row decode block-by-block
        for b in blocks:
            batch = sf.read_block_batch(path, b[0], b[1])
            assert batch.num_rows == b[1]
        # bloom: no false negatives over every present id
        assert bloom is not None
        assert sf.bloom_may_contain_any(bloom, list(set(ids)))
        for v in set(ids):
            assert sf.bloom_may_contain_any(bloom, [v])


def test_fnv_hash_col_column_path_matches_scalar_golden(spark):
    """r14: whatever implements fnv_hash_col (today the Arrow-batched
    numpy UDF — a pure-JVM higher-order fold was tried and measured 3x
    SLOWER at 600k rows, see OPTIMIZATION_r14.md) must stay bit-exact
    with the scalar golden end-to-end through Spark — including
    multi-byte UTF-8, empty strings, long strings, and the pandas
    path's 'None' null convention."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.operators.routing import (
        fnv1a64,
        fnv_hash_col,
    )

    vals = [
        "", "a", "hello", "12345", "None", "日本語テキスト",
        "x" * 300, "\x01\x02", "naïve café", None, "-42",
        "9223372036854775807",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = df.select("s", fnv_hash_col(F.col("s")).alias("h")).collect()
    for r in got:
        want = fnv1a64(str(r["s"]) if r["s"] is not None else "None")
        want_signed = want - (1 << 64) if want >= (1 << 63) else want
        assert r["h"] == want_signed, repr(r["s"])
