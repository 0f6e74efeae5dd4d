"""Incremental secondary-index maintenance — operators/indexes.

Invariant under test: refresh-per-publish ≡ rebuild-from-scratch
(reference A15 materialized-index metadata, src/partition.rs:75, made
operational)."""

from pyspark.sql import functions as F

from olap_storage_engine_spark.operators.indexes import (
    postings_delta_refresh,
    postings_from,
)
from olap_storage_engine_spark.spec import (
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    KeysType,
    TableSpec,
)
from olap_storage_engine_spark.table import OlapTable


def _docs_table(spark, warehouse):
    spec = TableSpec(
        name="docs_v",
        columns=[
            ColumnSpec.key("doc_id", ColumnType.INT64),
            ColumnSpec.value("text", ColumnType.VARCHAR),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "doc_id", 2),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _postings_table(spark, warehouse, name="post"):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("term", ColumnType.VARCHAR),
            ColumnSpec.value("doc_id", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "term", 4),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _rows(df):
    return sorted(tuple(r) for r in df.select("term", "doc_id").collect())


def test_refreshed_equals_rebuilt(spark, warehouse):
    docs = _docs_table(spark, warehouse)
    base = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(3, "gamma epsilon"), (4, "zeta alpha")], "doc_id long, text string"
    )
    docs.write(base)  # version 0
    docs.write(delta)  # version 1

    # incremental: build from the base rowset, refresh for the delta
    inc = _postings_table(spark, warehouse, "post_inc")
    inc.write(postings_from(docs.read(0, 0)))
    postings_delta_refresh(docs, inc, 1, 1)

    # from-scratch rebuild over the full corpus
    full = _postings_table(spark, warehouse, "post_full")
    full.write(postings_from(docs.read()))

    assert _rows(inc.read()) == _rows(full.read())


def test_refresh_touches_only_delta(spark, warehouse):
    """The refresh's new rowset holds exactly the delta docs' postings
    — proof it never re-shingled the base corpus."""
    docs = _docs_table(spark, warehouse)
    docs.write(
        spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    )
    docs.write(spark.createDataFrame([(10, "x y")], "doc_id long, text string"))

    post = _postings_table(spark, warehouse)
    post.write(postings_from(docs.read(0, 0)))
    postings_delta_refresh(docs, post, 1, 1)

    delta_rows = _rows(post.read(1, 1))
    assert delta_rows == [("x", 10), ("y", 10)]
    # and the full index serves terms from both rowsets
    assert _rows(post.read().filter(F.col("term") == "b")) == [("b", 1), ("b", 2)]


def _emb_table(spark, warehouse, name="emb_v"):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("vec_id", ColumnType.INT64),
            ColumnSpec.value("embedding", ColumnType.ARRAY_FLOAT),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "vec_id", 2),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _cells_table(spark, warehouse, cent_ids, name="cells"):
    from olap_storage_engine_spark.spec import PartitionPolicy, PartitionType

    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("cent_id", ColumnType.INT64),
            ColumnSpec.key("vec_id", ColumnType.INT64),
            ColumnSpec.value("embedding", ColumnType.ARRAY_FLOAT),
        ],
        keys_type=KeysType.DUPLICATE,
        partition=PartitionPolicy(
            PartitionType.LIST,
            "cent_id",
            mapping={str(c): f"c{c}" for c in cent_ids},
        ),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_cells_refresh_equals_rebuild(spark, warehouse):
    """ANN-index sibling of the postings invariant: per-publish cell
    refresh ≡ from-scratch assignment of the full corpus."""
    from olap_storage_engine_spark.operators.indexes import (
        ivf_cells_delta_refresh,
    )
    from olap_storage_engine_spark.operators.similarity import ivf_cell_assign

    emb = _emb_table(spark, warehouse)
    emb.write(
        _vecs(spark, [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])])
    )  # version 0: base
    emb.write(
        _vecs(spark, [(4, [0.1, 0.9]), (5, [1.0, 0.1])])
    )  # version 1: delta
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.0, 1.0])], "cent_id long, cent_vec array<double>"
    )

    inc = _cells_table(spark, warehouse, [1, 3], "cells_inc")
    inc.write(ivf_cell_assign(emb.read(0, 0), cents))
    ivf_cells_delta_refresh(emb, inc, cents, 1, 1)

    full = _cells_table(spark, warehouse, [1, 3], "cells_full")
    full.write(ivf_cell_assign(emb.read(), cents))

    def rows(t):
        return sorted(
            (r["cent_id"], r["vec_id"])
            for r in t.read().select("cent_id", "vec_id").collect()
        )

    assert rows(inc) == rows(full)
    # the refresh's own rowset holds exactly the delta's assignments —
    # proof the base corpus was never re-assigned
    assert sorted(
        (r["cent_id"], r["vec_id"])
        for r in inc.read(1, 1).select("cent_id", "vec_id").collect()
    ) == [(1, 5), (3, 4)]


def test_ivf_cells_read_pruned_lists_only_probed_cells(spark, warehouse):
    """read_pruned on the cell table keeps unprobed cells' files out of
    the scan: the 100 TB serving property (PartitionFilters on __pt)."""
    from olap_storage_engine_spark.operators.similarity import ivf_cell_assign

    emb = _emb_table(spark, warehouse, "emb_p")
    emb.write(
        _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.95, 0.05])])
    )
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "cent_id long, cent_vec array<double>"
    )
    cells = _cells_table(spark, warehouse, [1, 2], "cells_p")
    cells.write(ivf_cell_assign(emb.read(), cents))

    pruned = cells.read_pruned(in_values=[1])
    assert sorted(r["vec_id"] for r in pruned.collect()) == [1, 3]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "__pt" in plan  # directory-level pruning, not a row filter


def test_ivf_probe_cells_local_matches_distributed(spark, warehouse):
    """The driver-side router resolve is bit-identical to the
    distributed assignment (same sequential double fold, same
    tie-break) — including on a deliberate near-tie."""
    from olap_storage_engine_spark.operators.similarity import (
        ivf_probe_cells,
        ivf_probe_cells_local,
    )

    probes = _vecs(
        spark,
        [(1, [1.0, 1.0]), (2, [0.3, 0.7]), (3, [0.5, 0.5])],  # 3 = exact tie
    )
    cent_rows = [(10, [1.0, 0.0]), (20, [0.0, 1.0]), (30, [0.6, 0.8])]
    cents = spark.createDataFrame(
        cent_rows, "cent_id long, cent_vec array<double>"
    )
    dist = sorted(
        (r["probe_id"], r["cent_id"])
        for r in ivf_probe_cells(probes, cents, n_probe=2).collect()
    )
    local = sorted(
        (pid, cid)
        for pid, _, cid in ivf_probe_cells_local(
            [(r["vec_id"], r["embedding"]) for r in probes.collect()],
            cent_rows,
            n_probe=2,
        )
    )
    assert dist == local


def test_delta_min_term_from_footers(spark, warehouse):
    """column_min with version bounds resolves the probe term from the
    delta rowset's parquet footers only."""
    docs = _docs_table(spark, warehouse)
    docs.write(spark.createDataFrame([(1, "mm nn")], "doc_id long, text string"))
    docs.write(spark.createDataFrame([(2, "aa zz")], "doc_id long, text string"))
    post = _postings_table(spark, warehouse)
    post.write(postings_from(docs.read(0, 0)))
    postings_delta_refresh(docs, post, 1, 1)
    assert post.column_min("term") == "aa"
    assert post.column_min("term", lo=0, hi=0) == "mm"
    assert post.column_min("term", lo=1, hi=1) == "aa"


def _codes_table(spark, warehouse, name="pq_codes_v"):
    spec = TableSpec(
        name=name,
        columns=[
            ColumnSpec.key("vec_id", ColumnType.INT64),
            ColumnSpec.value("codes", ColumnType.ARRAY_INT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "vec_id", 2),
    )
    return OlapTable.create(spark, spec, warehouse, overwrite=True)


def _emb4(spark, rows):
    # 4-dim vectors for a tiny m=2 PQ
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_refresh_equals_rebuild(spark, warehouse):
    """Compressed-ANN sibling of the postings/cells invariant:
    per-publish PQ code refresh ≡ from-scratch encode, and the codes
    table is pinned to its codebook generation."""
    import pytest

    from olap_storage_engine_spark.operators.indexes import (
        PQ_CODEBOOK_PROP,
        StaleCodebookError,
        pq_codebook_generation,
        pq_codes_delta_refresh,
    )
    from olap_storage_engine_spark.operators.similarity import pq_encode

    emb = _emb_table(spark, warehouse, "emb_pqr")
    emb.write(
        _emb4(
            spark,
            [
                (1, [1.0, 0.0, 0.0, 1.0]),
                (2, [0.9, 0.1, 0.1, 0.9]),
                (3, [0.0, 1.0, 1.0, 0.0]),
            ],
        )
    )  # v0: base
    emb.write(
        _emb4(spark, [(4, [0.1, 0.9, 0.8, 0.2]), (5, [1.0, 0.1, 0.0, 0.9])])
    )  # v1: delta
    cb = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]),
            (0, 1, [0.0, 1.0]),
            (1, 0, [0.0, 1.0]),
            (1, 1, [1.0, 0.0]),
        ],
        "sub_id long, code_id long, code_vec array<double>",
    )

    inc = _codes_table(spark, warehouse, "codes_inc")
    pq_codes_delta_refresh(emb, inc, cb, 0, 0, m=2, dim=4)
    assert inc.manifest.get_property(PQ_CODEBOOK_PROP) == (
        pq_codebook_generation(cb)
    )
    pq_codes_delta_refresh(emb, inc, cb, 1, 1, m=2, dim=4)

    full = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb.read(), cb, m=2, dim=4).collect()
    )
    got = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in inc.read().select("vec_id", "codes").collect()
    )
    assert got == full
    # the refresh's own rowset holds exactly the delta's codes
    assert sorted(
        r["vec_id"] for r in inc.read(1, 1).select("vec_id").collect()
    ) == [4, 5]
    # staleness pin: a different codebook generation refuses to append
    cb2 = spark.createDataFrame(
        [
            (0, 0, [0.7, 0.7]),
            (0, 1, [0.0, 1.0]),
            (1, 0, [0.0, 1.0]),
            (1, 1, [1.0, 0.0]),
        ],
        "sub_id long, code_id long, code_vec array<double>",
    )
    with pytest.raises(StaleCodebookError):
        pq_codes_delta_refresh(emb, inc, cb2, 1, 1, m=2, dim=4)


def _docs2(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_index_refresh_equals_rebuild(spark, warehouse):
    """Append-only shingle-index maintenance: per-publish refresh ≡
    from-scratch shingling of the full corpus (both widths, both hash
    columns)."""
    from olap_storage_engine_spark.operators.indexes import (
        shingle_index_delta_refresh,
        shingle_rows_from,
    )

    docs = _docs_table(spark, warehouse)
    docs.write(
        _docs2(
            spark,
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
            ],
        )
    )  # v0
    docs.write(
        _docs2(spark, [(3, "red green blue cyan magenta yellow")])
    )  # v1

    idx_spec = TableSpec(
        name="shidx",
        columns=[
            ColumnSpec.key("doc_id", ColumnType.INT64),
            ColumnSpec.key("n", ColumnType.INT64),
            ColumnSpec.key("sh", ColumnType.INT64),
            ColumnSpec.value("sz", ColumnType.INT64),
            ColumnSpec.value("mh", ColumnType.INT64),
            ColumnSpec.value("m", ColumnType.INT64),
            ColumnSpec.value("sh1", ColumnType.INT64),
        ],
        keys_type=KeysType.DUPLICATE,
        bucket=BucketSpec(BucketType.HASH, "sh", 2),
    )
    idx = OlapTable.create(spark, idx_spec, warehouse, overwrite=True)
    cols = ["doc_id", "n", "sz", "sh", "mh", "m", "sh1"]
    idx.write(shingle_rows_from(docs.read(0, 0)).select(*cols))
    shingle_index_delta_refresh(docs, idx, 1, 1)

    got = sorted(tuple(r) for r in idx.read().select(*cols).collect())
    want = sorted(
        tuple(r) for r in shingle_rows_from(docs.read()).select(*cols).collect()
    )
    assert got == want and len(got) > 0


def test_minhash_sigs_refresh_handles_updates(spark, warehouse):
    """Signature-index maintenance under UNIQUE collapse: a
    re-published document's NEW signature supersedes the old at read
    time — refresh ≡ rebuild even for updates, not just appends."""
    from olap_storage_engine_spark.operators.dedup import (
        minhash_signatures,
    )
    from olap_storage_engine_spark.operators.indexes import (
        minhash_sigs_delta_refresh,
    )

    # UNIQUE docs table: an update means "latest text wins" — the
    # semantics the signature index must track
    spec = TableSpec(
        name="docs_u",
        columns=[
            ColumnSpec.key("doc_id", ColumnType.INT64),
            ColumnSpec.value("text", ColumnType.VARCHAR),
        ],
        keys_type=KeysType.UNIQUE,
        bucket=BucketSpec(BucketType.HASH, "doc_id", 2),
    )
    docs = OlapTable.create(spark, spec, warehouse, overwrite=True)
    docs.write(
        _docs2(
            spark,
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
            ],
        )
    )  # v0
    docs.write(
        _docs2(spark, [(2, "totally different text for doc two now")])
    )  # v1: UPDATE of doc 2

    k = 4
    sig_cols = [f"mh{i}" for i in range(k)]
    sig_spec = TableSpec(
        name="mhsigs",
        columns=[ColumnSpec.key("doc_id", ColumnType.INT64)]
        + [ColumnSpec.value(c, ColumnType.INT64) for c in sig_cols],
        keys_type=KeysType.UNIQUE,
        bucket=BucketSpec(BucketType.HASH, "doc_id", 2),
    )
    sigs = OlapTable.create(spark, sig_spec, warehouse, overwrite=True)
    minhash_sigs_delta_refresh(docs, sigs, 0, 0, num_hashes=k)
    minhash_sigs_delta_refresh(docs, sigs, 1, 1, num_hashes=k)

    got = sorted(
        tuple(r) for r in sigs.read().select("doc_id", *sig_cols).collect()
    )
    want = sorted(
        tuple(r)
        for r in minhash_signatures(docs.read(), num_hashes=k)
        .select("doc_id", *sig_cols)
        .collect()
    )
    assert got == want and len(got) == 2
    # and doc 2's signature really moved
    base = {
        r["doc_id"]: tuple(r[c] for c in sig_cols)
        for r in minhash_signatures(docs.read(0, 0), num_hashes=k).collect()
    }
    new = dict((r[0], r[1:]) for r in got)
    assert new[2] != base[2] and new[1] == base[1]


def test_simhash_fps_refresh_handles_updates(spark, warehouse):
    """Fingerprint-index maintenance under UNIQUE collapse mirrors the
    signature-index contract: refresh ≡ rebuild including updates."""
    from olap_storage_engine_spark.operators.dedup import simhash
    from olap_storage_engine_spark.operators.indexes import (
        simhash_fps_delta_refresh,
    )

    spec = TableSpec(
        name="docs_sh",
        columns=[
            ColumnSpec.key("doc_id", ColumnType.INT64),
            ColumnSpec.value("text", ColumnType.VARCHAR),
        ],
        keys_type=KeysType.UNIQUE,
        bucket=BucketSpec(BucketType.HASH, "doc_id", 2),
    )
    docs = OlapTable.create(spark, spec, warehouse, overwrite=True)
    docs.write(
        _docs2(
            spark,
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
            ],
        )
    )  # v0
    docs.write(
        _docs2(spark, [(2, "totally different text for doc two now")])
    )  # v1: UPDATE of doc 2

    fp_spec = TableSpec(
        name="shfps",
        columns=[
            ColumnSpec.key("doc_id", ColumnType.INT64),
            ColumnSpec.value("simhash", ColumnType.INT64),
        ],
        keys_type=KeysType.UNIQUE,
        bucket=BucketSpec(BucketType.HASH, "doc_id", 2),
    )
    fps = OlapTable.create(spark, fp_spec, warehouse, overwrite=True)
    simhash_fps_delta_refresh(docs, fps, 0, 0)
    simhash_fps_delta_refresh(docs, fps, 1, 1)

    got = sorted(
        tuple(r) for r in fps.read().select("doc_id", "simhash").collect()
    )
    want = sorted(
        tuple(r)
        for r in simhash(docs.read()).select("doc_id", "simhash").collect()
    )
    assert got == want and len(got) == 2
    # doc 2's fingerprint really moved with the update
    v0 = {r["doc_id"]: r["simhash"] for r in simhash(docs.read(0, 0)).collect()}
    cur = dict(got)
    assert cur[2] != v0[2] and cur[1] == v0[1]
