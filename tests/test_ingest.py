"""Text-format ingestion: schema-applied loads, corrupt-row
quarantine, strict mode, CSV quoting round-trip."""

import pytest
from pyspark.sql import functions as F, types as T

from olap_storage_engine_spark.sources.ingest import read_csv, read_jsonl

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_jsonl_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    out = read_jsonl(spark, str(p), DOC_SCHEMA)
    rows = sorted(r["doc_id"] for r in out.collect())
    assert rows == [1, 2]


def test_jsonl_strict_raises(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"doc_id": 1}\nnope\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), DOC_SCHEMA, strict=True).collect()


def test_csv_quoted_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, 'has,comma and "quote"'), (2, "plain"), (3, "line\nbreak")],
        DOC_SCHEMA,
    )
    out_dir = str(tmp_path / "csv")
    src.write.option("header", "true").option("escape", '"').csv(out_dir)
    back = read_csv(spark, out_dir, DOC_SCHEMA)
    assert sorted(
        (r["doc_id"], r["text"]) for r in back.collect()
    ) == sorted((r["doc_id"], r["text"]) for r in src.collect())


def test_binaryfile_roundtrip_and_glob(spark, tmp_path):
    from olap_storage_engine_spark.sources.ingest import read_binary_files

    payloads = {
        "a.bin": b"\x00\x01\xffbinary",
        "b.bin": b"second file",
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "ignore.txt").write_text("not matched by the glob")

    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads)  # glob pushed into the listing
    for name, data in payloads.items():
        assert bytes(rows[name]["content"]) == data
        assert rows[name]["length"] == len(data)


def test_aux_cache_rebuilds_on_source_regeneration(tmp_path):
    """Persisted-artifact cache (fixtures._aux_cached): an entry whose
    declared source table is REGENERATED (parquet replace = new inode)
    must rebuild instead of serving an index derived from the previous
    corpus; unchanged sources and undeclared-source artifacts keep
    build-once-per-process behavior."""
    import os

    from olap_storage_engine_spark import fixtures as fx

    sf = str(tmp_path)
    doc = tmp_path / "documents.parquet"
    doc.write_bytes(b"corpus-one")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return calls["n"]

    key = "t_rebuild_probe"
    assert fx._aux_cached(key, sf, build, ("documents",)) == 1
    assert fx._aux_cached(key, sf, build, ("documents",)) == 1
    # touch without replacing: mtime moves -> state moves -> rebuild
    new = tmp_path / "documents.parquet.new"
    new.write_bytes(b"corpus-two")
    os.replace(new, doc)
    assert fx._aux_cached(key, sf, build, ("documents",)) == 2
    assert fx._aux_cached(key, sf, build, ("documents",)) == 2
    # sourceless artifacts: build once, never revalidate
    key2 = "t_rebuild_probe_nosrc"
    assert fx._aux_cached(key2, sf, build) == 3
    os.replace(tmp_path / "documents.parquet", tmp_path / "gone.parquet")
    assert fx._aux_cached(key2, sf, build) == 3
