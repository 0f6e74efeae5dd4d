"""Streaming corpus ingestion: the text-pipeline POLICY operators
applied inside a Structured Streaming query — documents arrive as
files, every micro-batch gets the same row-local quality verdicts the
batch path computes, and the running verdict histogram is the stream's
state.

The filter stage (operators/text.quality_filter) is deliberately
row-local (zero shuffles), which is exactly what makes it
streaming-compatible: stateless per-row logic needs no watermark and
adds no state store — the only stateful operator is the tiny verdict
aggregate.  At 100 TB/day the same topology holds: file (or Kafka)
source -> map-only verdict pass -> keyed aggregate whose cardinality
is the number of verdict classes, not the corpus.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def run_fixture_stream_corpus_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the C4/Gopher quality-filter policy as an actual streaming
    query over the documents fixture (file source, availableNow
    trigger, complete mode into a memory sink) and return the final
    per-(lang, reason) verdict counts — deterministic under
    availableNow, so the batch SQL oracle checks it exactly."""
    from ..operators.text import quality_filter
    from .events import _await_or_raise, _shuffle_partitions

    path = os.path.join(sf_dir, "documents.parquet")
    src_dir = tempfile.mkdtemp(prefix="docs_stream_")
    os.symlink(path, os.path.join(src_dir, "documents.parquet"))
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    verdicts = quality_filter(stream)
    name = f"cf_{uuid.uuid4().hex[:8]}"
    with _shuffle_partitions(spark, 8):
        q = (
            verdicts.groupBy("lang", "reason")
            .agg(F.count(F.lit(1)).cast("int").alias("n"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)
    return spark.table(name)


def run_fixture_stream_decontaminate(
    spark: SparkSession, sf_dir: str, n: int = 5, mod: int = 97
) -> DataFrame:
    """Streaming benchmark decontamination: documents arrive as a file
    stream; each row drops iff it shares any word n-gram with the
    static benchmark set — the same keep-set as the batch
    ``dedup.decontaminate``, so the batch SQL oracle checks the stream
    exactly.

    Topology: FULLY STATELESS append-mode filter.  The doc's distinct
    shingle hashes stay an in-row ARRAY (no explode), and the verdict
    is one row-local ``arrays_overlap`` against the benchmark's
    distinct hash set — no watermark, no state store, no shuffle; the
    stream filter parallelizes by source file at any rate.  The bench
    set rides along as a literal array here (hundreds of hashes at
    fixture scale); at a real 10^6+-hash eval suite the same verdict
    is an Arrow-batched pandas UDF over a broadcast numpy set (or a
    bloom filter) — still row-local and stateless."""
    from ..functions.textfns import tokens
    from .events import _await_or_raise, _shuffle_partitions

    path = os.path.join(sf_dir, "documents.parquet")
    src_dir = tempfile.mkdtemp(prefix="docs_decon_stream_")
    os.symlink(path, os.path.join(src_dir, "documents.parquet"))
    docs = spark.read.parquet(path)

    def shingle_hashes(text_col):
        toks = tokens(text_col)
        return F.transform(
            F.array_distinct(
                F.when(
                    F.size(toks) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                        lambda i: F.array_join(
                            F.slice(toks, i, n), " "
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ),
            lambda s: F.xxhash64(s),
        )

    from ..operators.dedup import benchmark_shingle_hashes

    bench_vals = [
        r["sh"]
        for r in benchmark_shingle_hashes(
            docs.filter(F.col("doc_id") % mod == 0), n=n
        ).collect()
    ]
    # empty bench set: nothing can be contaminated — a bare F.array()
    # would be untyped, so pin an empty long array
    bench_arr = (
        F.array(*[F.lit(v) for v in bench_vals])
        if bench_vals
        else F.array().cast("array<long>")
    )
    schema = docs.schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    kept = stream.filter(
        ~F.arrays_overlap(shingle_hashes(F.col("text")), bench_arr)
    ).select("doc_id", "lang", "source")
    name = f"dc_{uuid.uuid4().hex[:8]}"
    with _shuffle_partitions(spark, 8):
        q = (
            kept.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)
    return spark.table(name)
