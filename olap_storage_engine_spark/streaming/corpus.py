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
