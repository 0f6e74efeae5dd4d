"""Text-format ingestion sources: JSON-lines and CSV into engine
tables.

The reference's only input path is its own row-append API
(src/segment.rs:132-148); real pipelines ingest interchange formats.
These are thin schema-applied ``spark.read`` wrappers — Spark's
distributed text parsers are the scan layer — with two engine-side
policies on top:

* **explicit schema, no inference** — schema inference scans the data
  twice and can flip types between runs; at 100 TB both are
  unacceptable.  Callers pass a ``StructType`` (or an engine
  ``TableSpec`` whose ``spark_schema()`` provides it).
* **corrupt-row quarantine** — PERMISSIVE mode with a
  ``_corrupt_record`` column filtered into a side channel, so one bad
  row never kills a 1000-executor load (FAILFAST is opt-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    strict: bool = False,
) -> DataFrame:
    """JSON-lines load with explicit schema.  ``strict=True`` fails on
    the first malformed row (FAILFAST); default quarantines malformed
    rows out of the result."""
    if strict:
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    df = spark.read.schema(_with_corrupt(schema)).json(path)
    return df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    strict: bool = False,
) -> DataFrame:
    """CSV load with explicit schema and RFC-4180 quoting (embedded
    delimiters/newlines survive via multiLine)."""
    reader = (
        spark.read.schema(schema if strict else _with_corrupt(schema))
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
    )
    if strict:
        return reader.option("mode", "FAILFAST").csv(path)
    df = reader.csv(path)
    return df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Opaque-file ingestion via Spark's ``binaryFile`` source — the
    entry point for a multimodal corpus (images/audio/video land as
    whole files, not rows).  Each file becomes one row of
    ``(path, modificationTime, length, content: binary)``; downstream
    decode is the Arrow-batched codec layer (operators/multimodal.py).

    Scale posture: the source lists and splits FILES (content is never
    split), so partitioning follows ``spark.sql.files.maxPartitionBytes``
    over whole files; small-file explosion is the real 100 TB risk —
    pack tiny assets into larger containers (or parquet binary columns,
    see fixtures.multimodal docs) before this layer.  ``glob`` maps to
    pathGlobFilter (pushed into the file listing, not a post-filter).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)
