"""Multimodal column support (SURVEY §2 Part C, X5).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (modality, media type, byte size,
checksum).  Feature extraction (decode / resize / frame-sample) runs as
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested; the actual codec step is
STUBBED because no image/audio libraries exist in this container:
``decode_features(..., fake=False)`` raises NotImplementedError, and
the default deterministic fake derives features from the bytes so tests
have stable expectations.

Scale notes: binary payloads ride the normal columnar path (Parquet
keeps them contiguous per page); mapInPandas streams Arrow record
batches so peak memory is one batch of payloads per core, not one
partition.  Metadata-only queries never touch the payload bytes thanks
to Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", modality: str = "text"
) -> DataFrame:
    """Build a multimodal table from the documents fixture: the UTF-8
    bytes of the text stand in for an opaque media payload, with the
    typed metadata struct a real pipeline would carry."""
    payload = F.encode(F.col(text_col), "UTF-8")
    cols = [docs[c] for c in docs.columns]
    return docs.select(
        *cols,
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def payload_metadata(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata-only projection — reads only the meta struct; Parquet
    column pruning never materializes the payload bytes."""
    return mm.select(
        id_col,
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


def decode_features(
    mm: DataFrame,
    id_col: str = "doc_id",
    fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    With ``fake=True`` (default in this container) features are
    deterministic functions of the payload bytes: byte length, first /
    last byte values, and a 16-bin byte histogram mean — a stand-in
    with the exact schema/partitioning/batch shape a real decoder
    (PIL / torchaudio / pyav) would use.  ``fake=False`` marks where
    the real codec goes and raises NotImplementedError.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode needs image/audio libs not present in "
            "this container; wire PIL/torchaudio here"
        )

    schema = f"{id_col} long, n_bytes int, first_byte int, last_byte int, byte_mean double"

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(len)
            first = payloads.map(lambda b: b[0] if len(b) else -1)
            last = payloads.map(lambda b: b[-1] if len(b) else -1)
            mean = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                if len(b)
                else 0.0
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n.astype("int32"),
                    "first_byte": first.astype("int32"),
                    "last_byte": last.astype("int32"),
                    "byte_mean": mean,
                }
            )

    return mm.select(id_col, "payload").mapInPandas(extract, schema=schema)


def multimodal_join(
    docs: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """Text + embedding side-by-side: the canonical multimodal row
    (document joined to its vector by id).  Broadcast the smaller side
    when one qualifies; at matched scale this is a co-partitioned hash
    join on the shared key."""
    return (
        docs.join(embeddings, docs["doc_id"] == embeddings["vec_id"])
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.col("label").alias("emb_label"),
            F.size("embedding").alias("emb_dim"),
        )
    )
