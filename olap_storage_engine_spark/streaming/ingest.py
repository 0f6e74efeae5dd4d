"""Streaming ingest into an OlapTable — the routine-load analogue:
each micro-batch becomes one published rowset (routed, sorted,
version-stamped), so streaming writes get the same MVCC snapshot
semantics as batch loads and are immediately visible to the collapse
view.

Delivery semantics: at-least-once by default; EXACTLY-ONCE with
``exactly_once=True`` — the sink records each batch's epoch id in the
SAME manifest save as the rowset publish (Manifest.publish(txn=...)),
so a foreachBatch replay after a crash finds the epoch already
committed and skips: the classic idempotent-sink txn-log pattern, with
the atomicity coming from the manifest's single CAS'd write.  (The
UNIQUE-key collapse remains a second, independent line of defense.)

The epoch contract is only valid WITHIN ONE CHECKPOINT LINEAGE per
``source_id``: Structured Streaming's batch ids are monotone per
checkpoint, so a fresh checkpoint restarts ids at 0 and every new
batch with id <= the table's committed epoch would be silently
dropped.  ``exactly_once=True`` therefore REQUIRES an explicit,
persistent ``checkpoint_dir`` — the default ephemeral tempdir is
rejected, because the crash-recovery scenario exactly-once exists for
is the one the tempdir cannot survive.

Scale notes: the per-batch write inherits the table's partition/bucket
routing (one shuffle per batch); rowset count grows with trigger rate —
pair with compact_cumulative on a schedule, exactly like the
reference's cumulative compaction loop.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

from ..table import OlapTable


def stream_ingest(
    table: OlapTable,
    stream_df: DataFrame,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    exactly_once: bool = False,
    source_id: str = "stream_ingest",
):
    """Start a streaming query that publishes each micro-batch as a
    rowset of ``table``.  Returns the StreamingQuery handle."""
    if checkpoint_dir is None:
        if exactly_once:
            raise ValueError(
                "exactly_once=True requires an explicit persistent "
                "checkpoint_dir: batch ids are monotone only within one "
                "checkpoint lineage, so an ephemeral tempdir checkpoint "
                "restarts ids at 0 after a crash and batches with "
                "id <= the committed epoch would be silently dropped"
            )
        checkpoint_dir = tempfile.mkdtemp(prefix="olap_ingest_ckpt_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if exactly_once:
            committed = table.manifest.committed_epoch(source_id)
            if committed is not None and batch_id <= committed:
                return  # replayed batch: already atomically published
            table.write(batch_df, txn=(source_id, batch_id))
            return
        table.write(batch_df)

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
