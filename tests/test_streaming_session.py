"""Native session windows (F.session_window): merge semantics pinned
(the oracle in __spark_entry__.py encodes them) and the append-mode
streaming run equals gap-based batch sessionization up to the
watermark cut."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from olap_storage_engine_spark.streaming.events import (
    session_window_agg,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(uid, minutes, value=1.0, eid=0):
    return Row(
        event_id=eid,
        ts=BASE + dt.timedelta(minutes=minutes),
        user_id=uid,
        event_type="click",
        value=value,
        props="{}",
    )


def test_session_window_boundary_semantics(spark):
    """Events exactly ``gap`` apart MERGE (adjacent windows merge);
    strictly more than ``gap`` apart break.  The SQL oracle's break
    condition (diff > gap, not >=) depends on exactly this."""
    rows = [
        _ev(1, 0, eid=1),
        _ev(1, 30, eid=2),  # exactly 30 min later -> same session
        _ev(2, 0, eid=3),
        _ev(2, 30.5, eid=4),  # > 30 min -> new session
    ]
    out = session_window_agg(
        spark.createDataFrame(rows), "30 minutes"
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0]["n_events"] == 2
    assert len(by_user[2]) == 2
    assert all(r["n_events"] == 1 for r in by_user[2])


def test_session_stream_append_equals_batch_cut(spark, tmp_path):
    """Append-mode streaming session windows over a two-file source
    equal batch gap-sessionization restricted to sessions whose end
    (last_ts + gap) the final watermark passed."""
    import os

    rows = []
    eid = 0
    # user 1: two sessions (burst at 0-20 min, burst at 120-130 min)
    for m in [0, 10, 20, 120, 125, 130]:
        rows.append(_ev(1, m, value=float(m), eid=(eid := eid + 1)))
    # user 2: one long chained session (every 25 min, merges)
    for m in range(0, 150, 25):
        rows.append(_ev(2, m, value=1.0, eid=(eid := eid + 1)))
    # sentinel far in the future so the watermark passes everything
    rows.append(_ev(99, 24 * 60, eid=(eid := eid + 1)))

    df = spark.createDataFrame(rows)
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    cut = BASE + dt.timedelta(minutes=60)
    df.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    df.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )
    now = 1_700_000_000
    for i, d in enumerate(["b1", "b2"]):
        full = os.path.join(src, d)
        for fn in os.listdir(full):
            os.utime(os.path.join(full, fn), (now + i, now + i))

    import uuid

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "*"))
        .withWatermark("ts", "1 hour")
    )
    name = f"sess_test_{uuid.uuid4().hex[:8]}"
    q = (
        session_window_agg(stream, "30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # generous timeout: the suite runs many Spark jobs concurrently
    # and availableNow still has to schedule three micro-batches
    assert q.awaitTermination(420)
    got = sorted(map(tuple, spark.table(name).collect()))

    # batch expectation: gap sessions with last_ts + gap <= max_ts - 1h
    max_ts = BASE + dt.timedelta(minutes=24 * 60)
    horizon = max_ts - dt.timedelta(hours=1)
    batch = session_window_agg(df, "30 minutes").filter(
        F.col("last_ts") + F.expr("INTERVAL 30 MINUTES")
        <= F.lit(horizon)
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    # sanity on the shape itself: user 1 two sessions, user 2 one
    users = [r[0] for r in got]
    assert users.count(1) == 2 and users.count(2) == 1
