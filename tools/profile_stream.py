"""Streaming-query lifecycle profiler: run the named streaming queries
once each (warm session, fixtures prebuilt) and print per-micro-batch
durationMs breakdowns (triggerExecution, queryPlanning, getBatch,
addBatch, walCommit, stateOperators commit times) from recentProgress —
the empirical answer to "where do the ~2s per streaming bench row go".

Usage: python3 tools/profile_stream.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from olap_storage_engine_spark import get_spark
    from olap_storage_engine_spark.fixtures import build_all
    from olap_storage_engine_spark.streaming import events as sev

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    build_all(spark, SF_DIR)
    sev.prewarm_stream_sources(spark, SF_DIR)
    from pyspark.sql import functions as F

    spark.range(10000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # monkeypatch _await_or_raise to capture FULL progress
    captured: dict[str, list] = {}
    orig = sev._await_or_raise

    def patched(q, timeout_sec: int = 300) -> None:
        t0 = time.time()
        orig(q, timeout_sec)
        captured["last"] = [json.loads(p.json) for p in (q.recentProgress or [])]
        captured["await_sec"] = time.time() - t0

    sev._await_or_raise = patched
    # corpus module imports the same helper by reference? check
    from olap_storage_engine_spark.streaming import corpus as scorp

    if hasattr(scorp, "_await_or_raise"):
        scorp._await_or_raise = patched

    for name in names:
        fn = qs[name]
        captured.clear()
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"\n=== {name}: total={t2-t0:.3f}s  (build+run={t1-t0:.3f}, "
              f"final-read={t2-t1:.3f}, awaited={captured.get('await_sec', -1):.3f})")
        for p in captured.get("last", []):
            dur = p.get("durationMs", {})
            so = p.get("stateOperators", [])
            print(f"  batch {p.get('batchId')}: inputRows={p.get('numInputRows')} "
                  f"durationMs={dur}")
            for s in so:
                print(f"    state: commitMs={s.get('commitTimeMs')} "
                      f"rowsTotal={s.get('numRowsTotal')} mem={s.get('memoryUsedBytes')}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
