"""Scale-regime evidence for the STREAMING family (VERDICT r9 task 8):
run every declared streaming query at sf0.1 and at the 10x perf-only
scale-up (/tmp/sf1, built by tools/make_scale_data.py), recording wall
time AND state-store metrics (peak state rows/bytes, input rows) from
the queries' own StreamingQueryProgress.  The number that matters is
state growth vs input growth: a watermark-bounded or stateless
topology's state must grow far slower than its input.

Batch queries are covered by the r9 BENCH_SF1.json; this script merges
a "streaming" section into that file.

Usage: python tools/bench_sf1_streaming.py [sf1_dir]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

STREAM_QUERIES = [
    "events_stream_window",
    "events_stream_append",
    "events_stream_session_window",
    "events_stream_join",
    "events_stream_replay_dedup",
    "events_stream_ingest_table",
    "docs_stream_quality_filter",
    "docs_stream_classifier_filter",
    "docs_stream_decontaminate",
    "docs_stream_tokenize",
    "events_stream_enrich",
    "events_stream_mv",
]


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import __spark_entry__ as entrymod
    from olap_storage_engine_spark import get_spark
    from olap_storage_engine_spark.streaming import events as sev
    from olap_storage_engine_spark.streaming.events import (
        prewarm_stream_sources,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # source-split exports are fixture work, kept out of the timings
    for d in (SF01, sf1):
        prewarm_stream_sources(spark, d)

    out: dict = {}
    for name in STREAM_QUERIES:
        if name not in qs:
            continue
        row: dict = {}
        for label, d in (("sf0_1", SF01), ("sf1", sf1)):
            sev.LAST_RUN_METRICS.clear()
            t0 = time.time()
            df = qs[name](spark, d)
            df.write.format("noop").mode("overwrite").save()
            row[f"sec_{label}"] = round(time.time() - t0, 3)
            # fold every streaming sub-query's metrics (a runner may
            # start more than one, e.g. ingest + read)
            m = {
                "input_rows": 0,
                "state_rows_peak": 0,
                "state_bytes_peak": 0,
            }
            for v in sev.LAST_RUN_METRICS.values():
                m["input_rows"] += v["input_rows"]
                m["state_rows_peak"] = max(
                    m["state_rows_peak"], v["state_rows_peak"]
                )
                m["state_bytes_peak"] = max(
                    m["state_bytes_peak"], v["state_bytes_peak"]
                )
            for k, v in m.items():
                row[f"{k}_{label}"] = v
            spark.catalog.clearCache()
            gc.collect()
        if row.get("sec_sf0_1", 0) > 0:
            row["time_growth"] = round(row["sec_sf1"] / row["sec_sf0_1"], 2)
        if row.get("input_rows_sf0_1", 0) > 0:
            row["input_growth"] = round(
                row["input_rows_sf1"] / row["input_rows_sf0_1"], 2
            )
        if row.get("state_rows_peak_sf0_1", 0) > 0:
            row["state_growth"] = round(
                row["state_rows_peak_sf1"] / row["state_rows_peak_sf0_1"], 2
            )
        out[name] = row
        print(json.dumps({name: row}))

    path = "BENCH_SF1.json"
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["streaming"] = {
        "note": (
            "streaming family at the same 10x scale-up; sec_* includes "
            "micro-batch execution only (source exports prewarmed). "
            "state_rows_peak is max numRowsTotal across the run's "
            "progress events — bounded state shows as state_growth << "
            "input_growth."
        ),
        "queries": out,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote streaming section: {len(out)} queries -> {path}")


if __name__ == "__main__":
    main()
