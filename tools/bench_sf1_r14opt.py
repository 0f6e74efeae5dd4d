"""sf1 growth rows for the queries whose SERVING PATH changed in the
r14 OPTIMIZATION session (doc_stats-served corpus_prep family, the
driver-side BPE trainer, persisted-model train_eval, fused multimodal
decode, explicit-schema segment reads)
(VERDICT r13 task 6, the standing discipline).
Run each at sf0.1 and the 10x perf-only scale-up (/tmp/sf1,
tools/make_scale_data.py), Spark AND oracle, and merge a
"queries_r14opt" section into BENCH_SF1.json.

Timing uses a noop-sink write (count() prunes projections and would
time a narrower plan than the query declares).

Usage: python tools/bench_sf1_r14opt.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

QUERIES = [
    "corpus_prep",
    "corpus_prep_inline",
    "corpus_prep_provenance",
    "tokenizer_train",
    "quality_classifier_train_eval",
    "multimodal_decode",
    "multimodal_video_decode",
    "segment_point_lookup",
]

ORACLE_SKIP_SF1: set = set()


def time_spark(spark, qs, name, sf_dir):
    t = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t, 3)


def time_oracle(oracles, name, sf_dir):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle_common import connect_with_views

    con = connect_with_views(sf_dir)
    t0 = time.time()
    try:
        con.execute(oracles[name]).fetchall()
    except Exception as ex:
        print(f"oracle {name} failed: {str(ex)[:120]}", flush=True)
        return None
    return round(time.time() - t0, 3)


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import __spark_entry__ as e
    from olap_storage_engine_spark import get_spark
    from olap_storage_engine_spark.fixtures import build_all

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    out = {}
    for sf_key, sf_dir in (("sf0_1", SF01), ("sf1", sf1)):
        build_all(spark, sf_dir)  # fixture/index builds untimed
        for name in QUERIES:
            time_spark(spark, qs, name, sf_dir)  # warm
            sec = min(time_spark(spark, qs, name, sf_dir) for _ in range(2))
            out.setdefault(name, {})[f"spark_{sf_key}"] = sec
            if sf_key == "sf1" and name in ORACLE_SKIP_SF1:
                out[name]["oracle_sf1"] = None
            else:
                out[name][f"oracle_{sf_key}"] = time_oracle(
                    oracles, name, sf_dir
                )
            print(name, sf_key, out[name], flush=True)
    for name, row in out.items():
        row["spark_growth"] = round(row["spark_sf1"] / row["spark_sf0_1"], 2)
        if row.get("oracle_sf1") and row.get("oracle_sf0_1"):
            row["oracle_growth"] = round(
                row["oracle_sf1"] / row["oracle_sf0_1"], 2
            )
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_SF1.json")
    with open(path) as f:
        doc = json.load(f)
    doc["queries_r14opt"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("merged queries_r14opt into BENCH_SF1.json")


if __name__ == "__main__":
    main()
