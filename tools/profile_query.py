"""Per-query profiling: split each declared query's bench time into
DataFrame BUILD (the python fn(spark, sf_dir) call: py4j traffic,
artifact path resolution, any driver-side jobs the builder runs) vs
EXECUTE (the noop-sink write), best-of-N warm in one session.

Usage: python3 tools/profile_query.py <query> [<query> ...] [--n 3]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import gc
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from olap_storage_engine_spark import get_spark
    from olap_storage_engine_spark.fixtures import build_all

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    build_all(spark, SF_DIR)
    from olap_storage_engine_spark.streaming.events import prewarm_stream_sources

    prewarm_stream_sources(spark, SF_DIR)
    # session warmup (same spirit as bench.py, smaller)
    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    print(f"{'query':42s} {'build':>7s} {'exec':>7s} {'total':>7s}  (best of {n})")
    for name in args:
        fn = qs[name]
        best = None
        for _ in range(n):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            spark.catalog.clearCache()
            gc.collect()
            row = (t1 - t0, t2 - t1, t2 - t0)
            if best is None or row[2] < best[2]:
                best = row
        print(f"{name:42s} {best[0]:7.3f} {best[1]:7.3f} {best[2]:7.3f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
