"""Quiet best-of-N re-measure for regression triage.

Every round the driver's bench flags a handful of queries whose
drift-normalized time moved; most are host noise.  This tool is the
standing triage instrument (BENCHNOTES r10-r13 §1): one warm session,
fixtures prebuilt untimed, then each named query run N times (default
3) with the same noop-sink forcing bench.py uses; prints per-query
all-runs + best + the DuckDB oracle time on the same data.

Usage:  python tools/quiet_bench.py tpch_q7 events_sessionize ...
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 (default)
        QUIET_BENCH_RUNS=3
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("QUIET_BENCH_RUNS", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: quiet_bench.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sys.path.insert(
        0,
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    import __spark_entry__ as entrymod
    from olap_storage_engine_spark import get_spark
    from olap_storage_engine_spark.fixtures import build_all

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    build_all(spark, SF_DIR)

    import gc

    from pyspark.sql import functions as F

    # session warmup (same spirit as bench.py's): first shuffle +
    # codegen + noop registration, so run 1 isn't a cold outlier
    (
        spark.range(100_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        out[name] = {"runs": runs, "best": min(runs)}

    oracle = entrymod.oracle_sql()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle_common import connect_with_views

    con = connect_with_views(SF_DIR)
    for name in names:
        sql = oracle.get(name)
        if not sql:
            continue
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            out[name]["oracle"] = round(time.time() - t0, 3)
        except Exception as exc:
            out[name]["oracle_err"] = str(exc)[:120]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
