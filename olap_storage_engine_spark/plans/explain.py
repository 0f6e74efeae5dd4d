"""Formatted physical-plan introspection.

``executedPlan().toString()`` TRUNCATES long FileScan metadata lines
(spark.sql.maxMetadataStringLength, default 100 chars), so regexing it
under-reports pushed filters exactly where the lines are long — the
round-2 plan audit was blind on its most important rows.  Formatted
explain prints each scan node's full metadata in a separate block, so
the audit and the plan-shape tests both drive off this.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full ``explain(mode="formatted")`` text (untruncated node
    metadata), without printing to stdout."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def scan_details(plan: str) -> list[dict[str, str]]:
    """Per-FileScan metadata from a formatted plan: one dict per scan
    with whatever keys the node prints (PushedFilters, PartitionFilters,
    ReadSchema, Location, ...)."""
    scans = []
    # formatted explain lists nodes as "(N) Scan parquet \n<attrs>"
    # followed by "Key: value" lines until the next blank line
    for block in re.split(r"\n\((\d+)\) ", plan):
        if not block.startswith("Scan parquet"):
            continue
        d: dict[str, str] = {}
        for line in block.splitlines():
            m = re.match(r"([A-Za-z ]+): (.*)", line)
            if m:
                d[m.group(1).strip()] = m.group(2).strip()
        scans.append(d)
    return scans


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the query's parquet scans."""
    out = []
    for s in scan_details(formatted_plan(df)):
        pf = s.get("PushedFilters", "")
        if pf and pf != "[]":
            out.append(pf)
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """All non-empty PartitionFilters entries across the scans."""
    out = []
    for s in scan_details(formatted_plan(df)):
        pf = s.get("PartitionFilters", "")
        if pf and pf != "[]":
            out.append(pf)
    return out
