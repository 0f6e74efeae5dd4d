"""Shared DuckDB-oracle harness for the tools: the ten base tables
every oracle query sees, registered as views over a parquet sf dir.
One definition instead of per-tool copies — adding/renaming a base
table is a one-line change that every tool picks up."""

from __future__ import annotations

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def connect_with_views(sf_dir: str):
    """A fresh in-memory DuckDB connection with the base tables
    registered as views over `sf_dir`'s parquet files."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con
