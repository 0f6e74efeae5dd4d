"""Catalog layer: databases of OlapTables (reference: src/table.rs:
46-98 Database/CatalogManager, src/storage.rs:35-74 DDL entry points).

A database is a warehouse subdirectory; the catalog is the directory
tree plus each table's spec/manifest sidecars — no extra state to keep
consistent.  ``register_views`` mirrors tables into the Spark SQL
catalog so ``spark.sql`` queries see them (the read goes through the
keys-model collapse view, not the raw files).

The reference shards its in-memory tablet registry 64 ways for lock
concurrency (src/tablet.rs:170-236); nothing to port — the Spark
driver's catalog operations are metadata-only and the data path is
executor-side.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from .spec import TableSpec
from .table import SPEC_FILE, OlapTable


class CatalogError(Exception):
    pass


class OlapCatalog:
    """Databases and tables under one warehouse root."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- databases (reference: src/storage.rs:35-37, src/table.rs:64-70)
    def create_database(self, name: str) -> str:
        path = os.path.join(self.warehouse, name)
        if os.path.exists(path):
            raise CatalogError(f"database exists: {name}")
        os.makedirs(path)
        return path

    def list_databases(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def drop_database(self, name: str, cascade: bool = False) -> None:
        path = os.path.join(self.warehouse, name)
        if not os.path.isdir(path):
            raise CatalogError(f"no such database: {name}")
        if os.listdir(path) and not cascade:
            raise CatalogError(f"database not empty: {name} (use cascade)")
        shutil.rmtree(path)

    # -- tables (reference: src/storage.rs:40-74, src/table.rs:72-97)
    def _db_path(self, db: str) -> str:
        path = os.path.join(self.warehouse, db)
        if not os.path.isdir(path):
            raise CatalogError(f"no such database: {db}")
        return path

    def create_table(self, db: str, spec: TableSpec) -> OlapTable:
        return OlapTable.create(self.spark, spec, self._db_path(db))

    def get_table(self, db: str, name: str) -> OlapTable:
        root = os.path.join(self._db_path(db), name)
        if not os.path.isfile(os.path.join(root, SPEC_FILE)):
            raise CatalogError(f"no such table: {db}.{name}")
        return OlapTable.load(self.spark, self._db_path(db), name)

    def list_tables(self, db: str) -> list[str]:
        base = self._db_path(db)
        return sorted(
            d
            for d in os.listdir(base)
            if os.path.isfile(os.path.join(base, d, SPEC_FILE))
        )

    def drop_table(self, db: str, name: str) -> None:
        self.get_table(db, name)  # existence check
        OlapTable.drop(self._db_path(db), name)

    def register_views(self, db: str) -> None:
        """Expose every table in ``db`` as a temp view named
        ``{db}_{table}`` whose contents are the collapsed read."""
        for name in self.list_tables(db):
            t = self.get_table(db, name)
            t.read().createOrReplaceTempView(f"{db}_{name}")
