"""Data sources: the driver test-data loaders and table registration."""

from .testdata import TABLES, load_all, load_table, register_views

__all__ = ["TABLES", "load_all", "load_table", "register_views"]
