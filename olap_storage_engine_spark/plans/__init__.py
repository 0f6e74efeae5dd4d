"""Driver-side planning helpers: the MVCC version manifest."""

from .manifest import Manifest, RowsetMeta, RowsetState, VersionGraph

__all__ = ["Manifest", "RowsetMeta", "RowsetState", "VersionGraph"]
