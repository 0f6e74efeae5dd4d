"""olap_storage_engine_spark — a PySpark-native analytics engine.

Re-expresses the semantics of the reference OLAP storage engine
(rust-olap/olap-storage-engine; see SURVEY.md) on Spark's columnar stack:

- data model / catalog  -> :mod:`.spec`   (TableSpec, KeysType, AggregateType)
- write & read path     -> :mod:`.table`  (OlapTable over Parquet + version manifest)
- MVCC version graph    -> :mod:`.plans.manifest`
- keys-model collapse   -> :mod:`.operators.keys_model`
- partition/bucket route-> :mod:`.operators.routing`
- compaction            -> :mod:`.operators.compaction`
- LLM-pipeline ops      -> :mod:`.operators.{dedup,similarity,text,multimodal}`
- streaming surface     -> :mod:`.streaming.events`

Everything relational (filters, joins, windows, SQL) is the returned
DataFrame: Catalyst + Parquet replace the reference's segment/encoding/
index layer entirely (SURVEY.md §4: zero custom rules needed).
"""

from .catalog import OlapCatalog
from .session import get_spark
from .spec import (
    AggregateType,
    BucketSpec,
    BucketType,
    ColumnSpec,
    ColumnType,
    EncodingHint,
    KeysType,
    PartitionPolicy,
    PartitionType,
    TableSpec,
)
from .table import OlapTable

__all__ = [
    "AggregateType",
    "BucketSpec",
    "BucketType",
    "ColumnSpec",
    "ColumnType",
    "EncodingHint",
    "KeysType",
    "OlapCatalog",
    "PartitionPolicy",
    "PartitionType",
    "TableSpec",
    "OlapTable",
    "get_spark",
]

__version__ = "0.2.0"
