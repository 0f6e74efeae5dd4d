"""Shared column-expression builders (all JVM-side, UDF-free).

Every function here returns a pyspark ``Column`` built from built-in
functions so the hot path stays inside whole-stage codegen; the DuckDB
oracle SQL mirrors each formula exactly (see __spark_entry__.py).
"""

from .hashes import md5int, rolling_fingerprint
from .vectors import cosine, dot, l2norm
from .textfns import simple_token_count, regex_token_count, tokens

__all__ = [
    "md5int",
    "rolling_fingerprint",
    "cosine",
    "dot",
    "l2norm",
    "simple_token_count",
    "regex_token_count",
    "tokens",
]
