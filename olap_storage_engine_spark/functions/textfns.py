"""Text expression builders with exact DuckDB-oracle parity.

Token model: the test corpus is single-space separated; ``tokens`` uses
a regex split on whitespace runs so real-world text works too, and the
oracle mirrors it with DuckDB's string_split_regex.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization; trims first so no empty edge tokens
    (Spark split and DuckDB string_split_regex then agree)."""
    return F.split(F.trim(text), r"\s+")


def simple_token_count(text: Column) -> Column:
    """Token count as pure string arithmetic — identical in any SQL
    engine: spaces + 1 on the trimmed text (single-space corpora)."""
    t = F.trim(text)
    return (
        F.length(t) - F.length(F.regexp_replace(t, r"\s+", "")) + F.lit(1)
    )


# A BPE-ish pre-tokenizer: letter runs, digit runs, or single
# punctuation — the classic GPT-2 pre-split shape, kept to character
# classes so Java regex and DuckDB's RE2 agree.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def regex_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))
