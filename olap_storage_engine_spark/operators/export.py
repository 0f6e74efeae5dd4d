"""Training-data export operators.

The last mile of an LLM data pipeline: after curation, the corpus must
be SHUFFLED globally (so a training run doesn't see a whole source or
language in sequence) and split into fixed-count shards that loaders
can stream independently.  At 100 TB "shuffle" cannot mean
``ORDER BY rand()`` — a random sort is a full global sort with an
unreproducible key.  The standard trick (used by every large corpus
builder) is a DETERMINISTIC hash shuffle: permute by a seeded integer
hash of the stable document key.  That gives

- reproducibility: same seed -> bit-identical shard layout, so a
  training run can be resumed/audited and an oracle can check it;
- distribution: the hash is the shard router AND the within-shard
  order, so the whole operation is ONE shuffle by shard id followed by
  a within-partition sort — no global sort, no driver state;
- incrementality: adding documents never moves existing ones between
  shards (shard id depends only on (key, seed)).

The hash is a Knuth multiplicative hash reduced mod a prime — chosen
over xxhash64/murmur because it is exactly reproducible in ANSI SQL
(the DuckDB oracle re-derives it with the same two integer ops), while
still scattering consecutive doc_ids across shards.  For 2^63-scale
keys swap in ``F.xxhash64`` and drop the SQL oracle to a rows-only
check; at that point the multiplier product would overflow BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth's 2^32 golden-ratio multiplier and a large prime modulus: the
# product key*MULT stays < 2^63 for keys up to ~4.2e9, so the same
# expression evaluates exactly (no overflow, no floats) in Spark and in
# the ANSI-SQL oracle.
_MULT = 2654435761
_MOD = 9_007_199_254_740_881  # largest prime < 2^53
_CKMOD = 1_000_000_007  # checksum field prime (terms stay < 2^60)


def shuffle_hash(key_col, seed: int):
    """The seeded permutation hash as a Column expression."""
    return (F.col(key_col) * F.lit(_MULT) + F.lit(seed)) % F.lit(_MOD)


def global_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export.

    Adds ``shard`` (= hash % n_shards) and ``pos`` (the row's ordinal
    within its shard under the hash permutation; ties on the hash break
    by key so the layout is total and reproducible).

    Scale shape: one hash-partitioned exchange on ``shard`` plus a
    within-partition sort — ``repartition(n, shard)`` then
    ``row_number`` over a window partitioned by ``shard`` never
    degenerates into a single-partition global window.  A downstream
    ``df.write.partitionBy("shard")`` streams each shard as its own
    file set.
    """
    h = shuffle_hash(key_col, seed).alias("_h")
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        df.select("*", h)
        .withColumn("shard", (F.col("_h") % F.lit(n_shards)).cast("int"))
        .repartition(n_shards, "shard")
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_h")
    )


def shard_manifest(shuffled: DataFrame, key_col: str) -> DataFrame:
    """Per-shard export manifest: row count plus an order-sensitive
    checksum over the shard's (pos, key) sequence — the artifact a
    training loader checks before consuming a shard.  The checksum is
    a sum of pos-weighted keys, so any permutation, drop, or swap
    within a shard changes it; sums are order-independent to compute,
    so this is a plain partial-aggregable groupBy (no sort needed to
    VERIFY, only to produce).  Every term is reduced mod 1e9+7 BEFORE
    the sum so the running total stays far from BIGINT overflow at any
    shard size (DuckDB errors on overflow, Spark wraps — keeping both
    exact keeps the checksum oracle-comparable)."""
    ck = F.lit(_CKMOD)
    term = ((F.col("pos") + F.lit(1)) % ck) * (F.col(key_col) % ck) % ck
    return shuffled.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(term) % ck).alias("order_checksum"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    )
