"""Deterministic global shuffle + shard export for training data.

Training pipelines need the curated corpus shuffled ONCE, globally and
REPRODUCIBLY, then written as N balanced shards that data loaders stream
independently (WebDataset / Megatron-style). Row order must be a pure
function of (doc_id, salt) — never of partitioning, cluster size, or task
scheduling — so a re-run of the export after a cluster resize produces
byte-identical shards.

Shape at scale: shard id and order key are hash projections computed at
the scan; the single exchange is ``repartition(n_shards, shard)`` (each
output file = one partition) followed by ``sortWithinPartitions`` — a
local sort, no global range exchange, no driver collect. Shard balance is
hash-uniform over doc ids; ``shard_stats`` is the audit surface
(docs/tokens/bytes per shard) and is the DuckDB-oracled entry.

Reference parity note: no counterpart in shaheming/searchEngine; part of
the mandated LLM-training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality import _raw_tokens
from .hashing import prefix48

DEFAULT_SHARDS = 64


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = DEFAULT_SHARDS,
    salt: str = "",
) -> DataFrame:
    """Add (shard, order_key) columns: shard = 48-bit md5 prefix of
    (salt || id) mod n_shards; order_key = the full md5 hex (ties broken
    by id). Both engine-portable md5 arithmetic — the same order falls out
    of any SQL engine, which is what makes the shuffle auditable."""
    keyed = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = prefix48(keyed) % F.lit(int(n_shards))
    return df.withColumn("shard", shard).withColumn("order_key", keyed)


def shard_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = DEFAULT_SHARDS,
    salt: str = "",
) -> DataFrame:
    """Per-shard export audit: doc count, whitespace-token count, char
    bytes. One aggregate; the balance columns are what an operator checks
    before pointing 10^4 data-loader workers at the shards."""
    a = shard_assignments(df, id_col, n_shards, salt)
    return a.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_raw_tokens(F.col(text_col))).cast("long")).alias(
            "n_tokens"
        ),
        F.sum(F.length(F.col(text_col)).cast("long")).alias("n_chars"),
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = DEFAULT_SHARDS,
    salt: str = "",
) -> None:
    """Write the deterministically-shuffled corpus as ``n_shards`` parquet
    shard directories (``shard=K/``). One hash exchange on the shard id,
    then a partition-local sort on the order key — reruns at any
    parallelism produce the same row order per shard."""
    a = shard_assignments(df, id_col, n_shards, salt)
    (
        a.repartition(int(n_shards), "shard")
        # leading "shard": hash-partitioning puts 2+ shard values in one
        # task whenever murmur3 buckets collide, and the partitioned
        # writer REQUIRES ordering by the partition column — sorting on
        # it here satisfies that requirement directly instead of letting
        # the writer stack a second shard-only sort on top (which both
        # re-sorts every row and, under spill, leaves the per-file
        # (order_key, id) order resting on sort-stability)
        .sortWithinPartitions("shard", "order_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_shard(spark, path: str, shard: int, id_col: str = "doc_id") -> DataFrame:
    """Read one shard back in its deterministic order (partition-pruned
    directory read; the sort is re-asserted because parquet row order is
    only stable within files). The ``id_col`` tie-break matches the
    export sort — without it, duplicate-id rows (same md5 order_key)
    could legally come back in different orders on different reads."""
    return (
        spark.read.parquet(path)
        .where(F.col("shard") == int(shard))
        .orderBy("order_key", id_col)
    )
