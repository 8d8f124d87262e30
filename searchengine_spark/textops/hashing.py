"""Single definition of the engine's cross-engine-portable md5 hash
arithmetic (the repo convention: one shape per arithmetic definition, like
``dedup.word_ngrams`` for windowing).

Spark ``conv(substr(md5(x), 1, 12), 16, 10)::long`` reads back the SAME
48-bit integer as DuckDB ``('0x' || substr(md5(x), 1, 12))::BIGINT``, so
every operator that needs an engine-replayable hash — classifier feature
ids, DSIR gram buckets, KMV sketch hashes, MinHash shingle ids, shard
assignment — shares this one expression shape and its oracle twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

HASH_SPACE = 1 << 48  # md5 48-bit prefix space


def prefix48(hex_col) -> F.Column:
    """48-bit prefix of an md5 HEX column as a long (for callers that
    reuse the hex digest for something else, e.g. shard order keys)."""
    return F.conv(F.substring(hex_col, 1, 12), 16, 10).cast("long")


def md5_prefix48(col) -> F.Column:
    """48-bit md5-prefix hash of a column as a long."""
    return prefix48(F.md5(col))
