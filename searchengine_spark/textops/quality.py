"""Text-analysis operators: quality scoring, language ID, token counting,
document fingerprinting, SimHash.

Everything here is either pure Spark SQL expressions (JVM-side, codegen'd)
or an Arrow-vectorized pandas UDF — no per-row Python. The SQL-expression
operators are oracle-checked against DuckDB; SimHash and the fingerprint
are checked rows-only plus unit tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..analysis.stopwords import STOP_WORDS

# Java-\s whitespace + the reference's five separators (analysis parity)
TOKEN_SPLIT_RE = "[ \\t\\n\\x0b\\f\\r]+"
PUNCT_RE = "[,.;?!]"
# BPE-ish pre-tokenizer: letter runs, digit runs, single other symbols
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
CJK_RANGE_RE = "[一-鿿぀-ヿ]"  # CJK ideographs + kana


def _raw_tokens(text_col):
    split = F.split(
        F.lower(F.regexp_replace(text_col, PUNCT_RE, " ")), TOKEN_SPLIT_RE
    )
    return F.filter(split, lambda x: x != "")


def text_quality(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token counts, stop-word ratio, word length,
    punctuation density. All JVM expressions (whole-stage codegen)."""
    stop_arr = F.lit(sorted(STOP_WORDS))
    raw = _raw_tokens(F.col(text_col))
    content = F.filter(raw, lambda x: ~F.array_contains(stop_arr, x))
    n_raw = F.size(raw).cast("long")
    n_content = F.size(content).cast("long")
    total_len = F.aggregate(content, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    # allocation-free punct count: length delta after stripping the five
    # marks (a per-character array + rlike filter here was measurable at
    # scale — every char became an array element)
    n_punct = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), PUNCT_RE, ""))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_raw.alias("n_tokens_raw"),
        n_content.alias("n_tokens"),
        F.round(
            F.when(n_raw > 0, (n_raw - n_content) / n_raw).otherwise(F.lit(0.0)), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_content > 0, total_len / n_content).otherwise(F.lit(0.0)), 4
        ).alias("avg_token_len"),
        n_punct.alias("n_punct"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def token_count_bpe(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish-regex token counts (training-data budgeting)."""
    return df.select(
        F.col(id_col),
        F.size(_raw_tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def lang_guess(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Cheap script-based language bucket (CJK vs latin); the n-gram
    stop-word scorer below refines latin languages."""
    return df.select(
        F.col(id_col),
        F.when(F.col(text_col).rlike(CJK_RANGE_RE), F.lit("cjk"))
        .otherwise(F.lit("latin"))
        .alias("script_guess"),
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.6,
    min_avg_token_len: float = 2.0,
    max_punct_per_token: float = 0.5,
) -> DataFrame:
    """Training-data corpus filter: keep docs passing all quality gates
    (C4/Gopher-style heuristics re-expressed over text_quality's features).
    Returns the surviving rows of ``df`` plus the computed features — one
    JVM-expression pass, filter applied before any downstream shuffle."""
    feats = text_quality(df, id_col, text_col)
    keep = feats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("avg_token_len") >= min_avg_token_len)
        & (
            F.col("n_punct")
            <= max_punct_per_token * F.col("n_tokens_raw")
        )
    )
    return df.join(keep, id_col, "left_semi")


# --- SimHash (64-bit) ---------------------------------------------------


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """Vectorized SimHash: per-doc weighted majority over term-hash bits.
    Term hash = first 16 hex of md5 (64 bits); weight = term frequency."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        if not text:
            continue
        tokens = text.lower().split()
        if not tokens:
            continue
        uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
                for t in uniq
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        sim = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sim |= np.uint64(1) << np.uint64(b)
        out[row] = np.int64(sim)
    return pd.Series(out)


simhash64_udf = pandas_udf(_simhash64_batch, LongType())


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), simhash64_udf(F.col(text_col)).alias("simhash"))


def simhash_chunk_bounds(max_hamming: int) -> list[tuple[int, int]]:
    """[(shift, width)] for ``max_hamming + 1`` contiguous chunks of the
    64-bit simhash (the last chunk absorbs the remainder bits). Pigeonhole:
    two hashes within ``max_hamming`` differing bits must agree on at least
    one of ``max_hamming + 1`` disjoint chunks — this is the block-permuted
    table family of Manku et al. (WWW'07) with one table per chunk."""
    n_chunks = max_hamming + 1
    if not 0 <= max_hamming <= 31:
        # width-2 chunks (max_hamming=31) are the useful floor; beyond that
        # blocking degenerates to all-pairs and must not pretend to recall
        raise ValueError(
            f"max_hamming={max_hamming} not blockable over 64 bits; use <= 31"
        )
    width = 64 // n_chunks
    bounds = [(i * width, width) for i in range(n_chunks - 1)]
    last_shift = (n_chunks - 1) * width
    bounds.append((last_shift, 64 - last_shift))
    return bounds


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by SimHash: block on ``max_hamming + 1`` disjoint
    bit chunks (any equal chunk => candidate — pigeonhole guarantees FULL
    recall at the requested radius), then verify the exact hamming distance
    with bit_count. Blocking selectivity falls as the radius grows (chunk
    width = 64/(h+1) bits): h<=3 blocks on 16-bit keys, h=7 on 8-bit keys;
    for large corpora keep the radius small or pre-dedup exact duplicates
    upstream so hot buckets stay bounded."""
    s = simhash(df, id_col, text_col)
    bounds = simhash_chunk_bounds(max_hamming)
    chunks = s.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        (
                            F.col("simhash")
                            if width >= 64
                            else F.shiftright("simhash", shift).bitwiseAND(
                                F.lit((1 << width) - 1)
                            )
                        ).alias("ckey"),
                    )
                    for i, (shift, width) in enumerate(bounds)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk", "c.ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


# --- rolling-hash fingerprint (winnowing-lite) ---------------------------


def _fingerprint_batch(texts: pd.Series) -> pd.Series:
    """Document fingerprint: min of 8-gram (chars) polynomial rolling hashes
    — a cheap content-defined signature stable under small edits."""
    B, P = 257, (1 << 61) - 1
    K = 8
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        if not text or len(text) < K:
            out[row] = 0
            continue
        vals = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        n = len(vals)
        if n < K:
            out[row] = 0
            continue
        # rolling polynomial hash over all K-byte windows, vectorized
        powers = np.array([pow(B, K - 1 - i, P) for i in range(K)], dtype=object)
        h = np.zeros(n - K + 1, dtype=object)
        acc = 0
        for i in range(K):
            acc = (acc * B + int(vals[i])) % P
        h[0] = acc
        top = int(powers[0])
        for i in range(1, n - K + 1):
            acc = ((acc - int(vals[i - 1]) * top) * B + int(vals[i + K - 1])) % P
            h[i] = acc
        out[row] = np.int64(min(h) % (1 << 62))
    return pd.Series(out)


fingerprint_udf = pandas_udf(_fingerprint_batch, LongType())


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), fingerprint_udf(F.col(text_col)).alias("fingerprint"))
