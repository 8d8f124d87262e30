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
# CJK ideographs + kana + Hangul (jamo U+1100-11FF, compat jamo U+3130-318F,
# syllables U+AC00-D7AF) — without the Hangul blocks Korean text would
# bucket "latin"
CJK_RANGE_RE = "[一-鿿぀-ヿᄀ-ᇿ㄰-㆏가-힯]"


def _raw_tokens(text_col):
    split = F.split(
        F.lower(F.regexp_replace(text_col, PUNCT_RE, " ")), TOKEN_SPLIT_RE
    )
    return F.filter(split, lambda x: x != "")


def _quality_feature_exprs(text_col):
    """The text_quality feature expressions, by name — shared between the
    feature projection (text_quality) and the inline gate (quality_flag)
    so thresholds can never drift from the features they were tuned on.
    Ratios are rounded to 4 dp HERE, before any thresholding, matching
    the SQL oracle which also gates on the rounded values."""
    stop_arr = F.lit(sorted(STOP_WORDS))
    raw = _raw_tokens(text_col)
    content = F.filter(raw, lambda x: ~F.array_contains(stop_arr, x))
    n_raw = F.size(raw).cast("long")
    n_content = F.size(content).cast("long")
    total_len = F.aggregate(content, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    # allocation-free punct count: length delta after stripping the five
    # marks (a per-character array + rlike filter here was measurable at
    # scale — every char became an array element)
    n_punct = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, PUNCT_RE, ""))
    ).cast("long")
    return {
        "n_tokens_raw": n_raw,
        "n_tokens": n_content,
        "stopword_ratio": F.round(
            F.when(n_raw > 0, (n_raw - n_content) / n_raw).otherwise(F.lit(0.0)), 4
        ),
        "avg_token_len": F.round(
            F.when(n_content > 0, total_len / n_content).otherwise(F.lit(0.0)), 4
        ),
        "n_punct": n_punct,
        "n_chars": F.length(text_col).cast("long"),
    }


def text_quality(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token counts, stop-word ratio, word length,
    punctuation density. All JVM expressions (whole-stage codegen)."""
    feats = _quality_feature_exprs(F.col(text_col))
    return df.select(
        F.col(id_col), *(expr.alias(name) for name, expr in feats.items())
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
    """Cheap script-based language bucket (CJK vs latin); the stop-word
    scorer ``lang_id`` below refines latin languages."""
    return df.select(
        F.col(id_col),
        F.when(F.col(text_col).rlike(CJK_RANGE_RE), F.lit("cjk"))
        .otherwise(F.lit("latin"))
        .alias("script_guess"),
    )


# Distinctive function words per language — the classic cheap language-ID
# heuristic (stop-word profile density). Deliberately small lists: function
# words are closed-class and high-frequency, so ~20 per language separate
# well; shared Romance words (de/la/les) are fine because ARGMAX over
# per-language densities decides, not membership alone.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for",
           "was", "with", "as", "his", "they", "at", "be", "this", "have",
           "from", "a", "on", "are", "not"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ich", "sie", "du",
           "wir", "ein", "eine", "mit", "von", "zu", "den", "im", "auf",
           "für", "dem", "auch", "sich", "aber", "werden"],
    "fr": ["le", "la", "les", "des", "et", "est", "un", "une", "je", "tu",
           "il", "nous", "vous", "dans", "pour", "que", "qui", "sur",
           "avec", "pas", "ce", "se", "au", "plus"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "yo", "él", "en",
           "para", "por", "con", "su", "no", "lo", "como", "más", "pero",
           "sus", "le", "ya", "este", "sí"],
}


# below this best-language density the label is 'und' (shared with the
# SQL oracle so the threshold can't drift)
_LANG_MIN_SCORE = 0.02


def lang_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float = _LANG_MIN_SCORE,
) -> DataFrame:
    """Stop-word-profile language ID (the scorer ``lang_guess`` refers to):
    per language, the fraction of raw tokens that are that language's
    function words; the doc is labeled with the ARGMAX language, or 'und'
    when even the best density is under ``min_score`` (e.g. code, CJK —
    route those through ``lang_guess``'s script bucket first).

    Pure JVM expressions — one array-filter per language over the token
    array, no explode, no UDF, no shuffle at all: a projection the optimizer
    can pipeline into any downstream filter. Ties resolve to the
    lexicographically LAST language code (array_max on (score, lang)
    structs), which the SQL oracle replicates.
    """
    # tokenize ONCE behind a projection boundary: the higher-order filters
    # are CodegenFallback, and `best` is referenced by two output columns —
    # inlining `raw` would re-run the regexp+split ~10x per row.
    # CollapseProject keeps the boundary because the reference is multi-use
    # and non-cheap.
    toked = df.select(
        F.col(id_col), _raw_tokens(F.col(text_col)).alias("__raw")
    )
    raw = F.col("__raw")
    n = F.size(raw)
    cands = []
    for lang in sorted(LANG_STOPWORDS):
        words = F.lit(sorted(LANG_STOPWORDS[lang]))
        dens = F.when(
            n > 0,
            F.size(F.filter(raw, lambda x: F.array_contains(words, x))) / n,
        ).otherwise(F.lit(0.0))
        cands.append(F.struct(dens.alias("score"), F.lit(lang).alias("lang")))
    scored = toked.select(
        F.col(id_col), F.array_max(F.array(*cands)).alias("__best")
    )
    best = F.col("__best")
    return scored.select(
        F.col(id_col),
        F.when(best["score"] >= min_score, best["lang"])
        .otherwise(F.lit("und"))
        .alias("lang"),
        F.round(best["score"], 6).alias("score_r"),
    )


def quality_flag(
    text_col,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.6,
    min_avg_token_len: float = 2.0,
    max_punct_per_token: float = 0.5,
):
    """Boolean column: the quality_filter gates as ONE inline expression
    over the text column — usable as a WHERE predicate (quality_filter) or
    as a per-doc stage flag (curation funnel) without materializing the
    feature frame. Gates apply to the same 4-dp-rounded ratios the
    feature projection (and the SQL oracle) emit."""
    f = _quality_feature_exprs(text_col)
    return (
        (f["n_tokens"] >= min_tokens)
        & (f["stopword_ratio"] <= max_stopword_ratio)
        & (f["avg_token_len"] >= min_avg_token_len)
        & (f["n_punct"] <= max_punct_per_token * f["n_tokens_raw"])
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
    Returns the surviving rows of ``df`` with its ORIGINAL columns — a
    plain WHERE over the inline gate expression, so the filter pushes to
    the scan with no join at all (it was previously a left-semi join of
    ``df`` against its own feature projection: two scans plus a shuffle);
    call ``text_quality`` directly if you also need the feature columns."""
    return df.where(
        quality_flag(
            F.col(text_col),
            min_tokens=min_tokens,
            max_stopword_ratio=max_stopword_ratio,
            min_avg_token_len=min_avg_token_len,
            max_punct_per_token=max_punct_per_token,
        )
    )


def _word_ngrams(tokens_col, n: int):
    """Word n-gram instances — shared definition with the dedup shingles
    (dedup.word_ngrams) so the windowing arithmetic exists exactly once."""
    from .dedup import word_ngrams

    return word_ngrams(tokens_col, n)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    short_n: int = 2,
    long_n: int = 3,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top2_frac_r``: fraction of ``short_n``-gram instances taken by the
      single most frequent ``short_n``-gram (Rae et al. 2021 "fraction of
      characters in most common n-gram", re-based on gram instances),
    - ``dup3_frac_r``: fraction of ``long_n``-gram instances whose gram
      occurs more than once ("fraction of characters in duplicate n-grams").

    High values flag boilerplate / degenerate repetition for corpus
    filtering. A document's grams all live in its own row, so no shuffle is
    ever needed: the grams are array_sort'ed and their run lengths folded
    with a JVM ``aggregate`` — the operator is a pure projection that
    Catalyst pipelines into the scan. Measured trade-off (BENCH.md): the
    interpreted higher-order fold costs ~2x the CPU of the explode +
    groupBy(id, gram) twin locally (50s vs 24s per 1M docs), but the
    explode shuffles ~60 rows per document (6e13 rows at 10^12 docs) while
    this shuffles ZERO bytes — at cluster scale the exchange, not the CPU,
    is the binding constraint, so the projection form wins. (Do NOT
    "optimize" by capturing the sorted array in per-element lambdas —
    Catalyst inlines the capture and re-sorts per element, going O(n^2).)
    """

    def _run_fracs(grams):
        """(max run length / n, instances in runs>1 / n) over the sorted
        gram array — run-length fold, one pass, no data movement."""
        n = F.size(grams)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("maxrun"),
            F.lit(0).cast("long").alias("dup"),
        )

        def step(acc, g):
            same = acc["prev"].eqNullSafe(g)
            return F.struct(
                g.alias("prev"),
                F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
                F.when(same, acc["maxrun"])
                .otherwise(F.greatest(acc["maxrun"], acc["run"]))
                .alias("maxrun"),
                F.when(same | (acc["run"] <= 1), acc["dup"])
                .otherwise(acc["dup"] + acc["run"])
                .alias("dup"),
            )

        def finish(acc):
            return F.struct(
                F.greatest(acc["maxrun"], acc["run"]).alias("maxrun"),
                (
                    acc["dup"]
                    + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0).cast("long"))
                ).alias("dup"),
            )

        closed = F.aggregate(F.array_sort(grams), init, step, finish)
        top = F.when(n > 0, closed["maxrun"] / n).otherwise(F.lit(0.0))
        dup = F.when(n > 0, closed["dup"] / n).otherwise(F.lit(0.0))
        return top, dup

    top_s, _ = _run_fracs(_word_ngrams(F.col(tokens_col), short_n))
    _, dup_l = _run_fracs(_word_ngrams(F.col(tokens_col), long_n))
    return df.select(
        F.col(id_col),
        F.round(top_s, 6).alias("top2_frac_r"),
        F.round(dup_l, 6).alias("dup3_frac_r"),
    )


# --- SimHash (64-bit) ---------------------------------------------------


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """Batch-vectorized SimHash: per-doc weighted majority over term-hash
    bits. Term hash = first 16 hex of md5 (64 bits); weight = term
    frequency. Python touches only the BATCH-WIDE token vocabulary (md5 has
    no numpy kernel); everything per-token/per-doc — factorize, bit
    expansion, vote sums, bit packing — is numpy over the whole Arrow
    batch, the same shape as ``index.engine._tokenize_batch``."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    toks = texts.fillna("").str.lower().str.split()
    n_per_doc = toks.str.len().to_numpy(dtype=np.int64)
    if n_per_doc.sum() == 0:
        return pd.Series(out)
    flat = np.concatenate([t for t in toks if t])  # doc-major token stream
    doc_has = np.flatnonzero(n_per_doc > 0)
    starts = np.zeros(len(doc_has), dtype=np.int64)
    np.cumsum(n_per_doc[doc_has[:-1]], out=starts[1:])
    codes, uniq = pd.factorize(flat)
    # vocabulary-only Python loop: one md5 per DISTINCT token in the batch
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    # per-occurrence bit matrix via unpackbits on the little-endian byte
    # view (C memcpy speed; bit b of column b == (h >> b) & 1), summed per
    # doc over the doc-major stream; the +-1 vote sum is then
    # 2*ones - n_tokens (tf weight = one vote per occurrence).
    # reduceat stays in the FAST native-int8 path (the dtype=int64 widening
    # path is ~10x slower) by splitting every doc segment into <=127-token
    # sub-segments (no int8 overflow), then folding sub-sums in int64.
    bits = np.unpackbits(
        hs[codes].astype("<u8")[:, None].view(np.uint8), axis=1,
        bitorder="little",
    ).view(np.int8)
    seg_len = n_per_doc[doc_has]
    reps = -(-seg_len // 127)  # ceil-div: sub-segments per doc
    cum = np.zeros(len(reps) + 1, dtype=np.int64)
    np.cumsum(reps, out=cum[1:])
    within = (np.arange(cum[-1]) - np.repeat(cum[:-1], reps)) * 127
    fine = np.repeat(starts, reps) + within
    part = np.add.reduceat(bits, fine, axis=0)
    ones = np.add.reduceat(part.astype(np.int64), cum[:-1], axis=0)
    votes = 2 * ones - seg_len[:, None]
    sims = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    out[doc_has] = sims.astype(np.int64)
    return pd.Series(out)


simhash64_udf = pandas_udf(_simhash64_batch, LongType())


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), simhash64_udf(F.col(text_col)).alias("simhash"))


def _chunk_bounds(n_chunks: int) -> list[tuple[int, int]]:
    """[(shift, width)] for ``n_chunks`` contiguous chunks of the 64-bit
    simhash; the last chunk absorbs the remainder bits."""
    width = 64 // n_chunks
    bounds = [(i * width, width) for i in range(n_chunks - 1)]
    last_shift = (n_chunks - 1) * width
    bounds.append((last_shift, 64 - last_shift))
    return bounds


def simhash_chunk_bounds(max_hamming: int) -> list[tuple[int, int]]:
    """[(shift, width)] for ``max_hamming + 1`` contiguous chunks of the
    64-bit simhash (the last chunk absorbs the remainder bits). Pigeonhole:
    two hashes within ``max_hamming`` differing bits must agree on at least
    one of ``max_hamming + 1`` disjoint chunks — this is the block-permuted
    table family of Manku et al. (WWW'07) with one table per chunk."""
    if not 0 <= max_hamming <= 31:
        # width-2 chunks (max_hamming=31) are the useful floor; beyond that
        # blocking degenerates to all-pairs and must not pretend to recall
        raise ValueError(
            f"max_hamming={max_hamming} not blockable over 64 bits; use <= 31"
        )
    return _chunk_bounds(max_hamming + 1)


def simhash_blocking_tables(
    max_hamming: int, min_key_bits: int = 14
) -> list[tuple[tuple[int, int], ...]]:
    """Blocking-table family for radius ``max_hamming``: each table is a
    tuple of (shift, width) chunks whose concatenated bits form that
    table's block key. Recall-complete AND selective:

    - small radii (single-chunk key width >= ``min_key_bits``): one table
      per chunk of ``max_hamming + 1`` chunks (Manku et al.);
    - larger radii: chunk-PAIR tables over ``c = max_hamming + 2`` chunks.
      Pigeonhole: <= max_hamming dirty chunks leaves >= 2 clean chunks, so
      some PAIR of chunks is fully clean — C(c,2) tables keyed on the
      ~2x-wider concatenated pair keys cover the radius. At h=6 (c=8,
      16-bit pair keys) expected candidates fall from ~n^2/64 (8-bit
      single-chunk keys) to ~28*n^2/2^17 ~ n^2/4700 on worst-case
      (uniform) hashes — and far lower on real corpora, keeping the
      self-join ~linear in n per bucket-load instead of quadratic."""
    if not 0 <= max_hamming <= 30:
        raise ValueError(
            f"max_hamming={max_hamming} not pair-blockable over 64 bits; "
            "use <= 30"
        )
    if 64 // (max_hamming + 1) >= min_key_bits:
        return [(b,) for b in simhash_chunk_bounds(max_hamming)]
    bounds = _chunk_bounds(max_hamming + 2)
    c = len(bounds)
    return [
        (bounds[i], bounds[j]) for i in range(c) for j in range(i + 1, c)
    ]


def _table_key_expr(table: tuple[tuple[int, int], ...]):
    """Block-key column for one table: the chunks' bits concatenated
    (first chunk in the high bits). Arithmetic >> then mask == logical
    extract because shift + width <= 64 for every chunk."""
    def chunk_bits(shift, width):
        if width >= 64:
            return F.col("simhash")
        return F.shiftright("simhash", shift).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    key = chunk_bits(*table[0])
    for shift, width in table[1:]:
        key = key * F.lit(1 << width) + chunk_bits(shift, width)
    return key


def simhash_candidates(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs ``(doc_a, doc_b, hamming)`` from a precomputed
    ``(id, simhash)`` frame via the ``simhash_blocking_tables`` family
    (every true pair within ``max_hamming`` is guaranteed present; blocked
    coincidences beyond the radius may also appear — callers filter).
    One explode (|tables| rows per doc), one equi-join on (table, key),
    one distinct — no all-pairs stage at any radius."""
    tables = simhash_blocking_tables(max_hamming)
    chunks = sims.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("tbl"),
                        _table_key_expr(t).alias("ckey"),
                    )
                    for i, t in enumerate(tables)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.tbl", "c.ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
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


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on the ``simhash_blocking_tables``
    family (single chunks at small radii, chunk-pair tables at larger ones
    — pigeonhole guarantees FULL recall at the requested radius either
    way), then verify the exact hamming distance with bit_count. The pair
    tables keep block keys >= ~14 bits at every radius, so candidate
    growth stays ~n x bucket-load instead of going quadratic (see
    ``simhash_blocking_tables``); for huge corpora additionally pre-dedup
    exact duplicates upstream so hot buckets stay bounded."""
    s = simhash(df, id_col, text_col)
    pairs = simhash_candidates(s, id_col, max_hamming)
    return pairs.where(F.col("hamming") <= max_hamming)


# --- rolling-hash fingerprint (winnowing-lite) ---------------------------


def _fingerprint_batch(texts: pd.Series) -> pd.Series:
    """Document fingerprint: min of 8-gram (bytes) polynomial rolling hashes
    mod the Mersenne prime 2^61-1 — a cheap content-defined signature stable
    under small edits. Fully batch-vectorized: all docs' utf-8 bytes are
    concatenated into one buffer, every window hash is computed by a
    K-step Horner recurrence in two-limb uint64 Mersenne arithmetic (no
    Python bignums, no per-row loop), boundary-crossing windows are masked,
    and per-doc minima come from one ``np.minimum.reduceat``. Values are
    bit-identical to the scalar definition h_i = sum_k B^(K-1-k)*byte[i+k]
    mod P (the DuckDB oracle twin in entry_queries._fingerprint_sql)."""
    B, P = 257, (1 << 61) - 1
    K = 8
    out = np.zeros(len(texts), dtype=np.int64)
    s = texts.fillna("")
    enc = s.str.encode("utf-8", "surrogatepass")
    blens = enc.str.len().to_numpy(dtype=np.int64)
    # parity with the scalar kernel/oracle: CHAR length < K is also 0
    valid = (s.str.len().to_numpy(dtype=np.int64) >= K) & (blens >= K)
    if not valid.any():
        return pd.Series(out)
    lens = blens[valid]
    buf = np.frombuffer(b"".join(enc[valid].tolist()), dtype=np.uint8).astype(
        np.uint64
    )
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    nwin = len(buf) - K + 1

    # Horner over the K window positions, vectorized across ALL windows.
    # Invariant per step: h < P = 2^61-1. h*B needs up to 70 bits, so split
    # h = hi*2^32 + lo and use 2^61 === 1 (mod P) to fold hi*B*2^32:
    #   z = hi*B (< 2^38);  z*2^32 = (z>>29)*2^61 + (z & (2^29-1))*2^32
    #                              === (z>>29) + ((z & (2^29-1)) << 32)
    # so every intermediate stays < 2^62 and fits uint64.
    M61 = np.uint64(P)
    MASK29 = np.uint64((1 << 29) - 1)
    MASK32 = np.uint64((1 << 32) - 1)
    Bu = np.uint64(B)
    u29, u32, u61 = np.uint64(29), np.uint64(32), np.uint64(61)
    h = np.zeros(nwin, dtype=np.uint64)
    for k in range(K):
        v = buf[k : k + nwin]
        z = (h >> u32) * Bu
        w = (z >> u29) + ((z & MASK29) << u32) + (h & MASK32) * Bu + v
        w = (w & M61) + (w >> u61)
        h = np.where(w >= M61, w - M61, w)

    # mask windows that cross a doc boundary (starts in
    # [off[d] + len[d] - K + 1, off[d+1])), then one reduceat per-doc min;
    # every valid doc has len >= K so each segment keeps >= 1 real window
    bad_start = np.minimum(offs[:-1] + lens - K + 1, nwin)
    bad_end = np.minimum(offs[1:], nwin)
    delta = np.zeros(nwin + 1, dtype=np.int32)
    np.add.at(delta, bad_start, 1)
    np.add.at(delta, bad_end, -1)
    h[np.cumsum(delta[:nwin]) > 0] = np.uint64(0xFFFFFFFFFFFFFFFF)
    mins = np.minimum.reduceat(h, offs[:-1])
    out[valid] = mins.astype(np.int64)  # mins < P < 2^62: `% 2^62` identity
    return pd.Series(out)


fingerprint_udf = pandas_udf(_fingerprint_batch, LongType())


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), fingerprint_udf(F.col(text_col)).alias("fingerprint"))
