"""Logical inverted index: build + query over Spark DataFrames.

This is the engine's core. The "index" is not a hand-rolled page file (the
reference's ``InvertedIndex.java:816-975`` flush layout); it is a pair of
DataFrames that Catalyst can push filters into:

- ``postings``: one row per (doc_id, term) —
  ``(doc_id: string, term: string, tf: int, positions: array<int>, dl: int)``
  where ``positions`` are 0-based indices into the analyzed token stream
  (reference ``InvertedIndexManager.addDocument``, ``:303-322``) and ``dl``
  is the document's total analyzed token count (BM25 length normalization).
- ``term_stats``: ``(term, df, cf)`` — document frequency / collection
  frequency; the reference's term-dictionary header (``InvertedIndex.java:
  184-268``) reduced to the only fields queries actually need.

plus two scalars ``(n_docs, avgdl)``. Postings construction is shuffle-free:
one Arrow-vectorized pandas UDF emits per-document term/position structs,
then ``explode``. All aggregations that follow are partial-aggregate-friendly
(map-side combine), so hot terms skew only the artifact-packing stage, which
salts explicitly (see ``artifact.py``).

DocIDs are global strings (``conv_id:turn_idx`` for transcripts; any unique
key otherwise) — this kills the reference's segment-local docID re-basing
(``InvertedIndex.java:678``) and the whole header/pointer layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import BM25_K1, BM25_B
from ..analysis import get_analyzer
from ..analysis.porter import stem
from ..analysis.tokenizers import punctuation_tokenize

# Flat Arrow boundary for the analyze UDFs: one struct of parallel arrays
# per document instead of a list of per-term dicts. Arrow converts flat
# numpy/str arrays ~2x faster than list-of-dict rows (measured 9.3 s ->
# 5.8 s for the 1.37M-turn analyze, BENCH.md round-3 notes); the
# per-term structs are zipped back JVM-side by `_zip_terms` at zero
# Python cost. `dl` rides along so no downstream aggregate recomputes it.
DOC_TERMS_SCHEMA = StructType(
    [
        StructField("dl", IntegerType()),
        StructField("terms", ArrayType(StringType())),
        StructField("poss", ArrayType(ArrayType(IntegerType()))),
    ]
)

DOC_COUNTS_SCHEMA = StructType(
    [
        StructField("dl", IntegerType()),
        StructField("terms", ArrayType(StringType())),
        StructField("tfs", ArrayType(IntegerType())),
    ]
)


def _tokenize_batch(texts, analyzer_name: str):
    """Tokenize a batch and factorize tokens to dense term codes, with
    stemming applied only to the batch vocabulary (not per token). Returns
    ``(token_lists_lens, doc_idx, tcodes, positions, terms)`` — everything
    per-token is a numpy array; the only Python-level loops are over the
    batch vocabulary and the final per-(doc, term) runs. This is the
    allocator-light form of the analyze kernel: no per-token dict churn, no
    per-position int objects (see BENCH.md scaling notes)."""
    if analyzer_name == "composable":
        token_lists = [
            punctuation_tokenize(t) if t is not None else [] for t in texts
        ]
    else:
        fn = get_analyzer(analyzer_name)
        token_lists = [fn(t) if t is not None else [] for t in texts]
    n_docs = len(token_lists)
    lens = np.fromiter(
        (len(t) for t in token_lists), dtype=np.int64, count=n_docs
    )
    total = int(lens.sum())
    if total == 0:
        return lens, None, None, None, []
    flat = np.empty(total, dtype=object)
    i = 0
    for toks in token_lists:
        flat[i : i + len(toks)] = toks
        i += len(toks)
    codes, uniques = pd.factorize(flat, sort=False)
    if analyzer_name == "composable":
        # stem the vocabulary, merging codes that stem identically
        term_ids: dict[str, int] = {}
        terms: list[str] = []
        remap = np.empty(len(uniques), dtype=np.int64)
        for j, raw in enumerate(uniques):
            s = stem(raw)
            tid = term_ids.get(s)
            if tid is None:
                tid = term_ids[s] = len(terms)
                terms.append(s)
            remap[j] = tid
        tcodes = remap[codes]
    else:
        terms = list(uniques)
        tcodes = codes.astype(np.int64, copy=False)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    positions = (np.arange(total, dtype=np.int64) - np.repeat(offsets, lens)).astype(
        np.int32
    )
    return lens, doc_idx, tcodes, positions, terms


def _doc_term_runs(doc_idx, tcodes, positions):
    """Stable-group token streams by (doc, term): returns sorted arrays plus
    run boundaries. Positions within a run stay ascending (lexsort is
    stable on the last key being the primary — keys are (pos, term, doc))."""
    order = np.lexsort((positions, tcodes, doc_idx))
    d_s, t_s, p_s = doc_idx[order], tcodes[order], positions[order]
    change = np.flatnonzero((d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1]))
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [len(d_s)]))
    return d_s, t_s, p_s, starts, ends


def make_doc_terms_udf(analyzer: str = "composable", positional: bool = True):
    """pandas UDF: text -> struct<dl, terms, poss|tfs> (per-document
    postings as parallel flat arrays, built entirely inside one Arrow
    batch — no groupBy needed). All per-token work is C-level (regex
    tokenize, factorize, numpy index arithmetic); Python loops touch only
    the batch vocabulary (stemming) and the (doc, term) runs. Position
    arrays are handed to Arrow as int32 numpy slices — no per-position
    Python ints are ever allocated — and the flat layout avoids the
    list-of-dict conversion that used to dominate the Arrow return path."""
    analyzer_name = analyzer

    def _batch(texts: pd.Series) -> pd.DataFrame:
        lens, doc_idx, tcodes, positions, terms = _tokenize_batch(
            texts, analyzer_name
        )
        nd = len(lens)
        terms_out: list[list] = [[] for _ in range(nd)]
        vals_out: list[list] = [[] for _ in range(nd)]
        if doc_idx is not None:
            d_s, t_s, p_s, starts, ends = _doc_term_runs(
                doc_idx, tcodes, positions
            )
            if positional:
                for s, e in zip(starts, ends):
                    d = d_s[s]
                    terms_out[d].append(terms[t_s[s]])
                    vals_out[d].append(p_s[s:e])
            else:
                for s, e in zip(starts, ends):
                    d = d_s[s]
                    terms_out[d].append(terms[t_s[s]])
                    vals_out[d].append(int(e - s))
        return pd.DataFrame(
            {
                "dl": lens.astype("int32"),
                "terms": terms_out,
                ("poss" if positional else "tfs"): vals_out,
            }
        )

    return pandas_udf(
        _batch, DOC_TERMS_SCHEMA if positional else DOC_COUNTS_SCHEMA
    )


def _zip_terms(r, positional: bool = True):
    """struct<dl, terms, poss|tfs> column -> array<struct<term, positions|tf>>
    (pure JVM expression; pairs the flat UDF output back into the per-term
    struct shape downstream operators consume)."""
    if positional:
        return F.transform(
            F.arrays_zip(r["terms"], r["poss"]),
            lambda s: F.struct(
                s["terms"].alias("term"), s["poss"].alias("positions")
            ),
        )
    return F.transform(
        F.arrays_zip(r["terms"], r["tfs"]),
        lambda s: F.struct(s["terms"].alias("term"), s["tfs"].alias("tf")),
    )


def make_term_positions_udf(analyzer: str = "composable"):
    """Column function: text -> array<struct<term, positions>>. Kept for
    compatibility with per-column composition (streaming windows); now a
    thin zip over the flat `make_doc_terms_udf` boundary."""
    udf = make_doc_terms_udf(analyzer, positional=True)

    def col_fn(c):
        return _zip_terms(udf(c), positional=True)

    return col_fn


@dataclass
class Index:
    """A built logical index. ``postings``/``term_stats`` may be freshly
    computed DataFrames or reads of the persisted artifact."""

    spark: SparkSession
    postings: DataFrame  # (doc_id, term, tf, positions, dl)
    term_stats: DataFrame  # (term, df, cf)
    n_docs: int
    avgdl: float
    analyzer: str = "composable"
    k1: float = BM25_K1
    b: float = BM25_B
    corpus: DataFrame | None = None  # optional, for hydration
    doc_id_col: str = "doc_id"
    text_col: str = "text"
    tombstones: DataFrame | None = None  # (doc_id) of deleted docs
    positional: bool = True
    _qstats_cache: dict = field(default_factory=dict, repr=False)

    # --- query-string analysis (driver-side, same chain as the build) ---
    def analyze_query(self, query: str | Iterable[str]) -> list[str]:
        if not isinstance(query, str):
            # reference joins multi-keyword queries with spaces and re-analyzes
            # (InvertedIndexManager.java:492-495)
            query = " ".join(query)
        return get_analyzer(self.analyzer)(query)

    def query_term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """{term: (df, cf)} for the given terms (tiny driver-side collect)."""
        missing = [t for t in set(terms) if t not in self._qstats_cache]
        if missing:
            rows = self.term_stats.where(F.col("term").isin(missing)).collect()
            got = {r["term"]: (r["df"], r["cf"]) for r in rows}
            for t in missing:
                self._qstats_cache[t] = got.get(t, (0, 0))
        return {t: self._qstats_cache[t] for t in set(terms)}

    def postings_for_terms(
        self, terms, positional: bool = True, spread: bool = False
    ) -> DataFrame:
        """Postings restricted to the given terms. Query operators go through
        this hook so the artifact-backed index can apply the term filter to
        the *compressed block* scan (parquet predicate pushdown) before
        decoding — a ``.where`` above a decode ``mapInPandas`` would not push
        through the Python barrier. ``positional=False`` tells a backend the
        caller won't read ``positions`` (the artifact skips the position
        bytes entirely); here positions live inline, nothing to save.
        ``spread`` is the artifact backend's decode-skew knob (hot-term
        block rows round-robined before the decode barrier); the logical
        index has no compressed blocks, so it is a no-op here."""
        return self.filter_deleted(
            self.postings.where(F.col("term").isin(list(terms)))
        )

    def all_postings(self, positional: bool = True) -> DataFrame:
        """The FULL postings frame (no term filter) for corpus-wide
        exports (``doc_vectors``). ``positional=False`` tells a backend
        the caller won't read ``positions`` — the artifact then projects
        the dominant position bytes out of the block scan entirely; here
        positions live inline, nothing to save. NOT delete-filtered:
        callers compose with :meth:`filter_deleted`."""
        return self.postings

    def filter_deleted(self, df: DataFrame) -> DataFrame:
        """Anti-join tombstoned docs out of any doc_id-keyed frame — the
        reference's query-time tombstone filter (``InvertedIndex.java:
        1222-1224,1255-1257``). Stats deliberately stay stale until
        compaction, matching the reference (purge only at merge,
        ``InvertedIndex.java:640-697``)."""
        if self.tombstones is None:
            return df
        return df.join(self.tombstones, on="doc_id", how="left_anti")

    def delete_documents(self, keyword: str) -> int:
        """Tombstone every doc matching ``keyword`` (reference
        ``deleteDocuments``, ``InvertedIndexManager.java:677-715``). Returns
        the number of newly deleted docs."""
        matched = self.search_keyword(keyword).select("doc_id")
        matched = matched.persist()
        n = matched.count()
        if self.tombstones is None:
            self.tombstones = matched
        else:
            # persist the union and drop the old frame: without this, every
            # delete chains another lazy keyword-search lineage that all
            # subsequent queries re-execute inside their anti-join
            prev = self.tombstones
            self.tombstones = prev.unionByName(matched).distinct().persist()
            self.tombstones.count()
            prev.unpersist()
            matched.unpersist()
        return n

    # --- query operators (implemented in query/, bound here for ergonomics) ---
    def search_keyword(self, query: str) -> DataFrame:
        from ..query.boolean import search_keyword

        return search_keyword(self, query)

    def search_and(self, keywords) -> DataFrame:
        from ..query.boolean import search_and

        return search_and(self, keywords)

    def search_or(self, keywords) -> DataFrame:
        from ..query.boolean import search_or

        return search_or(self, keywords)

    def search_boolean(self, query: str, universe: DataFrame | None = None) -> DataFrame:
        """Boolean query tree (AND/OR/NOT + parens) — see query/boolexpr.py."""
        from ..query.boolexpr import search_boolean

        return search_boolean(self, query, universe)

    def search_near(self, query: str, window: int) -> DataFrame:
        """Unordered proximity search — see query/proximity.py."""
        if not self.positional:
            raise ValueError("proximity search requires a positional index")
        from ..query.proximity import search_near

        return search_near(self, query, window)

    def search_phrase(self, phrase: str) -> DataFrame:
        if not self.positional:
            # reference parity: phrase search without positions throws
            # (InvertedIndexManager.java:234)
            raise ValueError("phrase search requires a positional index")
        from ..query.phrase import search_phrase

        return search_phrase(self, phrase)

    def search_phrase_slop(self, phrase: str, slop: int) -> DataFrame:
        """Ordered sloppy phrase (SpanNearQuery inOrder=true) — see
        query/phrase.py::search_phrase_slop; slop=0 == exact phrase."""
        if not self.positional:
            raise ValueError("phrase search requires a positional index")
        from ..query.phrase import search_phrase_slop

        return search_phrase_slop(self, phrase, slop)

    def search_bm25(self, query: str, k: int | None = None) -> DataFrame:
        from ..query.ranked import search_bm25

        return search_bm25(self, query, k)

    def search_bm25_filtered(
        self, query: str, allowed: DataFrame, k: int | None = None
    ) -> DataFrame:
        """BM25 restricted to a doc_id frame (metadata-filtered search);
        the filter semi-joins postings BEFORE the scoring shuffle."""
        from ..query.ranked import search_bm25

        return search_bm25(self, query, k, allowed=allowed)

    def search_bm25_boolean(
        self,
        must: list | None = None,
        should: list | None = None,
        must_not: list | None = None,
        k: int | None = None,
    ) -> DataFrame:
        """Lucene BooleanQuery with BM25 scoring — see
        query/ranked.py::search_bm25_boolean."""
        from ..query.ranked import search_bm25_boolean

        return search_bm25_boolean(self, must, should, must_not, k)

    def explain_score(self, query: str, doc_ids: list) -> DataFrame:
        """Per-(doc, term) BM25 breakdown — see
        query/ranked.py::explain_bm25."""
        from ..query.ranked import explain_bm25

        return explain_bm25(self, query, doc_ids)

    def search_bm25_prf(
        self,
        query: str,
        k: int | None = 10,
        fb_docs: int = 5,
        fb_terms: int = 5,
        id_cast: str | None = None,
    ) -> DataFrame:
        """BM25 with Rocchio-style pseudo-relevance feedback — see
        query/feedback.py."""
        from ..query.feedback import search_bm25_prf

        return search_bm25_prf(self, query, k, fb_docs, fb_terms, id_cast)

    def search_bm25_after(
        self,
        query: str,
        k: int,
        cursor=None,
        decimals: int = 4,
        id_cast: str | None = None,
    ) -> DataFrame:
        """Cursor pagination — see query/ranked.py::search_bm25_after."""
        from ..query.ranked import search_bm25_after

        return search_bm25_after(self, query, k, cursor, decimals, id_cast)

    def search_tfidf(self, query: str, k: int | None = None) -> DataFrame:
        from ..query.ranked import search_tfidf

        return search_tfidf(self, query, k)

    def search_bm25_batch(self, queries, k: int | None = None) -> DataFrame:
        """Many queries, one postings scan — see query/ranked.py. Inherited
        by ArtifactIndex, where the union term filter reaches the compressed
        block scan before the decode barrier."""
        from ..query.ranked import search_bm25_batch

        return search_bm25_batch(self, queries, k)

    def document_frequency(self, token: str) -> int:
        """Reference ``getDocumentFrequency`` (InvertedIndexManager.java:660-670),
        global (no segments to sum over)."""
        return self.query_term_stats([token])[token][0]

    def full_scan_search(self, keyword: str) -> DataFrame:
        """Q10: the reference's FullScanSearcher debugging oracle
        (``search/FullScanSearcher.java:27-40``) — a doc matches iff
        analyze(doc) ⊇ analyze(keyword). Scans the corpus, no index."""
        if self.corpus is None:
            raise ValueError("index built without corpus reference")
        from ..analysis.analyzer import make_analyze_udf

        terms = self.analyze_query(keyword)
        if not terms:
            return self.spark.createDataFrame([], "doc_id string")
        toks = make_analyze_udf(self.analyzer)(F.col(self.text_col))
        cond = F.lit(True)
        for t in set(terms):
            cond = cond & F.array_contains(toks, t)
        return self.filter_deleted(
            self.corpus.where(cond).select(
                F.col(self.doc_id_col).cast("string").alias("doc_id")
            )
        )

    def document_iterator(self):
        """Q11: stream all (doc_id, text) pairs in stable doc_id order
        (reference ``documentIterator``, ``InvertedIndexManager.java:
        549-561``). Returns a toLocalIterator — documents stream to the
        driver one partition at a time, never all at once."""
        if self.corpus is None:
            raise ValueError("index built without corpus reference")
        return (
            self.filter_deleted(
                self.corpus.select(
                    F.col(self.doc_id_col).cast("string").alias("doc_id"),
                    F.col(self.text_col).alias("text"),
                )
            )
            .orderBy("doc_id")
            .toLocalIterator()
        )

    def attach_corpus(
        self, corpus: DataFrame, doc_id_col: str = "doc_id", text_col: str = "text"
    ) -> "Index":
        """Bind a corpus table for hydration/full-scan (artifact-backed
        indexes don't store document text — the source table is the doc
        store, SURVEY.md S1-S3)."""
        self.corpus = corpus
        self.doc_id_col = doc_id_col
        self.text_col = text_col
        return self

    def hydrate(self, results: DataFrame) -> DataFrame:
        """Join matched doc_ids back to the corpus (reference readDocuments,
        InvertedIndex.java:1367-1389) with stable doc_id ordering. Result
        frames always expose the id as ``doc_id`` regardless of the
        corpus's ``doc_id_col``, so align the corpus side to it."""
        if self.corpus is None:
            raise ValueError("index built without corpus reference")
        corpus = self.corpus
        if self.doc_id_col != "doc_id":
            corpus = corpus.withColumnRenamed(self.doc_id_col, "doc_id")
        return results.join(corpus, on="doc_id", how="inner")

    def term_vectors(self, doc_ids: list) -> DataFrame:
        """Per-document term vectors (the Elasticsearch ``_termvectors``
        surface): one row per (doc, analyzed term) with its tf and sorted
        position list, recomputed by RE-ANALYZING the stored text — the
        doc-major access path. Going through the corpus point lookup +
        the vectorized analyze UDF costs O(|doc_ids|) on any backend; the
        term-major postings (artifact blocks) never support a cheap
        doc_id probe, exactly why ES term vectors re-analyze stored
        fields too. Tombstoned docs yield no rows. Returns
        ``(doc_id, term, tf, positions array<int>)``."""
        schema = "doc_id string, term string, tf int, positions array<int>"
        if not doc_ids:
            return self.spark.createDataFrame([], schema)
        ids = self.spark.createDataFrame(
            [(str(d),) for d in sorted(set(doc_ids))], "doc_id string"
        )
        docs = self.filter_deleted(self.hydrate(ids))
        udf = make_doc_terms_udf(self.analyzer, positional=True)
        return (
            docs.select(
                "doc_id",
                F.explode(
                    _zip_terms(udf(F.col(self.text_col)), positional=True)
                ).alias("e"),
            )
            .select(
                "doc_id",
                F.col("e.term").alias("term"),
                F.size("e.positions").cast("int").alias("tf"),
                F.array_sort("e.positions").alias("positions"),
            )
        )


def make_term_counts_udf(analyzer: str = "composable"):
    """Column function: text -> array<struct<term, tf>> (non-positional
    fast path; zip over the flat UDF boundary, same factorize kernel)."""
    udf = make_doc_terms_udf(analyzer, positional=False)

    def col_fn(c):
        return _zip_terms(udf(c), positional=False)

    return col_fn


def build_doc_terms(
    corpus: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "composable",
    positional: bool = True,
) -> DataFrame:
    """Pre-explode form: ONE row per doc — (doc_id, dl, tp) where tp is the
    per-doc array of term structs. The artifact build persists THIS (1 row
    per doc) instead of the exploded postings (1 row per (doc, term)): same
    bytes, far fewer row objects to cache, and the doc-length table falls
    out with no groupBy shuffle. ``dl`` rides out of the UDF directly and
    ``tp`` is zipped from the flat arrays JVM-side (see DOC_TERMS_SCHEMA)."""
    udf = make_doc_terms_udf(analyzer, positional)
    flat = corpus.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        udf(F.col(text_col)).alias("r"),
    )
    return flat.select(
        "doc_id",
        _zip_terms(F.col("r"), positional).alias("tp"),
        F.col("r.dl").alias("dl"),
    )


def explode_doc_terms(doc_terms: DataFrame, positional: bool = True) -> DataFrame:
    """(doc_id, dl, tp) -> exploded postings (doc_id, term, tf, positions, dl)."""
    e = doc_terms.select("doc_id", "dl", F.explode("tp").alias("e"))
    if positional:
        return e.select(
            "doc_id",
            F.col("e.term").alias("term"),
            F.size("e.positions").alias("tf"),
            F.col("e.positions").alias("positions"),
            "dl",
        )
    return e.select(
        "doc_id",
        F.col("e.term").alias("term"),
        F.col("e.tf").alias("tf"),
        F.lit(None).cast(ArrayType(IntegerType())).alias("positions"),
        "dl",
    )


def build_postings(
    corpus: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "composable",
    positional: bool = True,
) -> DataFrame:
    """Shuffle-free postings extraction: (doc_id, term, tf, positions, dl).
    ``positional=False`` uses the vectorized term-count UDF and emits
    ``positions`` as null (phrase search then raises, reference parity)."""
    return explode_doc_terms(
        build_doc_terms(corpus, doc_id_col, text_col, analyzer, positional),
        positional,
    )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "composable",
    k1: float = BM25_K1,
    b: float = BM25_B,
    cache: bool = True,
    positional: bool = True,
) -> Index:
    """Build the logical index from a corpus DataFrame.

    ``cache=True`` persists the postings (they back every query); for the
    persisted-artifact path use ``artifact.build_artifact`` instead.
    """
    from ..session import scan_waves

    postings = build_postings(corpus, doc_id_col, text_col, analyzer, positional)
    if cache:
        postings = postings.persist()
    # df = rows per term (one row per (doc, term)); cf = total term count.
    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    if cache:
        term_stats = term_stats.persist()
    # the analyze scan materializes inside this block (total_tokens pulls
    # term_stats <- postings): build-scoped >=2 scan waves per core
    with scan_waves(spark):
        # n_docs counts every corpus row (docs whose analyzed text is empty
        # still counts toward N, matching the reference's docNum accounting).
        n_docs = corpus.count()
        # total tokens = Σ tf over all postings = Σ cf — read off the (much
        # smaller) stats table instead of re-shuffling postings by doc_id.
        total_tokens = term_stats.agg(F.sum("cf").alias("t")).collect()[0]["t"] or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    return Index(
        spark=spark,
        postings=postings,
        term_stats=term_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        analyzer=analyzer,
        k1=k1,
        b=b,
        corpus=corpus,
        doc_id_col=doc_id_col,
        text_col=text_col,
        positional=positional,
    )
