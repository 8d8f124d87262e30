"""BM25F: field-weighted BM25 over multi-field documents.

The reference engine scores a single text stream per document; a real
search surface over transcripts has *fields* (role streams: what the
user asked vs what the assistant said vs tool output), and field
weighting is the canonical way to rank across them (Robertson, Zaragoza
& Taylor, CIKM 2004 — "simple BM25F"): per-field term frequencies are
length-normalized *per field*, combined by field weights into a single
pseudo-frequency, and saturated ONCE:

    tf~(t,d)  = sum over fields f of  w_f * tf(t,d,f) / B_f(d)
    B_f(d)    = 1 - b_f + b_f * dl_f(d) / avgdl_f
    score(d)  = sum over query terms t of  qtf(t) * idf(t) * tf~ / (k1 + tf~)
    idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)     [engine's Lucene form]

Saturating AFTER the weighted combine is the point of BM25F — weighting
per-field BM25 scores instead would let a term saturate separately in
every field (the "you can't buy one field twice" argument in the paper).

Collection-statistic conventions (shared verbatim by the DuckDB oracle):

- only fields named in ``weights`` participate: df, N, dl, avgdl are all
  computed over the searched fields;
- ``df(t)`` is DOCUMENT-level: the number of distinct doc_ids containing
  t in ANY searched field;
- ``avgdl_f`` averages over (doc, field) groups PRESENT in the corpus —
  a document with no text in field f contributes nothing (not a zero);
- input is long format ``(doc_id, field, text)`` and may hold several
  rows per (doc, field) (e.g. one per transcript turn): tf and dl are
  additive, so rows aggregate without text concatenation.

Plan shape: ONE vectorized analyze pass over the searched-field rows
(persisted for its three consumers, then unpersisted once the small
matched frame is materialized), per-(doc, field) length aggregate,
query-term-filtered posting aggregate — only matching terms ever
shuffle — then broadcast joins of the tiny (field, w, b, avgdl) and
(term, qtf, idf) frames and two deterministic sorted folds (fields
within a term, terms within a doc) so scores are bit-identical across
partitionings. This is the ad-hoc fit-and-score form; at 10^12 turns
you would persist per-field postings as an artifact segment family and
reuse them across queries (same trade as ``textops/lm.py``).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_K1, BM25_B
from ..analysis.analyzer import get_analyzer
from ..index.engine import _zip_terms, make_doc_terms_udf
from .ranked import bm25_idf


def _analyzed_field_rows(
    fields_df: DataFrame,
    searched: list[str],
    analyzer: str,
    doc_id_col: str,
    field_col: str,
    text_col: str,
) -> DataFrame:
    """ONE vectorized analyze pass over the searched-field rows, persisted
    (callers unpersist): (doc_id, field, tp=[(term, tf)...], dl). Shared by
    BM25F and dis-max so the two scorers see byte-identical term frames."""
    udf = make_doc_terms_udf(analyzer, positional=False)
    return (
        fields_df.where(F.col(field_col).isin(searched))
        .select(
            F.col(doc_id_col).cast("string").alias("doc_id"),
            F.col(field_col).cast("string").alias("field"),
            udf(F.col(text_col)).alias("r"),
        )
        .select(
            "doc_id",
            "field",
            _zip_terms(F.col("r"), positional=False).alias("tp"),
            F.col("r.dl").alias("dl"),
        )
        .persist()
    )


def search_bm25f(
    spark,
    fields_df: DataFrame,
    query: str,
    weights: dict[str, float],
    k: int | None = None,
    k1: float = BM25_K1,
    b: float | dict[str, float] = BM25_B,
    doc_id_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
    analyzer: str = "composable",
) -> DataFrame:
    """Rank documents by simple BM25F over ``fields_df`` (long format:
    one row per (doc, field[, fragment])). ``weights`` maps field name ->
    boost; ``b`` is a scalar or a per-field dict (missing fields fall
    back to the scalar engine default). Returns (doc_id, score), score
    descending with doc_id ascending tie-break; ``k`` truncates.
    """
    if not weights:
        raise ValueError("BM25F needs at least one (field, weight) entry")
    b_default = BM25_B if isinstance(b, dict) else float(b)
    b_map = {f: float((b if isinstance(b, dict) else {}).get(f, b_default))
             for f in weights}
    qtf = Counter(get_analyzer(analyzer)(query))
    empty = spark.createDataFrame([], "doc_id string, score double")
    if not qtf or k == 0:
        return empty
    qterms = sorted(qtf)

    searched = sorted(weights)
    rows = _analyzed_field_rows(
        fields_df, searched, analyzer, doc_id_col, field_col, text_col
    )
    try:
        # per-(doc, field) length — corpus-wide (avgdl_f needs it), but a
        # thin 3-column aggregate with map-side combine
        dls = rows.groupBy("doc_id", "field").agg(F.sum("dl").alias("dl"))
        # postings filtered to the query vocabulary BEFORE any shuffle
        qpost = (
            rows.select("doc_id", "field", F.explode("tp").alias("e"))
            .where(F.col("e.term").isin(qterms))
            .groupBy("doc_id", "field", F.col("e.term").alias("term"))
            .agg(F.sum("e.tf").alias("tf"))
        )
        # matched scoring input: O(matched docs x query terms) — small;
        # materialize it so `rows` can be released
        md = qpost.join(dls, ["doc_id", "field"]).persist()
        md.count()

        # driver-side collection stats, all O(1)/O(|q|)/O(#fields)
        n_docs = rows.select("doc_id").distinct().count()
        avgdl = {
            r["field"]: float(r["avgdl"])
            for r in dls.groupBy("field")
            .agg(F.avg("dl").alias("avgdl"))
            .collect()
        }
        df_map = {
            r["term"]: r["df"]
            for r in md.select("term", "doc_id")
            .distinct()
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        }
    finally:
        rows.unpersist()

    qrows = [
        (t, int(c), bm25_idf(n_docs, df_map[t]))
        for t, c in sorted(qtf.items())
        if df_map.get(t, 0) > 0
    ]
    if not qrows:
        md.unpersist()
        return empty
    qdf = spark.createDataFrame(qrows, "term string, qtf int, idf double")
    prows = [
        (f, float(weights[f]), b_map[f], avgdl[f])
        for f in searched
        if f in avgdl
    ]
    params = spark.createDataFrame(
        prows, "field string, w double, b double, avgdl double"
    )

    contrib = (
        F.col("w")
        * F.col("tf").cast("double")
        / (1.0 - F.col("b") + F.col("b") * F.col("dl") / F.col("avgdl"))
    )
    # fields fold in sorted-field order, terms in sorted-term order — the
    # engine's bit-identity idiom (query/ranked.py): float addition is
    # order-sensitive, so both folds pin a canonical order
    wtf = (
        md.join(F.broadcast(params), "field")
        .select("doc_id", "term", F.struct("field", contrib.alias("c")).alias("p"))
        .groupBy("doc_id", "term")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("wtf")
        )
    )
    partial = (
        F.col("qtf")
        * F.col("idf")
        * F.col("wtf")
        / (F.lit(float(k1)) + F.col("wtf"))
    )
    scored = (
        wtf.join(F.broadcast(qdf), "term")
        .select("doc_id", F.struct("term", partial.alias("s")).alias("p"))
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored


def search_dismax(
    spark,
    fields_df: DataFrame,
    query: str,
    fields: list[str],
    tie_breaker: float = 0.0,
    k: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_id_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
    analyzer: str = "composable",
) -> DataFrame:
    """Disjunction-max multi-field ranking (Elasticsearch ``dis_max`` /
    ``multi_match type: best_fields``): score the query INDEPENDENTLY
    against each field as its own BM25 collection, then per doc

        score(d) = max_f s_f(d) + tie_breaker * (sum_f s_f(d) - max_f s_f(d))

    — the best single field dominates (a doc matching all terms in ONE
    field beats a doc scattering them across fields, the opposite trade
    from BM25F's blended pseudo-frequency), with ``tie_breaker`` in
    [0, 1] crediting the other fields fractionally.

    Per-field collection statistics (the oracle replays them verbatim):
    for field f, ``N_f`` counts docs with any text in f, ``df_f(t)``
    counts docs containing t IN f, ``dl_f``/``avgdl_f`` are f's own
    lengths — each field is scored exactly as if it were a standalone
    single-field index (matching per-field Lucene index stats).

    Plan shape: the shared ONE-pass analyze (``_analyzed_field_rows``),
    per-(doc, field) aggregates, broadcast of the tiny (field, term)
    parameter frame, then two deterministic sorted folds (terms within a
    (doc, field), fields within a doc) for bit-identical scores. Returns
    (doc_id, score) descending with doc_id tie-break; ``k`` truncates.
    """
    if not fields:
        raise ValueError("dis_max needs at least one field")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    qtf = Counter(get_analyzer(analyzer)(query))
    empty = spark.createDataFrame([], "doc_id string, score double")
    if not qtf or k == 0:
        return empty
    qterms = sorted(qtf)
    searched = sorted(set(fields))

    rows = _analyzed_field_rows(
        fields_df, searched, analyzer, doc_id_col, field_col, text_col
    )
    try:
        dls = rows.groupBy("doc_id", "field").agg(F.sum("dl").alias("dl"))
        qpost = (
            rows.select("doc_id", "field", F.explode("tp").alias("e"))
            .where(F.col("e.term").isin(qterms))
            .groupBy("doc_id", "field", F.col("e.term").alias("term"))
            .agg(F.sum("e.tf").alias("tf"))
        )
        md = qpost.join(dls, ["doc_id", "field"]).persist()
        md.count()

        # per-FIELD collection stats: N_f, avgdl_f (O(#fields) collect),
        # df_f per query term (O(#fields x |q|))
        fstats = {
            r["field"]: (int(r["n"]), float(r["avgdl"]))
            for r in dls.groupBy("field")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
            .collect()
        }
        df_map = {
            (r["field"], r["term"]): r["df"]
            for r in md.groupBy("field", "term")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        }
    finally:
        rows.unpersist()

    prows = [
        (f, t, int(c), bm25_idf(fstats[f][0], df_map[(f, t)]), fstats[f][1])
        for f in searched
        if f in fstats
        for t, c in sorted(qtf.items())
        if df_map.get((f, t), 0) > 0
    ]
    if not prows:
        md.unpersist()
        return empty
    pdf = spark.createDataFrame(
        prows, "field string, term string, qtf int, idf double, avgdl double"
    )
    k1f, bf = float(k1), float(b)
    tf = F.col("tf").cast("double")
    norm = tf + k1f * (1.0 - bf + bf * F.col("dl") / F.col("avgdl"))
    partial = F.col("qtf") * F.col("idf") * tf * (k1f + 1.0) / norm
    fscores = (
        md.join(F.broadcast(pdf), ["field", "term"])
        .select(
            "doc_id",
            "field",
            F.struct("term", partial.alias("s")).alias("p"),
        )
        .groupBy("doc_id", "field")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("fscore")
        )
    )
    # combine fields per doc: max + tie_breaker * (sum - max), folding the
    # sum in sorted-field order (max is order-insensitive)
    farr = F.array_sort(F.collect_list(F.struct("field", "fscore")))
    fsum = F.aggregate(farr, F.lit(0.0), lambda acc, x: acc + x["fscore"])
    fmax = F.array_max(F.transform(farr, lambda x: x["fscore"]))
    scored = (
        fscores.groupBy("doc_id")
        .agg(fsum.alias("_sum"), fmax.alias("_max"))
        .select(
            "doc_id",
            (
                F.col("_max")
                + F.lit(float(tie_breaker)) * (F.col("_sum") - F.col("_max"))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored
