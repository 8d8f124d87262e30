"""Learning-to-rank feature extraction: per (query, candidate-doc) feature
vectors for training a reranker over the engine's own retrieval — the
feature-logging surface of an LTR pipeline (Elasticsearch LTR plugin /
feature-store pattern), run as ONE Spark job over the shared postings scan.

The reference engine stops at BM25/TF-IDF ranking (``SearchOperation.java``,
SURVEY.md §2.5); this is the training-data extension: the same index
statistics, re-expressed as a feature table a GBDT/cross-encoder reranker
trains on.

Candidates are the per-query BM25 top-``k`` (standard candidate sampling);
each (query_id, doc_id) row carries lexical features computable from the
index alone — no second corpus scan, no per-row Python:

  - ``bm25_r``      rounded BM25 score (sorted-term fold, bit-identical)
  - ``tfidf_r``     rounded cosine-normalized TF-IDF (the engine's
                    log10(N/df+1) idf quirk, matching ``search_tfidf``)
  - ``tf_sum``      total term frequency of matched query terms
  - ``idf_sum_r``   summed BM25 idf over matched DISTINCT terms
  - ``coverage_r``  matched distinct terms / distinct analyzed query terms
  - ``dl``          document length in tokens
  - ``dl_ratio_r``  dl / corpus avgdl

With ``proximity=True`` each row additionally carries

  - ``min_pair_dist``  minimum token distance between occurrences of two
                       DIFFERENT matched query terms in the doc (the
                       classic LTR "min pair proximity" feature; NULL when
                       fewer than two distinct terms matched)

computed by a candidate-restricted positional decode — the rescorer
pattern (``proximity.search_bm25_rescore_near``): positions are read only
for the k·|Q| docs that survived the candidate cut, never the full match
set, so the feature costs O(k·|Q|) position arrays regardless of corpus
size.

Plan shape: one broadcast (query_id, term, qtf, idf, idf_t) frame joined
into a SINGLE ``postings_for_terms`` scan of the union vocabulary (term
filter pushed below the decode barrier on the artifact backend), one
(query_id, doc_id) aggregate whose float features fold in sorted-term
order (the engine's bit-identity invariant), then one per-query window cut
at ROUNDED bm25 + doc_id — the deterministic boundary an oracle replays.
The window shuffle is keyed on query_id alone (same shape as
``search_bm25_batch``); for corpus-hot queries at 10^12-doc scale,
pre-cut candidates per query with block-max WAND and pass ``allowed``.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranked import _bm25_partial, bm25_idf, tfidf_idf

_FEATURE_SCHEMA = (
    "query_id string, doc_id string, bm25_r double, tfidf_r double, "
    "tf_sum long, idf_sum_r double, coverage_r double, dl long, "
    "dl_ratio_r double"
)


def _with_min_pair_dist(index, out, qdf, terms, id_cast):
    """Append ``min_pair_dist`` to the candidate frame ``out``: the minimum
    token distance between occurrences of two DIFFERENT query terms in the
    doc, NULL when fewer than two distinct terms matched.

    The positional decode is restricted to ``out``'s (query_id, doc_id)
    candidates BEFORE the per-doc aggregate (broadcast semi-join below the
    posmap shuffle — ``phrase.position_maps(allowed=...)``'s shape), so
    out-of-window position arrays never move. The per-doc test is one JVM
    fold over the merged position-sorted occurrence list: the closest
    different-term pair is always ADJACENT there (any occurrence strictly
    between a candidate pair forms a strictly closer pair with whichever
    endpoint its term differs from), so one linear pass is exact."""
    post = index.postings_for_terms(terms)
    doc_dt = dict(post.dtypes)["doc_id"]
    cand = out.select("query_id", F.col("doc_id").cast(doc_dt).alias("doc_id"))
    # merged occurrence list (pos, term), position-sorted; array_distinct
    # drops segment-duplicate (term, positions) twins (position_maps's
    # transient-duplication rule) so a twin can't fake a 0-distance pair
    occ = F.array_sort(
        F.flatten(
            F.transform(
                F.array_distinct(F.collect_list(F.struct("term", "positions"))),
                lambda e: F.transform(
                    e["positions"],
                    lambda p: F.struct(
                        p.cast("long").alias("pos"), e["term"].alias("term")
                    ),
                ),
            )
        )
    )
    init = F.struct(
        F.lit(None).cast("long").alias("prev_pos"),
        F.lit(None).cast("string").alias("prev_term"),
        F.lit(None).cast("long").alias("best"),
    )

    def step(acc, x):
        # F.least skips NULLs, so the first cross-term gap seeds `best`
        better = F.when(
            acc["prev_term"].isNotNull() & (acc["prev_term"] != x["term"]),
            F.least(acc["best"], x["pos"] - acc["prev_pos"]),
        ).otherwise(acc["best"])
        return F.struct(
            x["pos"].alias("prev_pos"),
            x["term"].alias("prev_term"),
            better.alias("best"),
        )

    prox = (
        post.join(F.broadcast(qdf.select("query_id", "term")), "term")
        .join(F.broadcast(cand), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id", "doc_id")
        .agg(F.aggregate(occ, init, step)["best"].alias("min_pair_dist"))
        .select(
            "query_id",
            (
                F.col("doc_id").cast(id_cast) if id_cast else F.col("doc_id")
            ).alias("doc_id"),
            "min_pair_dist",
        )
    )
    return out.join(F.broadcast(prox), ["query_id", "doc_id"], "left")


def ltr_features(
    index,
    queries: dict | list,
    k: int = 20,
    decimals: int = 4,
    id_cast: str | None = None,
    judgments: DataFrame | None = None,
    proximity: bool = False,
) -> DataFrame:
    """Feature vectors for the per-query BM25 top-``k`` candidates of every
    query in ``queries`` (``{query_id: text}``; a plain list is auto-keyed
    ``q0..qN``). Returns one row per (query_id, doc_id) ordered by
    (query_id, bm25_r desc, doc_id) — see the module docstring for the
    feature definitions.

    ``id_cast`` casts doc_id before the candidate cut so rounded-score
    ties break in the corpus's native id order (same contract as
    ``hybrid_search``). ``judgments`` (query_id, doc_id, grade) appends a
    ``label`` column — the training target — with unjudged candidates at
    grade 0 (the pooling convention ``rank_eval`` uses). ``proximity=True``
    appends ``min_pair_dist`` via a candidate-restricted positional decode
    (see module docstring).
    """
    if not isinstance(queries, dict):
        queries = {f"q{i}": q for i, q in enumerate(queries)}
    spark = index.spark
    schema = _FEATURE_SCHEMA
    if id_cast is not None:
        schema = schema.replace("doc_id string", f"doc_id {id_cast}")
    if proximity:
        schema += ", min_pair_dist long"
    if judgments is not None:
        schema += ", label long"
    if not queries or k <= 0:
        return spark.createDataFrame([], schema)

    # one stats lookup for the union vocabulary, both idf flavors at once
    # (the _batch_query_weights shape, widened to two idf columns)
    analyzed = {
        qid: Counter(index.analyze_query(text)) for qid, text in queries.items()
    }
    union_terms = sorted({t for c in analyzed.values() for t in c})
    stats = index.query_term_stats(union_terms) if union_terms else {}
    rows = []
    nq_rows = []
    for qid, counts in sorted(analyzed.items()):
        # coverage denominator: ALL distinct analyzed terms, including
        # zero-df ones a doc can never match (they measure query length)
        nq_rows.append((qid, len(counts)))
        for term, qtf in sorted(counts.items()):
            df = stats[term][0]
            if df > 0:
                rows.append(
                    (
                        qid,
                        term,
                        qtf,
                        bm25_idf(index.n_docs, df),
                        tfidf_idf(index.n_docs, df),
                    )
                )
    if not rows:
        return spark.createDataFrame([], schema)
    qdf = spark.createDataFrame(
        rows, "query_id string, term string, qtf int, idf double, idf_t double"
    )
    nq = spark.createDataFrame(nq_rows, "query_id string, n_q int")

    partial = _bm25_partial(index)
    tfidf = F.col("tf").cast("double") * F.col("idf_t")
    p = F.struct(
        "term",
        partial.alias("bp"),
        (tfidf * F.col("idf_t") * F.col("qtf")).alias("dp"),
        (tfidf * tfidf).alias("lp"),
        F.col("idf").alias("ip"),
        F.col("tf").cast("long").alias("tfp"),
    )
    acc0 = F.struct(
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("d"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("i"),
    )
    # EVERY feature derives from the same array_distinct'ed sorted struct
    # list: the float folds get bit-identity across partitionings, and
    # tf_sum / matched stay consistent with them when a doc_id's postings
    # are duplicated across artifact segments (twin rows drop ONCE for all
    # features — summing tf outside the array would double tf_sum and push
    # coverage above 1.0 on exactly those docs)
    agg = (
        index.postings_for_terms(sorted({t for _, t, *_ in rows}), positional=False)
        .join(F.broadcast(qdf), "term")
        .select("query_id", "doc_id", "tf", "dl", p.alias("p"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("p"))).alias("ps"),
            F.max("dl").cast("long").alias("dl"),
        )
        .select(
            "query_id",
            "doc_id",
            "dl",
            F.aggregate(
                "ps",
                acc0,
                lambda a, x: F.struct(
                    (a["b"] + x["bp"]).alias("b"),
                    (a["d"] + x["dp"]).alias("d"),
                    (a["l"] + x["lp"]).alias("l"),
                    (a["i"] + x["ip"]).alias("i"),
                ),
            ).alias("acc"),
            F.aggregate(
                "ps", F.lit(0).cast("long"), lambda a, x: a + x["tfp"]
            ).alias("tf_sum"),
            F.size("ps").alias("matched"),
        )
    )
    avgdl = float(index.avgdl) or 1.0
    feats = (
        agg.join(F.broadcast(nq), "query_id")
        .select(
            "query_id",
            (
                F.col("doc_id").cast(id_cast) if id_cast else F.col("doc_id")
            ).alias("doc_id"),
            F.round(F.col("acc.b"), decimals).alias("bm25_r"),
            F.round(
                F.col("acc.d") / F.sqrt(F.col("acc.l")), decimals
            ).alias("tfidf_r"),
            "tf_sum",
            F.round(F.col("acc.i"), decimals).alias("idf_sum_r"),
            F.round(
                F.col("matched").cast("double") / F.col("n_q").cast("double"),
                decimals,
            ).alias("coverage_r"),
            "dl",
            F.round(F.col("dl") / F.lit(avgdl), decimals).alias("dl_ratio_r"),
        )
    )
    # salted two-phase cut (ranked.salted_topk_per_query): a plain
    # query_id window caps the per-query candidate sort at |Q| tasks
    from .ranked import salted_topk_per_query

    out = salted_topk_per_query(
        feats, k, [F.desc("bm25_r"), F.asc("doc_id")], "doc_id", index.spark
    )
    if proximity:
        # the cut frame feeds BOTH the output and the candidate restriction;
        # persist so the LTR aggregate doesn't execute twice (the rescorer
        # pattern — proximity.search_bm25_rescore_near persists its window)
        out = out.persist()
        out = _with_min_pair_dist(
            index, out, qdf, sorted({t for _, t, *_ in rows}), id_cast
        )
    if judgments is not None:
        j = judgments.select(
            F.col("query_id"),
            F.col("doc_id").cast(id_cast) if id_cast else F.col("doc_id"),
            F.col("grade").cast("long").alias("label"),
        )
        out = out.join(F.broadcast(j), ["query_id", "doc_id"], "left").withColumn(
            "label", F.coalesce(F.col("label"), F.lit(0).cast("long"))
        )
    return out.orderBy("query_id", F.desc("bm25_r"), F.asc("doc_id"))
