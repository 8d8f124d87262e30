"""Ranked search: Okapi BM25 (the engine's headline scorer) and the
reference's TF-IDF pseudo-cosine (kept for cross-checking).

BM25 (north rule; the reference defines no Okapi parameters, so the
canonical defaults k1=1.2, b=0.75 are engine constants, explicit in config):

    score(d) = sum over query terms t of
        qtf(t) * idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )       [Lucene variant,
                                                            always positive]

Reference TF-IDF (``InvertedIndexManager.searchTfIdf:578-645`` +
``InvertedIndex.searchTfIdf:1052-1085``):

    idf(t)   = log10(N / df(t) + 1)        # +1 OUTSIDE the division — the
                                           # Java-precedence quirk at :611
    w_q(t)   = idf(t) * qtf(t)
    dot(d)   = sum_t tf(t,d)*idf(t) * w_q(t)
    len2(d)  = sum_t (tf(t,d)*idf(t))^2
    score(d) = dot(d) / sqrt(len2(d))      # cosine vs doc only; query
                                           # vector deliberately unnormalized

Plan shape for both: broadcast the tiny (term, qtf, idf) frame into the
postings scan (Catalyst pushes ``term IN (...)`` to parquet when postings are
read from the artifact), per-row partial score, ONE shuffle on doc_id for the
sum, then a distributed TakeOrdered (``orderBy().limit(k)``). Ties break on
doc_id ascending for deterministic rank identity.

Query-term df comes from the term_stats table restricted to the (few) query
terms — the Spark analogue of the reference's pass-1 ``accumulateKeywordsTf``
(``InvertedIndex.java:1096-1103``).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _empty_scores(index) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id string, score double")


def _query_weights(index, query, idf_fn) -> list[tuple[str, int, float]]:
    """[(term, qtf, idf)] for analyzed query terms with df > 0."""
    terms = index.analyze_query(query)
    if not terms:
        return []
    qtf = Counter(terms)
    stats = index.query_term_stats(list(qtf))
    out = []
    for term, count in sorted(qtf.items()):
        df = stats[term][0]
        if df > 0:
            out.append((term, count, idf_fn(index.n_docs, df)))
    return out


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def _bm25_partial(index):
    """The per-posting BM25 partial Column — qtf·idf·tf·(k1+1)/norm over
    columns (qtf, idf, tf, dl). ONE definition shared by the scorer, the
    batch scorer, the boolean scorer, and explain_bm25 so their floats
    stay bit-identical (explain's sum-equals-score contract and the
    pure-should ≡ plain-BM25 pin both depend on the exact expression
    tree)."""
    k1, b = float(index.k1), float(index.b)
    avgdl = float(index.avgdl) or 1.0
    tf = F.col("tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    return F.col("qtf") * F.col("idf") * tf * (k1 + 1.0) / norm


def tfidf_idf(n_docs: int, df: int) -> float:
    # log10(N/df + 1): the +1 lands outside the division (Java precedence,
    # InvertedIndexManager.java:611)
    return math.log10(n_docs / df + 1.0)


def salted_topk_per_query(
    df: DataFrame,
    k: int,
    order_cols: list,
    salt_key: str,
    spark,
    query_col: str = "query_id",
) -> DataFrame:
    """EXACT per-query top-k as a salted two-phase cut. ``order_cols``
    must be a TOTAL order over rows within a query (include a unique
    tie-break column, e.g. doc_id asc); ``salt_key`` is any row-unique
    column (name or Column — e.g. a struct of the tie-break columns) to
    salt on. Phase 1 cuts top-k per (query, salt) — a row with
    >= k better-ordered rows in its OWN salt cannot reach the global
    top-k — and phase 2 re-cuts the <= n_salts*k survivors. A single
    window partitioned by the query column alone caps the cut at |Q|
    tasks regardless of cluster size (measured as a dominant non-scaling
    term of batch ranking at 1.1M turns); salt count tracks shuffle
    parallelism and never affects the result."""
    from pyspark.sql import Window

    n_salts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")), 16
    )
    w1 = Window.partitionBy(query_col, "_salt").orderBy(*order_cols)
    cand = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(salt_key), F.lit(n_salts))
        )
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w = Window.partitionBy(query_col).orderBy(*order_cols)
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def search_bm25(
    index, query, k: int | None = None, allowed: DataFrame | None = None
) -> DataFrame:
    """BM25 ranking; ``allowed`` (a doc_id frame, e.g. a filtered corpus
    metadata scan) restricts scoring to those docs. The semi-join lands on
    the postings BEFORE the per-doc shuffle, so filtered-out docs' postings
    never shuffle; IDF / avgdl stay corpus-global (standard filtered-search
    semantics — the filter narrows candidates, not the collection stats)."""
    weights = _query_weights(index, query, bm25_idf)
    return search_bm25_weighted(index, weights, k, allowed)


def search_bm25_weighted(
    index,
    weights: list,
    k: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 from explicit [(term, qtf, idf)] weights — the shared scoring
    core of search_bm25 and the query-expansion operators (PRF builds
    weights for ALREADY-ANALYZED expansion tokens; re-running the analyzer
    on them would double-stem under Porter)."""
    if not weights or k == 0:
        return _empty_scores(index)
    qdf = index.spark.createDataFrame(weights, "term string, qtf int, idf double")
    partial = _bm25_partial(index)
    # Deterministic per-doc summation: fold partials in sorted-term order so
    # scores are bit-identical across partitionings and to the oracle
    # (float addition is order-sensitive; SURVEY.md §7.3). Query terms are
    # few, so collect_list here is O(|q|) per doc. array_distinct drops the
    # identical twin partials a doc_id duplicated across segments would
    # contribute (identity for normal corpora — no bit-identity impact).
    post = index.postings_for_terms([t for t, _, _ in weights], positional=False)
    if allowed is not None:
        post = post.join(allowed.select("doc_id"), "doc_id", "left_semi")
    scored = (
        post.join(F.broadcast(qdf), "term")
        .select("doc_id", F.struct("term", partial.alias("partial")).alias("p"))
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.array_distinct(F.collect_list("p"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("score")
        )
    )
    scored = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.limit(k) if k is not None else scored


def _batch_query_weights(index, queries: dict, idf_fn) -> dict:
    """{query_id: [(term, qtf, idf)]} with ONE term-stats lookup for the
    union of all query vocabularies (a per-query lookup would cost one
    driver-side Spark job per query — the exact overhead batching exists
    to amortize)."""
    analyzed = {
        qid: Counter(index.analyze_query(text)) for qid, text in queries.items()
    }
    union_terms = sorted({t for c in analyzed.values() for t in c})
    stats = index.query_term_stats(union_terms) if union_terms else {}
    out = {}
    for qid, qtf in analyzed.items():
        rows = []
        for term, count in sorted(qtf.items()):
            df = stats[term][0]
            if df > 0:
                rows.append((term, count, idf_fn(index.n_docs, df)))
        out[qid] = rows
    return out


def search_bm25_batch(index, queries, k: int | None = None) -> DataFrame:
    """Score MANY queries in ONE postings scan: (query_id, doc_id, score)
    with per-query top-k, rank- and bit-identical to running
    ``search_bm25`` per query.

    ``queries`` is ``{query_id: query_text}`` (a plain list is auto-keyed
    ``q0..qN``). Plan shape: one broadcast frame of (query_id, term, qtf,
    idf) joined into a SINGLE ``postings_for_terms`` scan over the union of
    all query terms, partials aggregated per (query_id, doc_id) with the
    same sorted-term fold as the single-query path (bit-identity
    invariant), then one window top-k cut per query_id.

    This is the workload-scale form: per-query jobs pay the scan + shuffle
    setup Q times, while the batch pays it once — on a cluster reading a
    100 TB postings artifact the scan dominates, so Q queries cost ~1
    query. Works on both backends: the logical index scans its postings
    frame once; the artifact index decodes only blocks of the union term
    set (term filter pushed below the decode barrier via
    ``postings_for_terms``)."""
    if not isinstance(queries, dict):
        queries = {f"q{i}": q for i, q in enumerate(queries)}
    empty = index.spark.createDataFrame(
        [], "query_id string, doc_id string, score double"
    )
    if not queries or k == 0:
        return empty
    if len(queries) == 1:
        # a 1-query "workload" has nothing to amortize — delegate to the
        # per-query path, which on the artifact backend keeps block-max
        # WAND pruning (the batch plan scans the union exhaustively)
        ((qid, text),) = queries.items()
        return index.search_bm25(text, k).select(
            F.lit(qid).alias("query_id"), "doc_id", "score"
        )
    weights = _batch_query_weights(index, queries, bm25_idf)
    rows = [
        (qid, term, qtf, idf)
        for qid, ws in sorted(weights.items())
        for (term, qtf, idf) in ws
    ]
    if not rows:
        return empty
    qdf = index.spark.createDataFrame(
        rows, "query_id string, term string, qtf int, idf double"
    )
    union_terms = sorted({t for _, t, _, _ in rows})
    partial = _bm25_partial(index)

    def _fold_score(key_col: str, dedup: bool = True):
        # per-doc partials summed in sorted-term order (bit-identity
        # invariant; see search_bm25_weighted). ``dedup=False`` for the
        # ordinal flow: (doc_ord, term) is unique by construction (a
        # doc_id duplicated across segments gets DISTINCT ordinals), so
        # array_distinct is provably identity there — skip its per-group
        # hash pass. The doc_id flow keeps it: cross-segment duplicate
        # doc_ids would contribute identical twin partials.
        def fold(df):
            lst = F.collect_list("p")
            if dedup:
                lst = F.array_distinct(lst)
            return (
                df.select(
                    "query_id",
                    key_col,
                    F.struct("term", partial.alias("partial")).alias("p"),
                )
                .groupBy("query_id", key_col)
                .agg(
                    F.aggregate(
                        F.array_sort(lst),
                        F.lit(0.0),
                        lambda acc, x: acc + x["partial"],
                    ).alias("score")
                )
            )

        return fold

    from pyspark.sql import Window

    # Salt count tracks shuffle parallelism; it affects only the plan,
    # never the result. (A single window partitioned by query_id capped
    # the top-k cut at |Q| tasks — measured as a dominant non-scaling
    # term of the batch at 1.1M turns.)
    n_salts = max(
        int(index.spark.conf.get("spark.sql.shuffle.partitions", "200")), 16
    )

    ords_fn = getattr(index, "postings_for_terms_ords", None)
    if ords_fn is not None and k is not None:
        # ORDINAL-space flow (artifact backend): aggregate and cut in
        # doc_ord space, hydrate doc_id only for the survivors. Joining
        # the corpus-sized doc table under every posting BEFORE the cut
        # would shuffle it once per batch — the same rule the WAND path
        # enforces ("the corpus-sized doc table is only consulted AFTER
        # the top-k cut"). Phase 1 cuts per (query_id, salt) by RANK on
        # score alone: rank(D) > k means >= k docs in D's own salt score
        # STRICTLY higher, so D cannot reach the global top-k under any
        # tie-break — and keeping boundary ties (rank, not row_number)
        # means no doc that could win the final (score, doc_id) ordering
        # is lost before doc_id exists. Phase 2 hydrates the tiny
        # survivor set (broadcast against the streamed doc scan — no doc
        # shuffle) and applies the exact final cut.
        # Scoring keeps TWO exchanges by measurement, not oversight: a
        # single-exchange variant (salt computed pre-agg, one repartition
        # on (query_id, _salt) serving both the aggregate and the phase-1
        # window) read 15% SLOWER at 5.5M turns / local[8] (20.5 s vs
        # 17.6 s per batch, session-17 A/B in BENCH.md) — the groupBy
        # exchange hashes on (query_id, doc_ord) (millions of uniform
        # keys), and Spark 4 plants a PARTIAL WindowGroupLimit above the
        # second exchange so only per-map-partition top-k survivors of
        # the (already aggregated, much smaller) scored frame re-shuffle;
        # the clustering variant instead ships every posting row into
        # |Q| x n_salts coarse buckets. A 16x-salt variant read worse
        # still (the survivor set grows with n_salts).
        scored = _fold_score("doc_ord", dedup=False)(
            ords_fn(union_terms, spread=True).join(F.broadcast(qdf), "term")
        )
        w1 = Window.partitionBy("query_id", "_salt").orderBy(F.desc("score"))
        cand = (
            scored.withColumn(
                "_salt", F.pmod(F.xxhash64("doc_ord"), F.lit(n_salts))
            )
            .withColumn("_rk", F.rank().over(w1))
            .where(F.col("_rk") <= k)
            .drop("_rk", "_salt")
        )
        hyd = (
            index.doc_ids_for_ordinals_df(cand)
            .select("query_id", "doc_id", "score")
            # the survivor set is <= |Q| * k * n_salts rows — collapse to
            # ONE partition so the twin-ordinal reduction, the final
            # per-query window, AND the result orderBy all pipeline in a
            # single task with no further exchange (a single partition
            # satisfies every downstream distribution requirement,
            # including the sort's — no range-boundary sampling job)
            .repartition(1)
            # a doc_id duplicated across segments is two ordinals; in the
            # engine the twin rows carry the SAME score (the doc_id flow
            # merges identical per-term partials via array_distinct), but
            # on a degenerate append-without-upsert corpus the twins can
            # differ — reduce by MAX so the kept row is deterministic
            # rather than whichever ordinal dropDuplicates saw first
            .groupBy("query_id", "doc_id")
            .agg(F.max("score").alias("score"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            hyd.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
            .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
        )

    # doc_id flow: logical index (postings carry doc_id natively — there
    # is no doc join to avoid), or k=None full rankings
    scored = _fold_score("doc_id")(
        index.postings_for_terms(union_terms, positional=False, spread=True)
        .join(F.broadcast(qdf), "term")
    )
    if k is None:
        return scored.orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    # exact: doc_id is present, so (score desc, doc_id asc) is a total
    # order within each query
    return salted_topk_per_query(
        scored, k, [F.desc("score"), F.asc("doc_id")], "doc_id", index.spark
    ).orderBy("query_id", F.desc("score"), F.asc("doc_id"))


def search_bm25_boolean(
    index,
    must: list | None = None,
    should: list | None = None,
    must_not: list | None = None,
    k: int | None = None,
    min_should_match: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Lucene ``BooleanQuery`` with BM25 scoring: a document matches iff
    it contains ALL ``must`` terms, NO ``must_not`` term, and — when
    ``must`` is empty — at least one ``should`` term (Lucene's
    minimum-should-match=1 rule for pure-should queries). The score sums
    the BM25 partials of the present must+should terms; must_not terms
    filter only, never score.

    Each clause entry runs through the analyzer chain (a multi-token
    entry contributes all its tokens to that clause). A term appearing
    in both a scoring clause and ``must_not`` is contradictory and
    raises. Unknown-vocabulary must terms (df = 0) can never be
    satisfied, so the result is empty — Lucene semantics, unlike the
    flat ``search_and`` which ignores them.

    Plan: ONE postings scan over the union vocabulary + ONE doc_id
    shuffle; clause membership travels in the broadcast weights frame,
    presence checks are conditional counts in the same aggregate, and
    the score fold is the exact sorted-term fold of
    ``search_bm25_weighted`` (pure-should queries are bit-identical to
    ``search_bm25``, pinned by test).

    ``min_should_match`` (ES/Lucene msm, term-level: entries analyze to
    tokens first, so a multi-token entry contributes each token as its
    own should "clause") additionally requires that many DISTINCT
    should terms present; ``None`` keeps the default rule (1 for
    pure-should — emergent, since a doc must match some scoring term to
    appear at all — and 0 when ``must`` exists). A value above the
    analyzed should-vocabulary size is unsatisfiable and returns empty.
    """
    def _an(clause):
        out = []
        for entry in clause or []:
            out.extend(index.analyze_query(entry))
        return out

    m_terms, s_terms, n_terms = _an(must), _an(should), _an(must_not)
    scoring = set(m_terms) | set(s_terms)
    contra = scoring & set(n_terms)
    if contra:
        raise ValueError(f"terms in both scoring and must_not: {sorted(contra)}")
    if not scoring:
        return _empty_scores(index)
    qtf = Counter(m_terms + s_terms)
    stats = index.query_term_stats(sorted(scoring | set(n_terms)))
    if any(stats[t][0] == 0 for t in set(m_terms)):
        return _empty_scores(index)  # unsatisfiable must clause
    msm = int(min_should_match) if min_should_match is not None else 0
    if msm > len(set(s_terms)):
        return _empty_scores(index)  # unsatisfiable should threshold
    n_must = len(set(m_terms))
    rows = []
    for term in sorted(scoring | set(n_terms)):
        df = stats[term][0]
        if df == 0:
            continue  # absent everywhere: can't score, can't veto
        rows.append((
            term,
            int(qtf.get(term, 0)),
            bm25_idf(index.n_docs, df) if term in scoring else 0.0,
            term in set(m_terms),
            term in set(n_terms),
            term in set(s_terms),
        ))
    if not rows:
        return _empty_scores(index)
    qdf = index.spark.createDataFrame(
        rows,
        "term string, qtf int, idf double, is_must boolean, is_not boolean, "
        "is_should boolean",
    )
    partial = _bm25_partial(index)
    post = index.postings_for_terms([r[0] for r in rows], positional=False)
    if allowed is not None:
        # doc-level restriction (filter context): lands on the postings
        # BEFORE the per-doc aggregate, so clause presence counts and the
        # veto are evaluated over allowed docs only; collection stats stay
        # corpus-global (same restriction semantics as search_bm25)
        post = post.join(allowed.select("doc_id"), "doc_id", "left_semi")
    # _mh counts DISTINCT must terms seen (a doc_id duplicated across
    # segments contributes duplicate posting rows — the same case the
    # array_distinct in the score fold tolerates); docs surviving
    # _nh == 0 necessarily have a scoring-term row, so pure-should
    # presence needs no extra aggregate
    grouped = (
        post.join(F.broadcast(qdf), "term")
        .select(
            "doc_id",
            "is_not",
            F.when(F.col("is_must"), F.col("term")).alias("mt"),
            F.when(F.col("is_should"), F.col("term")).alias("st"),
            F.when(F.col("qtf") > 0,
                   F.struct("term", partial.alias("partial"))).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.array_distinct(F.collect_list("p"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("score"),
            F.size(F.array_distinct(F.collect_list("mt"))).alias("_mh"),
            F.size(F.array_distinct(F.collect_list("st"))).alias("_sh"),
            F.max(F.when(F.col("is_not"), 1).otherwise(0)).alias("_nh"),
        )
    )
    keep = (
        (F.col("_mh") == n_must)
        & (F.col("_nh") == 0)
        & (F.col("_sh") >= msm)
    )
    scored = (
        grouped.where(keep)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored


def explain_bm25(index, query, doc_ids: list) -> DataFrame:
    """Lucene-``explain``-style score breakdown: one row per (document,
    matched query term) with every input to the BM25 partial —
    ``(doc_id, term, tf, dl, qtf, df, idf_r, partial_r)``, ordered by
    (doc_id, term). The partial expression is the exact one
    ``search_bm25_weighted`` folds, so ``sum(partial)`` per doc equals the
    search score (pre-rounding differences only from the rounding here).

    ``doc_ids`` is a caller-provided result set (typically the top-k ids
    under inspection), so the ``isin`` point filter stays k-bounded — the
    same ordinal-point-lookup cost class as hydration, never a corpus
    scan. Terms the index has never seen (df = 0) produce no rows, same
    as search.
    """
    if not doc_ids:
        raise ValueError("doc_ids must be non-empty")
    terms = index.analyze_query(query)
    qtf = Counter(terms)
    stats = index.query_term_stats(list(qtf)) if terms else {}
    rows = [
        (t, c, stats[t][0], bm25_idf(index.n_docs, stats[t][0]))
        for t, c in sorted(qtf.items())
        if stats[t][0] > 0
    ]
    if not rows:
        return index.spark.createDataFrame(
            [],
            "doc_id string, term string, tf long, dl long, qtf int, "
            "df long, idf_r double, partial_r double",
        )
    qdf = index.spark.createDataFrame(
        rows, "term string, qtf int, df long, idf double"
    )
    partial = _bm25_partial(index)
    post = index.postings_for_terms([r[0] for r in rows], positional=False)
    return (
        post.where(F.col("doc_id").isin(list(doc_ids)))
        .join(F.broadcast(qdf), "term")
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            "qtf",
            "df",
            F.round("idf", 6).alias("idf_r"),
            F.round(partial, 6).alias("partial_r"),
        )
        .orderBy("doc_id", "term")
    )


def search_tfidf(index, query, k: int | None = None) -> DataFrame:
    weights = _query_weights(index, query, tfidf_idf)
    if not weights or k == 0:
        return _empty_scores(index)
    qdf = index.spark.createDataFrame(weights, "term string, qtf int, idf double")
    tfidf = F.col("tf").cast("double") * F.col("idf")
    # same deterministic sorted fold as BM25, accumulating (dot, len2)
    scored = (
        index.postings_for_terms([t for t, _, _ in weights], positional=False)
        .join(F.broadcast(qdf), "term")
        .select(
            "doc_id",
            F.struct(
                "term",
                (tfidf * F.col("idf") * F.col("qtf")).alias("dot_p"),
                (tfidf * tfidf).alias("len_p"),
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.array_distinct(F.collect_list("p"))),
                F.struct(F.lit(0.0).alias("d"), F.lit(0.0).alias("l")),
                lambda acc, x: F.struct(
                    (acc["d"] + x["dot_p"]).alias("d"),
                    (acc["l"] + x["len_p"]).alias("l"),
                ),
            ).alias("acc")
        )
        .select(
            "doc_id",
            (F.col("acc.d") / F.sqrt(F.col("acc.l"))).alias("score"),
        )
    )
    scored = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.limit(k) if k is not None else scored


def search_bm25_after(
    index,
    query: str,
    k: int,
    cursor: tuple[float, object] | None = None,
    decimals: int = 4,
    id_cast: str | None = None,
) -> DataFrame:
    """Deterministic cursor pagination (Elasticsearch ``search_after``):
    the next ``k`` results strictly after ``cursor = (score_r, doc_id)``
    in the engine's total result order — rounded score descending, doc_id
    ascending. ``cursor=None`` is page 1; feed the last returned row back
    as the cursor for the next page. Returns (doc_id, score_r).

    Rounding to ``decimals`` BEFORE the order is what makes the cursor
    stable across engines and partitionings (raw-float cursors would
    split rounded ties differently than they display). The cursor is a
    WHERE predicate, not an OFFSET: page N costs one top-k cut over the
    predicate-filtered scored set — no materialization of pages 1..N-1,
    which is what keeps deep paging O(k) per page at corpus scale.

    ``id_cast`` (e.g. ``"long"``) casts doc_id for the tie-break AND the
    cursor comparison — numeric ids paginated as strings would order
    '10' < '2' and silently skip/duplicate rows across pages (the same
    hazard query/hybrid.py's id_cast exists for)."""
    did = F.col("doc_id").cast(id_cast) if id_cast else F.col("doc_id")
    scored = search_bm25(index, query, None).select(
        did.alias("doc_id"), F.round("score", decimals).alias("score_r")
    )
    if cursor is not None:
        cs, cid = float(cursor[0]), cursor[1]
        scored = scored.where(
            (F.col("score_r") < cs)
            | ((F.col("score_r") == cs) & (F.col("doc_id") > F.lit(cid)))
        )
    return scored.orderBy(F.desc("score_r"), F.asc("doc_id")).limit(k)


def search_bm25_recency(
    index,
    meta: DataFrame,
    query: str,
    now_es: int,
    half_life_s: float,
    k: int | None = None,
    ts_col: str = "ts",
    decimals: int = 4,
) -> DataFrame:
    """Recency-decayed BM25: ``score' = bm25 · 0.5^((now−ts)/half_life)``
    — exponential time decay over a (doc_id, timestamp) metadata frame,
    the freshness-aware ranking a transcript search surface needs (recent
    turns matter more than stale ones at equal relevance).

    ``now_es`` is an explicit epoch-seconds literal, never wall-clock —
    determinism (and the DuckDB twin) require the caller to pin "now".
    The decay multiplies the raw score BEFORE the rounded top-k cut, so
    it genuinely re-ranks (a post-cut decay could only reorder the k).

    Plan: the stock BM25 plan, then ONE doc_id equi-join against the
    metadata frame — scored rows are only the term-matched docs, and at
    10^12 turns a doc_id-bucketed metadata table co-locates the join.
    Returns ``(doc_id, score_r, age_s)``.
    """
    scored = search_bm25(index, query, None)
    m = meta.select("doc_id", F.col(ts_col).cast("long").alias("_es"))
    age_s = F.lit(int(now_es)) - F.col("_es")
    decayed = F.col("score") * F.pow(
        F.lit(0.5), age_s.cast("double") / F.lit(float(half_life_s))
    )
    out = scored.join(m, "doc_id").select(
        "doc_id",
        F.round(decayed, decimals).alias("score_r"),
        age_s.cast("long").alias("age_s"),
    )
    if k is None:
        return out
    return out.orderBy(F.desc("score_r"), F.asc("doc_id")).limit(k)


def decay_columns(
    x, origin: float, scale: float, offset: float, decay: float, kind: str
):
    """(distance, multiplier) Columns for the ES decay family over a
    numeric column ``x`` — the arithmetic core shared by
    ``search_bm25_decay`` and the query-DSL ``function_score`` node."""
    if kind not in ("gauss", "exp", "linear"):
        raise ValueError(f"unknown decay kind {kind!r}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    d = F.greatest(
        F.abs(x - F.lit(float(origin))) - F.lit(float(offset)), F.lit(0.0)
    )
    if kind == "gauss":
        sigma2 = -(float(scale) ** 2) / (2.0 * math.log(decay))
        mult = F.exp(-(d * d) / F.lit(2.0 * sigma2))
    elif kind == "exp":
        lam = math.log(decay) / float(scale)
        mult = F.exp(F.lit(lam) * d)
    else:  # linear
        s = float(scale) / (1.0 - decay)
        mult = F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))
    return d, mult


def search_bm25_boosting(
    index,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int | None = None,
) -> DataFrame:
    """Boosting query (Elasticsearch ``boosting``): rank by BM25 over the
    ``positive`` query, but DEMOTE — not exclude — docs that also match
    the ``negative`` query, multiplying their score by ``negative_boost``
    in [0, 1)::

        score(d) = bm25_positive(d) * (negative_boost if d matches any
                                       negative term else 1)

    The soft companion of ``search_bm25_boolean``'s hard ``must_not``
    veto ("about pythons the snake, probably not python the language").

    Plan: ONE postings scan over the union vocabulary — negative terms
    ride along with qtf=0/idf=0 rows (they flag, never score) — and ONE
    doc_id shuffle; the score fold is the exact sorted-term fold of
    ``search_bm25_weighted`` restricted to positive partials, so
    ``negative_boost`` semantics never perturb bit-identity of the
    positive score."""
    if not 0.0 <= negative_boost < 1.0:
        raise ValueError(
            f"negative_boost must be in [0, 1), got {negative_boost}"
        )
    p_terms = index.analyze_query(positive)
    n_terms = set(index.analyze_query(negative))  # may overlap positive:
    # the negative query is evaluated independently (ES semantics), so a
    # shared term both scores AND flags the demotion
    if not p_terms:
        return _empty_scores(index)
    qtf = Counter(p_terms)
    stats = index.query_term_stats(sorted(set(p_terms) | n_terms))
    rows = []
    for term in sorted(set(p_terms) | n_terms):
        df = stats[term][0]
        if df == 0:
            continue
        is_pos = term in qtf
        rows.append((
            term,
            int(qtf.get(term, 0)),
            bm25_idf(index.n_docs, df) if is_pos else 0.0,
            term in n_terms,
        ))
    if not any(r[1] > 0 for r in rows):
        return _empty_scores(index)
    qdf = index.spark.createDataFrame(
        rows, "term string, qtf int, idf double, is_neg boolean"
    )
    partial = _bm25_partial(index)
    post = index.postings_for_terms([r[0] for r in rows], positional=False)
    grouped = (
        post.join(F.broadcast(qdf), "term")
        .select(
            "doc_id",
            "is_neg",
            F.when(
                F.col("qtf") > 0,
                F.struct("term", partial.alias("partial")),
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.array_distinct(F.collect_list("p"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("score"),
            F.max(F.when(F.col("is_neg"), 1).otherwise(0)).alias("_neg"),
        )
    )
    scored = (
        grouped.where(F.col("score").isNotNull() & (F.col("score") > 0.0))
        .select(
            "doc_id",
            (
                F.col("score")
                * F.when(F.col("_neg") == 1, F.lit(float(negative_boost)))
                .otherwise(F.lit(1.0))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return scored.limit(k) if k is not None else scored


def search_bm25_decay(
    index,
    meta: DataFrame,
    query: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "gauss",
    k: int | None = None,
    value_col: str = "ts",
    decimals: int = 4,
) -> DataFrame:
    """Function-score decay (the Elasticsearch ``function_score`` decay
    family, generalizing ``search_bm25_recency``'s one-sided exponential):
    multiply BM25 by a decay of the doc's distance from ``origin`` over a
    numeric/epoch metadata column. With ``d = max(0, |x - origin| -
    offset)``, the multiplier at distance ``scale`` is exactly ``decay``:

      - ``gauss``:  exp(-d^2 / (2 sigma^2)),  sigma^2 = -scale^2 / (2 ln decay)
      - ``exp``:    exp(ln(decay) / scale * d)
      - ``linear``: max(0, (s - d) / s),      s = scale / (1 - decay)

    Returns ``(doc_id, score_r, dist)``; decay applies BEFORE the top-k
    cut (it genuinely re-ranks). Plan: the stock BM25 plan plus ONE
    doc_id equi-join against the metadata frame — scored rows are only
    the term-matched docs (same shape as ``search_bm25_recency``)."""
    scored = search_bm25(index, query, None)
    m = meta.select(
        "doc_id", F.col(value_col).cast("double").alias("_x")
    )
    d, mult = decay_columns(F.col("_x"), origin, scale, offset, decay, kind)
    out = scored.join(m, "doc_id").select(
        "doc_id",
        F.round(F.col("score") * mult, decimals).alias("score_r"),
        F.round(d, 6).alias("dist"),
    )
    if k is None:
        return out
    return out.orderBy(F.desc("score_r"), F.asc("doc_id")).limit(k)
