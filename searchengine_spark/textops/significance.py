"""Significant-terms and trending-terms corpus analytics.

Two aggregation surfaces a curation pipeline runs over an indexed corpus
that the reference engine's term-stats surface (Q8) cannot answer:

- ``significant_terms_by_group``: for each group (a metadata slice such
  as ``source`` or ``role``, or a query-match indicator), the terms whose
  document frequency inside the group is most surprising against the rest
  of the corpus, scored by Dunning's log-likelihood ratio G²
  (Dunning 1993, "Accurate Methods for the Statistics of Surprise and
  Coincidence") — the same statistic behind Elasticsearch's
  ``significant_terms`` aggregation. Only over-represented terms are
  returned (foreground rate > background rate), mirroring ES semantics.
- ``trending_terms``: token-instance burst detection across a timestamp
  split — terms whose smoothed usage RATE after ``split_ts`` most exceeds
  their rate before it (log rate ratio with additive smoothing).

Scale shape (both): tokenization stays a zero-shuffle projection on the
caller's side; the only corpus-sized shuffle is ONE fully map-side
combinable count aggregate keyed on (group, term) / term. Everything
after operates on vocabulary-bounded frames: term totals are a second
aggregate OVER THE PERSISTED COUNTS (no second corpus pass), group sizes
are a tiny aggregate joined back by broadcast, and scalar totals come
from O(1) driver collects off the persisted frames (the collocations.py
convention — never a 1-row crossJoin, which would plan as
BroadcastNestedLoop). The per-group top-k cut is a window over the
vocabulary-sized scored frame ordered on the ROUNDED score with a term
tie-break, so the cut is engine-independent (the snippets.py idiom).

G² determinism: scores are computed in one fixed expression shape
(cell-by-cell ``O·ln(O/E)`` sum, zero cells contributing exactly 0) and
rounded to 6dp before any ordering, so Spark and the DuckDB oracle agree
bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _g2_cell(o, e):
    """One G² cell: O·ln(O/E), defined as 0 when O = 0 (standard limit).
    E is 0 only when its row or column total is 0, which forces O = 0."""
    return F.when(o > 0, o.cast("double") * F.log(o.cast("double") / e)).otherwise(
        F.lit(0.0)
    )


def significant_terms_by_group(
    df: DataFrame,
    group_col: str = "group",
    tokens_col: str = "tokens",
    top_n: int = 10,
    min_fg_df: int = 3,
) -> DataFrame:
    """Per-group significant terms by Dunning G² over document frequency.

    Input: one row per document with a ``group_col`` label and an analyzed
    ``tokens_col`` array. Output: ``(group, term, fg_df, bg_df, g2_r)`` —
    at most ``top_n`` rows per group, over-represented terms only
    (fg rate > bg rate, compared in exact integer math), ordered by
    (group asc, g2_r desc, term asc).

    The 2×2 contingency table per (group, term): k11 = docs in group with
    term (``fg_df``), k12 = docs elsewhere with term (``bg_df``),
    k21/k22 the complements; G² = 2·Σ O·ln(O/E). A corpus with a single
    group has an empty background, so every term fails the direction
    filter and the result is empty (documented, not an error). Group
    labels must be non-null strings (they travel through a collected
    literal frame).
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    g = F.col(group_col)
    # ONE corpus-sized combinable aggregate: per-(group, term) doc counts.
    gt = (
        df.select(g.alias("group"),
                  F.explode(F.array_distinct(F.col(tokens_col))).alias("term"))
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .persist()
    )
    # Vocabulary-bounded second aggregate off the persisted counts.
    tot = gt.groupBy("term").agg(F.sum("fg_df").alias("df_all"))
    # group sizes: one combinable aggregate, tiny result, collected once —
    # n_docs comes free off the same rows (no third corpus pass)
    gn_rows = (
        df.groupBy(g.alias("group")).agg(F.count(F.lit(1)).alias("n_g")).collect()
    )
    n_docs = int(sum(r["n_g"] for r in gn_rows))
    gn = df.sparkSession.createDataFrame(
        [(r["group"], int(r["n_g"])) for r in gn_rows], "group string, n_g long"
    )

    k11 = F.col("fg_df").cast("double")
    k12 = (F.col("df_all") - F.col("fg_df")).cast("double")
    k21 = (F.col("n_g") - F.col("fg_df")).cast("double")
    k22 = (F.lit(n_docs) - F.col("n_g") - k12).cast("double")
    row1, row2 = k11 + k12, k21 + k22
    col1, col2 = k11 + k21, k12 + k22  # = n_g, N - n_g
    n = F.lit(float(n_docs))
    g2 = 2.0 * (
        _g2_cell(k11, row1 * col1 / n)
        + _g2_cell(k12, row1 * col2 / n)
        + _g2_cell(k21, row2 * col1 / n)
        + _g2_cell(k22, row2 * col2 / n)
    )
    scored = (
        gt.where(F.col("fg_df") >= min_fg_df)
        .join(tot, "term")                      # vocab-sized equi-join
        .join(F.broadcast(gn), "group")         # tiny per-group sizes
        # over-represented only; exact integer cross-multiply, no division
        .where(
            F.col("fg_df") * (F.lit(n_docs) - F.col("n_g"))
            > (F.col("df_all") - F.col("fg_df")) * F.col("n_g")
        )
        .select(
            "group",
            "term",
            "fg_df",
            (F.col("df_all") - F.col("fg_df")).alias("bg_df"),
            F.round(g2, 6).alias("g2_r"),
        )
    )
    w = Window.partitionBy("group").orderBy(F.desc("g2_r"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .drop("rn")
        .orderBy("group", F.desc("g2_r"), "term")
    )


def significant_terms_for_query(
    df: DataFrame,
    query_terms: list[str],
    tokens_col: str = "tokens",
    top_n: int = 10,
    min_fg_df: int = 3,
    exclude_query: bool = True,
) -> DataFrame:
    """Significant terms of a query's match set (ES "aggregations on
    search results"): foreground = documents containing ANY query term,
    background = the rest. Returns ``(term, fg_df, bg_df, g2_r)``; the
    query terms themselves are dropped by default (they trivially have
    fg rate 1 and would crowd out the associated vocabulary).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    fg = F.arrays_overlap(
        F.col(tokens_col), F.lit(sorted(set(query_terms)))
    )
    out = significant_terms_by_group(
        df.select(
            F.when(fg, F.lit("match")).otherwise(F.lit("rest")).alias("group"),
            F.col(tokens_col),
        ),
        group_col="group",
        tokens_col=tokens_col,
        top_n=top_n + (len(set(query_terms)) if exclude_query else 0),
        min_fg_df=min_fg_df,
    ).where(F.col("group") == "match")
    if exclude_query:
        out = out.where(~F.col("term").isin(list(set(query_terms))))
    w = Window.orderBy(F.desc("g2_r"), F.asc("term"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select("term", "fg_df", "bg_df", "g2_r")
        .orderBy(F.desc("g2_r"), "term")
    )


def significant_terms_for_search(
    index,
    query: str,
    top_n: int = 10,
    min_fg_df: int = 3,
    exclude_query: bool = True,
) -> DataFrame:
    """Index-backed significant terms of a search's match set — the
    "aggregations on search results" form that scales with the MATCH SET,
    not the corpus: the match ids come from the term-filtered postings
    scan (``postings_for_terms`` pushes the term filter below the artifact
    decode barrier), only the matched documents' text is re-analyzed (one
    pushed-down corpus semi-join), and the background document frequencies
    come verbatim from the index's precomputed ``term_stats`` table — no
    corpus-wide tokenization pass at all.

    Same statistic, direction filter, rounding, and (g2_r desc, term)
    ordering as ``significant_terms_for_query``; on an index whose stats
    are fresh (no pending tombstones) the two are bit-identical, which is
    pinned by test. After deletes the stats stay stale until compaction
    (the engine's documented reference-parity semantics), and this
    operator inherits that surface.

    Requires ``index.corpus`` (attach_corpus) for the match-set text.
    Returns ``(term, fg_df, bg_df, g2_r)``.
    """
    from ..analysis.analyzer import make_analyze_udf

    if index.corpus is None:
        raise ValueError("significant_terms_for_search needs index.corpus "
                         "(call attach_corpus)")
    q_terms = index.analyze_query(query)
    if not q_terms:
        raise ValueError(f"query analyzes to no terms: {query!r}")
    # postings frames always carry the id as "doc_id"; a corpus attached
    # under another name is renamed on ITS side (the hydrate pattern)
    match = (
        index.postings_for_terms(q_terms, positional=False)
        .select("doc_id")
        .distinct()
        .persist()
    )
    n_g = int(match.count())
    n_docs = int(index.n_docs)
    analyze = make_analyze_udf(index.analyzer)
    corpus = index.corpus
    if index.doc_id_col != "doc_id":
        corpus = corpus.withColumnRenamed(index.doc_id_col, "doc_id")
    fg = (
        corpus.join(match, "doc_id", "left_semi")
        .select(analyze(F.col(index.text_col)).alias("toks"))
        .select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
    )
    k11 = F.col("fg_df").cast("double")
    k12 = (F.col("df_all") - F.col("fg_df")).cast("double")
    k21 = (F.lit(n_g) - F.col("fg_df")).cast("double")
    k22 = (F.lit(n_docs) - F.lit(n_g) - k12).cast("double")
    row1, row2 = k11 + k12, k21 + k22
    col1, col2 = k11 + k21, k12 + k22
    n = F.lit(float(n_docs))
    g2 = 2.0 * (
        _g2_cell(k11, row1 * col1 / n)
        + _g2_cell(k12, row1 * col2 / n)
        + _g2_cell(k21, row2 * col1 / n)
        + _g2_cell(k22, row2 * col2 / n)
    )
    scored = (
        fg.where(F.col("fg_df") >= min_fg_df)
        .join(index.term_stats.select("term", F.col("df").alias("df_all")),
              "term")
        .where(
            F.col("fg_df") * F.lit(n_docs - n_g)
            > (F.col("df_all") - F.col("fg_df")) * F.lit(n_g)
        )
        .select(
            "term",
            "fg_df",
            (F.col("df_all") - F.col("fg_df")).alias("bg_df"),
            F.round(g2, 6).alias("g2_r"),
        )
    )
    if exclude_query:
        scored = scored.where(~F.col("term").isin(list(set(q_terms))))
    return scored.orderBy(F.desc("g2_r"), "term").limit(top_n)


def trending_terms(
    df: DataFrame,
    split_ts,
    tokens_col: str = "tokens",
    ts_col: str = "ts",
    alpha: float = 0.5,
    min_after: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Bursty terms across a timestamp split: token-INSTANCE rates before
    vs after ``split_ts`` (after = ``ts >= split_ts``), scored by the
    smoothed log rate ratio::

        trend = ln( ((c_after + α) / (t_after + α))
                  / ((c_before + α) / (t_before + α)) )

    with t_* the total token instances in each window (additive smoothing
    keeps new terms and empty windows finite). Returns
    ``(term, c_before, c_after, trend_r)``, ``c_after >= min_after``,
    top ``top_n`` by (trend_r desc, term asc).

    ONE corpus-sized combinable aggregate (term-keyed conditional sums);
    window totals are an O(1) driver collect off the persisted counts.
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    after = (F.col(ts_col) >= F.lit(split_ts)).alias("after")
    cnt = (
        # NULL timestamps are unplaceable (the >= comparison is NULL, which
        # would otherwise silently land in 'before') — excluded up front
        df.where(F.col(ts_col).isNotNull())
        .select(after, F.explode(F.col(tokens_col)).alias("term"))
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("after"), 1).otherwise(0)).alias("c_after"),
            F.sum(F.when(F.col("after"), 0).otherwise(1)).alias("c_before"),
        )
        .persist()
    )
    tots = cnt.agg(F.sum("c_after"), F.sum("c_before")).collect()[0]
    t_after = float(tots[0] or 0.0)
    t_before = float(tots[1] or 0.0)
    trend = F.log(
        ((F.col("c_after") + F.lit(alpha)) / F.lit(t_after + alpha))
        / ((F.col("c_before") + F.lit(alpha)) / F.lit(t_before + alpha))
    )
    return (
        cnt.where(F.col("c_after") >= min_after)
        .select(
            "term",
            "c_before",
            "c_after",
            F.round(trend, 6).alias("trend_r"),
        )
        .orderBy(F.desc("trend_r"), "term")
        .limit(top_n)
    )
