"""significant_terms / trending_terms: hand-computed differential tests
against independent pure-python implementations, determinism of the
top-k cuts, and plan assertions (no nested-loop joins)."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops.significance import (
    significant_terms_by_group,
    significant_terms_for_query,
    trending_terms,
)


def _py_g2(k11, k12, k21, k22):
    """Independent G² implementation (plain loop over the 2×2 table)."""
    n = k11 + k12 + k21 + k22
    rows = (k11 + k12, k21 + k22)
    cols = (k11 + k21, k12 + k22)
    total = 0.0
    for o, r, c in (
        (k11, rows[0], cols[0]),
        (k12, rows[0], cols[1]),
        (k21, rows[1], cols[0]),
        (k22, rows[1], cols[1]),
    ):
        if o > 0:
            total += o * math.log(o / (r * c / n))
    return 2.0 * total


def _py_sig_terms(docs, top_n=10, min_fg_df=1):
    """Independent reference: docs = list of (group, tokens)."""
    from collections import Counter, defaultdict

    n_g = Counter(g for g, _ in docs)
    n = len(docs)
    fg = defaultdict(Counter)
    for g, toks in docs:
        for t in set(toks):
            fg[g][t] += 1
    df_all = Counter()
    for g in fg:
        df_all.update(fg[g])
    out = []
    for g in sorted(fg):
        scored = []
        for t, k11 in fg[g].items():
            if k11 < min_fg_df:
                continue
            k12 = df_all[t] - k11
            if not k11 * (n - n_g[g]) > k12 * n_g[g]:
                continue
            g2 = round(_py_g2(k11, k12, n_g[g] - k11, (n - n_g[g]) - k12), 6)
            scored.append((g, t, k11, k12, g2))
        scored.sort(key=lambda r: (-r[4], r[1]))
        out.extend(scored[:top_n])
    return out


CORPUS = [
    ("news", ["election", "vote", "city", "report"]),
    ("news", ["election", "city", "mayor"]),
    ("news", ["vote", "mayor", "report", "city"]),
    ("news", ["election", "storm"]),
    ("sports", ["game", "score", "city", "team"]),
    ("sports", ["game", "team", "coach"]),
    ("sports", ["score", "team", "report"]),
    ("forum", ["game", "election", "city", "report", "offtopic"]),
]


def _corpus_df(spark):
    return spark.createDataFrame(
        [(g, toks) for g, toks in CORPUS], "group string, tokens array<string>"
    )


def test_sig_terms_matches_pure_python(spark):
    got = [
        (r.group, r.term, r.fg_df, r.bg_df, r.g2_r)
        for r in significant_terms_by_group(
            _corpus_df(spark), top_n=3, min_fg_df=2
        ).collect()
    ]
    want = _py_sig_terms(CORPUS, top_n=3, min_fg_df=2)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    assert [g[4] for g in got] == pytest.approx([w[4] for w in want], abs=1e-9)
    # sanity on content: group-characteristic vocabulary surfaces
    by_group = {g: [] for g, *_ in got}
    for g, t, *_ in got:
        by_group[g].append(t)
    assert "election" in by_group["news"]
    assert "team" in by_group["sports"]


def test_sig_terms_direction_filter_drops_underrepresented(spark):
    # "city" appears in 3/4 news docs, 1/3 sports docs, 1/1 forum docs:
    # it is UNDER-represented in sports and must not appear there.
    res = significant_terms_by_group(_corpus_df(spark), top_n=10, min_fg_df=1)
    sports = [r.term for r in res.collect() if r.group == "sports"]
    assert "city" not in sports


def test_sig_terms_single_group_is_empty(spark):
    df = spark.createDataFrame(
        [("only", ["a", "b"]), ("only", ["a"])],
        "group string, tokens array<string>",
    )
    assert significant_terms_by_group(df, min_fg_df=1).count() == 0


def test_sig_terms_tie_break_is_term_asc(spark):
    # two terms with identical contingency tables -> identical g2_r;
    # the top-1 cut must pick the lexicographically smaller term
    df = spark.createDataFrame(
        [
            ("a", ["zed", "ant"]),
            ("a", ["zed", "ant"]),
            ("b", ["other"]),
            ("b", ["other"]),
        ],
        "group string, tokens array<string>",
    )
    res = significant_terms_by_group(df, top_n=1, min_fg_df=1).collect()
    got_a = [r.term for r in res if r.group == "a"]
    assert got_a == ["ant"]


def test_sig_terms_for_query_excludes_query_terms(spark):
    df = _corpus_df(spark).select("tokens")
    res = significant_terms_for_query(df, ["election"], top_n=5, min_fg_df=1)
    terms = [r.term for r in res.collect()]
    assert "election" not in terms
    # docs containing "election" are 3 news + 1 forum; "city" rides along
    assert "city" in terms
    kept = significant_terms_for_query(
        df, ["election"], top_n=5, min_fg_df=1, exclude_query=False
    )
    assert "election" in [r.term for r in kept.collect()]


def test_sig_terms_for_query_rejects_empty(spark):
    with pytest.raises(ValueError):
        significant_terms_for_query(_corpus_df(spark), [])
    with pytest.raises(ValueError):
        significant_terms_by_group(_corpus_df(spark), top_n=0)


TS = [
    # (ts, tokens) — split at 2024-01-10
    (datetime(2024, 1, 1), ["steady", "steady", "old", "old", "old"]),
    (datetime(2024, 1, 5), ["steady", "old", "rare"]),
    (datetime(2024, 1, 15), ["steady", "steady", "burst", "burst", "burst"]),
    (datetime(2024, 1, 20), ["steady", "burst", "burst", "new", "new", "new"]),
]
SPLIT = datetime(2024, 1, 10)


def _py_trending(rows, split, alpha=0.5, min_after=1, top_n=20):
    from collections import Counter

    before, after = Counter(), Counter()
    for ts, toks in rows:
        (after if ts >= split else before).update(toks)
    tb, ta = sum(before.values()), sum(after.values())
    out = []
    for t in set(before) | set(after):
        ca = after[t]
        if ca < min_after:
            continue
        trend = math.log(
            ((ca + alpha) / (ta + alpha)) / ((before[t] + alpha) / (tb + alpha))
        )
        out.append((t, before[t], ca, round(trend, 6)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:top_n]


def test_trending_matches_pure_python(spark):
    df = spark.createDataFrame(
        TS, "ts timestamp, tokens array<string>"
    )
    got = [
        (r.term, r.c_before, r.c_after, r.trend_r)
        for r in trending_terms(df, SPLIT, min_after=1).collect()
    ]
    want = _py_trending(TS, SPLIT, min_after=1)
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert [g[3] for g in got] == pytest.approx([w[3] for w in want], abs=1e-9)
    # burst semantics: rising terms rank above the steady one, and a
    # before-only term has no after-instances so the floor drops it
    order = [t for t, *_ in got]
    assert order.index("new") < order.index("steady")
    assert order.index("burst") < order.index("steady")
    assert "old" not in order


def test_trending_min_after_floor(spark):
    df = spark.createDataFrame(TS, "ts timestamp, tokens array<string>")
    terms = [r.term for r in trending_terms(df, SPLIT, min_after=2).collect()]
    assert "rare" not in terms and "old" not in terms  # 0 after-instances
    assert "new" in terms and "burst" in terms


def test_trending_empty_before_window_is_finite(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 2, 1), ["x", "x", "y"])], "ts timestamp, tokens array<string>"
    )
    rows = trending_terms(df, SPLIT, min_after=1).collect()
    assert rows and all(math.isfinite(r.trend_r) for r in rows)


SEARCH_DOCS = [
    ("d1", "The database index rebuild failed with a timeout error."),
    ("d2", "Index rebuild finished; the optimizer chose a merge join."),
    ("d3", "Timeout error in the network layer, retrying the request."),
    ("d4", "The optimizer rewrote the query plan after the index hint."),
    ("d5", "Garden party on Sunday, bring lemonade and cakes."),
    ("d6", "The lemonade stand sold cakes near the garden gate."),
    ("d7", "Index corruption detected; rebuild scheduled with the optimizer."),
    ("d8", "Merge join fallback after the hash join spilled to disk."),
]


def _sig_search_expected(spark, idx_corpus, query_terms):
    """Token-based twin: the corpus re-analyzed with the same chain."""
    from searchengine_spark.analysis.analyzer import make_analyze_udf

    toks = idx_corpus.select(
        make_analyze_udf()(F.col("text")).alias("tokens")
    )
    return significant_terms_for_query(
        toks, query_terms, top_n=5, min_fg_df=1
    ).collect()


def test_sig_terms_for_search_matches_token_variant(spark):
    """Index-backed (postings match set + precomputed term_stats) is
    bit-identical to the corpus-tokenizing variant on a fresh index."""
    from searchengine_spark.index import build_index
    from searchengine_spark.textops.significance import (
        significant_terms_for_search,
    )

    docs = spark.createDataFrame(SEARCH_DOCS, "doc_id string, text string")
    idx = build_index(spark, docs, cache=False)
    idx.attach_corpus(docs)
    got = significant_terms_for_search(
        idx, "index rebuild", top_n=5, min_fg_df=1
    ).collect()
    want = _sig_search_expected(spark, docs, idx.analyze_query("index rebuild"))
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    terms = [r.term for r in got]
    # query terms excluded; match-set vocabulary surfaces, not garden talk
    assert "index" not in terms and "rebuild" not in terms
    assert "optim" in terms  # stemmed "optimizer" rides with the match set
    assert "lemonad" not in terms


def test_sig_terms_for_search_artifact_parity(spark, tmp_path):
    from searchengine_spark.index.artifact import build_artifact
    from searchengine_spark.textops.significance import (
        significant_terms_for_search,
    )

    docs = spark.createDataFrame(SEARCH_DOCS, "doc_id string, text string")
    aidx = build_artifact(spark, docs, str(tmp_path / "sigx"))
    aidx.attach_corpus(docs)
    got = significant_terms_for_search(
        aidx, "index rebuild", top_n=5, min_fg_df=1
    ).collect()
    want = _sig_search_expected(spark, docs, aidx.analyze_query("index rebuild"))
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sig_terms_for_search_requires_corpus_and_terms(spark):
    from searchengine_spark.index import build_index
    from searchengine_spark.textops.significance import (
        significant_terms_for_search,
    )

    docs = spark.createDataFrame(SEARCH_DOCS, "doc_id string, text string")
    idx = build_index(spark, docs, cache=False)
    idx.corpus = None  # build_index attaches it by default
    with pytest.raises(ValueError, match="corpus"):
        significant_terms_for_search(idx, "index")
    idx.attach_corpus(docs)
    with pytest.raises(ValueError, match="no terms"):
        significant_terms_for_search(idx, "the of and")


def test_significance_plans_have_no_nested_loops(spark):
    df = _corpus_df(spark)
    tdf = spark.createDataFrame(TS, "ts timestamp, tokens array<string>")
    plans = {
        "by_group": significant_terms_by_group(df, min_fg_df=1),
        "for_query": significant_terms_for_query(df, ["election"], min_fg_df=1),
        "trending": trending_terms(tdf, SPLIT, min_after=1),
    }
    for name, out in plans.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_sig_terms_for_search_nondefault_doc_id_col(spark):
    """Regression: index/corpus attached under a non-default doc_id_col
    must not crash (the postings frame always carries 'doc_id')."""
    from searchengine_spark.index import build_index
    from searchengine_spark.textops.significance import (
        significant_terms_for_search,
    )

    docs = spark.createDataFrame(
        [(k, t) for k, t in SEARCH_DOCS], "turn_key string, text string"
    )
    idx = build_index(spark, docs, doc_id_col="turn_key", cache=False)
    got = significant_terms_for_search(
        idx, "index rebuild", top_n=5, min_fg_df=1
    ).collect()
    default = spark.createDataFrame(SEARCH_DOCS, "doc_id string, text string")
    didx = build_index(spark, default, cache=False)
    want = significant_terms_for_search(
        didx, "index rebuild", top_n=5, min_fg_df=1
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_trending_null_ts_rows_are_excluded(spark):
    from searchengine_spark.textops.significance import trending_terms

    rows = TS + [(None, ["steady", "steady", "steady", "steady"])]
    df = spark.createDataFrame(rows, "ts timestamp, tokens array<string>")
    with_null = [
        (r.term, r.c_before, r.c_after)
        for r in trending_terms(df, SPLIT, min_after=1).collect()
    ]
    clean = [
        (r.term, r.c_before, r.c_after)
        for r in trending_terms(
            spark.createDataFrame(TS, "ts timestamp, tokens array<string>"),
            SPLIT, min_after=1,
        ).collect()
    ]
    assert with_null == clean  # NULL-ts tokens never counted anywhere
