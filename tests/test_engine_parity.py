"""Spark engine vs pure-Python oracle: rank-identity on the reference query
set over the deterministic synthetic transcripts corpus (FIXTURES.md §2-3).

This is the engine's FullScanSearcher-style correctness gate: boolean and
phrase results must be set-identical; ranked results must be rank-identical
(ties broken by doc_id) with bit-equal scores (both sides sum partial scores
in sorted-term order).
"""

import pytest

from searchengine_spark.fixtures import QUERY_SET, doc_key
from searchengine_spark.index import build_index
from searchengine_spark.oracle import OracleIndex


@pytest.fixture(scope="module")
def built(spark, small_corpus):
    index = build_index(spark, small_corpus)
    docs = {
        r["doc_id"]: r["text"]
        for r in small_corpus.select("doc_id", "text").collect()
    }
    oracle = OracleIndex(docs)
    return index, oracle, docs


def _ranked_rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize(
    "q", [q for q in QUERY_SET if q["kind"] in ("keyword", "and", "or", "phrase")],
    ids=lambda q: f"q{q['query_id']}-{q['kind']}",
)
def test_boolean_and_phrase_parity(built, q):
    index, oracle, _ = built
    kind, text = q["kind"], q["query_text"]
    if kind == "keyword":
        got = {r["doc_id"] for r in index.search_keyword(text).collect()}
        want = oracle.search_and(text)
    elif kind == "and":
        got = {r["doc_id"] for r in index.search_and(text).collect()}
        want = oracle.search_and(text)
    elif kind == "or":
        got = {r["doc_id"] for r in index.search_or(text).collect()}
        want = oracle.search_or(text)
    else:
        got = {r["doc_id"] for r in index.search_phrase(text).collect()}
        want = oracle.search_phrase(text)
    assert got == want
    if q["query_id"] in (3, 7, 9):  # planted markers must actually hit
        assert want, f"fixture regression: no hits for {text!r}"


@pytest.mark.parametrize(
    "q", [q for q in QUERY_SET if q["kind"] in ("bm25", "tfidf")],
    ids=lambda q: f"q{q['query_id']}-{q['kind']}",
)
def test_ranked_parity(built, q):
    index, oracle, _ = built
    k, text = q["k"], q["query_text"]
    if q["kind"] == "bm25":
        got = _ranked_rows(index.search_bm25(text, k))
        want = oracle.search_bm25(text, k)
    else:
        got = _ranked_rows(index.search_tfidf(text, k))
        want = oracle.search_tfidf(text, k)
    assert len(got) == len(want)
    for rank, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"rank {rank}: {gd} != {wd} (got {gs}, want {ws})"
        assert gs == pytest.approx(ws, rel=0, abs=1e-12), f"rank {rank} score"


def test_marker_doc_positions(built):
    # zqmarkeralpha planted at conv_idx % 37 == 18, turn 1 (MARKERS)
    index, oracle, _ = built
    got = sorted(r["doc_id"] for r in index.search_keyword("zqmarkeralpha").collect())
    expected = sorted(doc_key(c, 1) for c in range(1000) if c % 37 == 18)
    assert got == expected


def test_hydration_text_equality(built, small_corpus):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the BASELINE input_hint invariant."""
    index, oracle, docs = built
    res = index.search_bm25("spark shuffle error", 10)
    hydrated = index.hydrate(res).orderBy("conv_id", "turn_idx").collect()
    assert len(hydrated) == 10
    for row in hydrated:
        assert row["text"] == docs[row["doc_id"]]
        assert row["doc_id"] == doc_key(row["conv_id"], row["turn_idx"])


def test_document_frequency(built):
    index, oracle, _ = built
    for term in ("function", "error", "zqmarkeralpha", "nonexistentterm"):
        assert index.document_frequency(term) == oracle.df(term)


def test_topk_none_returns_all_matches(built):
    # searchTfIdf(query, null) returns ALL matching docs
    # (InvertedIndexManager.java:602)
    index, oracle, _ = built
    got = _ranked_rows(index.search_tfidf("zqmarkerbeta"))
    want = oracle.search_tfidf("zqmarkerbeta")
    assert [d for d, _ in got] == [d for d, _ in want]


def test_analyzed_away_query_is_empty(built):
    index, _, _ = built
    assert index.search_and("the of and").count() == 0
    assert index.search_bm25("the of and", 5).count() == 0


def test_bm25_batch_bit_identical_to_per_query(built):
    """search_bm25_batch must return, per query_id, exactly the rows of the
    single-query path — same ranks, bit-equal scores — including degenerate
    members (stop-word-only, unknown-term) that contribute no rows."""
    index, _, _ = built
    queries = {
        f"q{q['query_id']}": q["query_text"]
        for q in QUERY_SET
        if q["kind"] == "bm25"
    }
    queries["q_stop"] = "the of and"
    queries["q_unk"] = "zzzznotaterm"
    k = 10
    batch = index.search_bm25_batch(queries, k).collect()
    by_qid: dict[str, list] = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    assert set(by_qid) <= set(queries)
    for qid, text in queries.items():
        want = _ranked_rows(index.search_bm25(text, k))
        got = by_qid.get(qid, [])
        assert got == want, f"{qid}: batch != per-query"
    assert by_qid.get("q_stop", []) == [] and by_qid.get("q_unk", []) == []
    # list form auto-keys q0..qN; k=0 and empty dict return empty frames
    lst = index.search_bm25_batch(["spark shuffle error"], 3).collect()
    assert [r["query_id"] for r in lst] == ["q0"] * 3
    assert index.search_bm25_batch({}, 5).count() == 0
    assert index.search_bm25_batch(queries, 0).count() == 0


# ---------------------------------------------------------------------------
# fuzzy (edit-distance-1) search
# ---------------------------------------------------------------------------


def test_fuzzy_terms_verify_rejects_distance_2_candidates(spark):
    """'ab' and 'ba' share deletion variants but sit at lev distance 2 —
    the candidate join must surface them and the verify must drop them."""
    from searchengine_spark.index import build_index
    from searchengine_spark.query.fuzzy import fuzzy_terms

    docs = spark.createDataFrame(
        [(1, "ab ab zq"), (2, "ba zq"), (3, "abx zq")],
        "doc_id long, text string",
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    got = {r["term"] for r in fuzzy_terms(idx, "ab").collect()}
    assert got == {"ab", "abx"}  # ba (lev 2) pruned by the verify


def test_search_fuzzy_counts_and_no_match(spark):
    import pytest as _pytest

    from searchengine_spark.index import build_index
    from searchengine_spark.query.fuzzy import search_fuzzy

    docs = spark.createDataFrame(
        [(1, "sort the part list"), (2, "sort only"), (3, "nothing here")],
        "doc_id long, text string",
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    out = {r["doc_id"]: r["n_fuzzy_terms"]
           for r in search_fuzzy(idx, "sart").collect()}
    assert out == {"1": 2, "2": 1}  # doc 1 has both sort and part
    assert search_fuzzy(idx, "qqqqq").count() == 0
    with _pytest.raises(ValueError, match="max_dist=1"):
        search_fuzzy(idx, "sart", max_dist=2)


def test_search_fuzzy_artifact_backend_parity(spark, tmp_path):
    from searchengine_spark.index import build_index
    from searchengine_spark.index.artifact import build_artifact
    from searchengine_spark.query.fuzzy import search_fuzzy

    docs = spark.createDataFrame(
        [(i, f"sort part w{i} filler") for i in range(30)]
        + [(99, "unrelated words only")],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    lidx = build_index(spark, docs, analyzer="punctuation", cache=False)
    aidx = build_artifact(
        spark, docs, str(tmp_path / "fz"), analyzer="punctuation"
    )
    l = sorted(tuple(r) for r in search_fuzzy(lidx, "sart").collect())
    a = sorted(tuple(r) for r in search_fuzzy(aidx, "sart").collect())
    assert l == a and len(l) == 30


def test_search_snippets_window_and_clipping(spark):
    from searchengine_spark.index import build_index
    from searchengine_spark.query.snippets import search_snippets

    docs = spark.createDataFrame(
        [
            (1, "needle alpha beta gamma delta epsilon zeta"),   # hit at 0
            (2, "alpha beta gamma needle delta epsilon zeta"),   # hit mid
            (3, "alpha beta gamma delta epsilon zeta eta"),      # no hit
        ],
        "doc_id long, text string",
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    out = {r.doc_id: r for r in search_snippets(idx, "needle", k=5, window=2).collect()}
    assert set(out) == {"1", "2"}
    assert out["1"].first_pos == 0
    assert out["1"].snippet == "needle alpha beta"  # clipped at doc start
    assert out["2"].first_pos == 3
    # window=2 around pos 3 -> positions [1, 5]
    assert out["2"].snippet == "beta gamma needle delta epsilon"
    assert search_snippets(idx, "zzznope", k=5).count() == 0
    assert search_snippets(idx, "the of and", k=5).count() == 0  # stop-only


def test_search_prefix_counts_cap_and_artifact_parity(spark, tmp_path):
    import pytest as _pytest

    from searchengine_spark.index import build_index
    from searchengine_spark.index.artifact import build_artifact
    from searchengine_spark.query.fuzzy import search_prefix

    docs = spark.createDataFrame(
        [(1, "spark sparkle spade zebra"), (2, "spark only"), (3, "zebra")],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    lidx = build_index(spark, docs, analyzer="punctuation", cache=False)
    out = {r.doc_id: r.n_prefix_terms for r in search_prefix(lidx, "spa").collect()}
    assert out == {"1": 3, "2": 1}
    assert search_prefix(lidx, "qqq").count() == 0
    with _pytest.raises(ValueError, match="maxClauseCount"):
        search_prefix(lidx, "s", max_terms=1)
    with _pytest.raises(ValueError, match="empty"):
        search_prefix(lidx, "")
    aidx = build_artifact(spark, docs, str(tmp_path / "pfx"), analyzer="punctuation")
    a = sorted(tuple(r) for r in search_prefix(aidx, "spa").collect())
    l = sorted(tuple(r) for r in search_prefix(lidx, "spa").collect())
    assert a == l


def test_bm25_corrected_matches_hand_corrected_query(spark):
    from searchengine_spark.index import build_index
    from searchengine_spark.query.fuzzy import (
        correct_query_terms,
        search_bm25_corrected,
    )

    docs = spark.createDataFrame(
        [(i, f"spark join hash filler{i} extra words here") for i in range(20)]
        + [(99, "join hash only")],
        "doc_id long, text string",
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    assert correct_query_terms(idx, "sprk joi hash zzzz") == [
        ("sprk", "spark"), ("joi", "join"), ("hash", "hash"), ("zzzz", "zzzz"),
    ]
    got = [tuple(r) for r in search_bm25_corrected(idx, "sprk joi hash", 5).collect()]
    want = [tuple(r) for r in idx.search_bm25("spark join hash", 5).collect()]
    assert got == want  # bit-identical: same terms after correction
    # df-desc tiebreak: 'hask' is lev-1 from both 'hash' (df 21) and 'task'
    docs2 = spark.createDataFrame(
        [(1, "hash hash task"), (2, "hash task"), (3, "hash")],
        "doc_id long, text string",
    )
    idx2 = build_index(spark, docs2, analyzer="punctuation", cache=False)
    assert correct_query_terms(idx2, "hask") == [("hask", "hash")]


def test_more_like_this_and_facets(spark):
    import pytest as _pytest

    from searchengine_spark.index import build_index
    from searchengine_spark.query.morelike import (
        facet_counts,
        mlt_terms,
        more_like_this,
    )

    docs = spark.createDataFrame(
        [
            (1, "zebra zebra zebra spark common common", "en"),
            (2, "zebra spark words common", "en"),
            (3, "zebra unrelated common", "de"),
            (4, "totally different things common", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    # doc 1's most distinctive term is zebra (tf 3, df 3) over spark (df 2):
    # selection is tf*idf ordered; 'common' (df 4) scores lowest idf
    sel = mlt_terms(idx, "1", n_terms=2)
    assert sel[0] == "zebra"
    res = [r["doc_id"] for r in more_like_this(idx, "1", n_terms=2, k=3).collect()]
    assert "1" not in res and "2" in res  # source excluded, near doc found
    with _pytest.raises(ValueError, match="not in corpus"):
        mlt_terms(idx, "999")

    fc = {r["lang"]: r["n_docs"] for r in facet_counts(idx, "zebra", "lang").collect()}
    assert fc == {"en": 2, "de": 1}


def test_query_surface_randomized_differential(spark):
    """Randomized corpus: fuzzy, prefix, and more-like-this term selection
    must match brute-force python ground truth computed from the same
    analyzed token streams (the search-surface analogue of the WAND
    randomized differential test)."""
    import math
    import random

    from searchengine_spark.index import build_index
    from searchengine_spark.query.fuzzy import search_fuzzy, search_prefix
    from searchengine_spark.query.morelike import mlt_terms

    rng = random.Random(20260818)
    vocab = ["".join(rng.choice("abcdef") for _ in range(rng.randint(3, 6)))
             for _ in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(spark, df, analyzer="punctuation", cache=False)

    toks = {str(i): t.split() for i, t in rows}

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[:], i
            for j, cb in enumerate(b, 1):
                m[j] = min(prev[j] + 1, m[j - 1] + 1, prev[j - 1] + (ca != cb))
        return m[-1]

    for probe in ("abc", "fed", "aaaa", vocab[0], vocab[7][:-1]):
        want = {
            (d, len({t for t in set(ts) if lev(t, probe) <= 1}))
            for d, ts in toks.items()
            if any(lev(t, probe) <= 1 for t in set(ts))
        }
        got = {tuple(r) for r in search_fuzzy(idx, probe).collect()}
        assert got == want, f"fuzzy({probe})"

    for prefix in ("a", "ab", "fe", "zz"):
        want = {
            (d, len({t for t in set(ts) if t.startswith(prefix)}))
            for d, ts in toks.items()
            if any(t.startswith(prefix) for t in set(ts))
        }
        got = {tuple(r) for r in search_prefix(idx, prefix).collect()}
        assert got == want, f"prefix({prefix})"

    n_docs = len(rows)
    df_count: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df_count[t] = df_count.get(t, 0) + 1
    for doc in ("0", "17", "63"):
        tf: dict[str, int] = {}
        for t in toks[doc]:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((round(c * math.log10(n_docs / df_count[t] + 1.0), 6), t)
             for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )
        assert mlt_terms(idx, doc, 5) == [t for _, t in scored[:5]], f"mlt({doc})"
