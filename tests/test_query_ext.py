"""Round-3 query-surface extensions: boolean query trees (NOT/parens),
unordered proximity search, metadata-filtered BM25, hybrid RRF fusion,
and PMI collocations — hand-computed semantics + backend parity."""

import math

import pytest

from searchengine_spark.index import build_index
from searchengine_spark.query import boolexpr as bx


# ---------------------------------------------------------------------------
# boolexpr: parser / analysis / grounding (pure driver-side)
# ---------------------------------------------------------------------------


def test_parse_precedence_not_and_or():
    # NOT binds tighter than AND, AND tighter than OR
    assert bx.parse("a OR b AND NOT c") == (
        "or",
        [("term", "a"), ("and", [("term", "b"), ("not", ("term", "c"))])],
    )
    assert bx.parse("(a OR b) AND c") == (
        "and",
        [("or", [("term", "a"), ("term", "b")]), ("term", "c")],
    )
    assert bx.parse("NOT NOT a") == ("not", ("not", ("term", "a")))


def test_parse_implicit_and():
    assert bx.parse("a b") == bx.parse("a AND b")
    assert bx.parse("a NOT b") == bx.parse("a AND NOT b")
    assert bx.parse("a (b OR c)") == bx.parse("a AND (b OR c)")


def test_parse_keywords_uppercase_only_and_errors():
    # Lucene convention: operators are UPPERCASE; lowercase and/or/not are
    # plain terms (implicit-AND adjacency), so stop-wordy natural queries
    # like "the of and" parse instead of erroring
    assert bx.parse("a and b") == (
        "and",
        [("term", "a"), ("term", "and"), ("term", "b")],
    )
    assert bx.parse("the of and") == (
        "and",
        [("term", "the"), ("term", "of"), ("term", "and")],
    )
    for bad in ["a AND", "(a OR b", "a )", "AND a", "", "NOT"]:
        with pytest.raises(bx.BoolQuerySyntaxError):
            bx.parse(bad)


def test_analyze_tree_drop_and_multi_token_semantics():
    def fake_analyze(tok):
        # 'the' is a stop word; 'multi-word' analyzes to two tokens
        return {"the": [], "multiword": ["multi", "word"]}.get(tok, [tok])

    # dropped leaf absorbs in AND and OR
    assert bx.analyze_tree(bx.parse("a AND the"), fake_analyze) == ("term", "a")
    assert bx.analyze_tree(bx.parse("a OR the"), fake_analyze) == ("term", "a")
    # NOT(drop) drops, and its parent absorbs
    assert bx.analyze_tree(bx.parse("a AND NOT the"), fake_analyze) == ("term", "a")
    # whole tree dropped
    assert bx.analyze_tree(bx.parse("the"), fake_analyze) is None
    # multi-token leaf -> implicit AND of sorted unique tokens
    assert bx.analyze_tree(bx.parse("multiword"), fake_analyze) == (
        "and",
        [("term", "multi"), ("term", "word")],
    )


def test_is_grounded():
    ident = lambda t: [t]  # noqa: E731
    for q, grounded in [
        ("a", True),
        ("NOT a", False),
        ("a AND NOT b", True),
        ("a OR NOT b", False),
        ("(a OR b) AND NOT (c OR d)", True),
        ("NOT (a AND b)", False),
        ("NOT NOT a", True),
    ]:
        tree = bx.analyze_tree(bx.parse(q), ident)
        assert bx.is_grounded(tree) == grounded, q


# ---------------------------------------------------------------------------
# search_boolean / search_near / filtered BM25 over a tiny index
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qx_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha delta"),
            (3, "beta delta"),
            (4, "gamma gamma alpha"),
            (5, "delta epsilon"),
            (6, "zeta filler words"),
        ],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    return build_index(spark, docs, analyzer="punctuation", cache=False)


def _ids(df):
    return sorted(int(r["doc_id"]) for r in df.collect())


def test_search_boolean_grounded(qx_index):
    assert _ids(qx_index.search_boolean("alpha AND beta")) == [1]
    assert _ids(qx_index.search_boolean("alpha OR beta")) == [1, 2, 3, 4]
    assert _ids(qx_index.search_boolean("alpha AND NOT beta")) == [2, 4]
    assert _ids(
        qx_index.search_boolean("(alpha OR delta) AND NOT (beta OR epsilon)")
    ) == [2, 4]
    # analyzed-away clause absorbs: 'the' is a stop word
    assert _ids(qx_index.search_boolean("alpha AND the")) == [1, 2, 4]
    # whole query analyzes away -> empty
    assert qx_index.search_boolean("the a an").count() == 0


def test_search_boolean_ungrounded_requires_universe(spark, qx_index):
    with pytest.raises(ValueError, match="universe"):
        qx_index.search_boolean("NOT alpha")
    universe = spark.createDataFrame(
        [(str(i),) for i in range(1, 7)], "doc_id string"
    )
    assert _ids(qx_index.search_boolean("NOT alpha", universe=universe)) == [3, 5, 6]
    # doc 6 has NO query term at all and still matches an ungrounded OR
    assert _ids(
        qx_index.search_boolean("alpha OR NOT beta", universe=universe)
    ) == [1, 2, 4, 5, 6]


def test_search_near_window_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta filler"),          # adjacent, span 1
            (2, "alpha filler beta"),          # span 2
            (3, "beta filler filler alpha"),   # reversed, span 3
            (4, "alpha filler filler filler beta"),  # span 4
            (5, "alpha only here"),            # missing beta
        ],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    assert _ids(idx.search_near("alpha beta", 1)) == [1]
    assert _ids(idx.search_near("alpha beta", 2)) == [1, 2]
    assert _ids(idx.search_near("alpha beta", 3)) == [1, 2, 3]  # order-free
    assert _ids(idx.search_near("alpha beta", 4)) == [1, 2, 3, 4]
    # single term: window irrelevant, any doc containing it
    assert _ids(idx.search_near("alpha", 0)) == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="window"):
        idx.search_near("alpha beta", -1)


def test_search_near_artifact_parity(spark, tmp_path):
    from searchengine_spark.index.artifact import build_artifact

    rows = [
        (i, f"alpha w{i} beta filler" if i % 3 else f"beta w{i} filler alpha")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    lidx = build_index(spark, docs, analyzer="punctuation", cache=False)
    aidx = build_artifact(spark, docs, str(tmp_path / "nx"), analyzer="punctuation")
    for w in (1, 2, 3):
        assert _ids(lidx.search_near("alpha beta", w)) == _ids(
            aidx.search_near("alpha beta", w)
        ), f"window {w}"
    assert _ids(lidx.search_boolean("alpha AND NOT w3")) == _ids(
        aidx.search_boolean("alpha AND NOT w3")
    )


def test_phrase_subset_of_near(qx_index):
    ph = _ids(qx_index.search_phrase("alpha beta"))
    nr = _ids(qx_index.search_near("alpha beta", 1))
    assert set(ph) <= set(nr)


def test_search_bm25_filtered_is_restriction(spark, qx_index):
    full = {
        r["doc_id"]: r["score"]
        for r in qx_index.search_bm25("alpha gamma", None).collect()
    }
    allowed = spark.createDataFrame([("1",), ("4",), ("5",)], "doc_id string")
    filt = {
        r["doc_id"]: r["score"]
        for r in qx_index.search_bm25_filtered("alpha gamma", allowed).collect()
    }
    # exactly the allowed ∩ matching docs, with UNCHANGED scores (corpus
    # stats stay global)
    assert set(filt) == {"1", "4"}
    for d, s in filt.items():
        assert s == full[d]


# ---------------------------------------------------------------------------
# hybrid RRF fusion
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_computed(spark):
    from searchengine_spark.query.hybrid import rrf_fuse

    a = spark.createDataFrame(
        [("d1", 9.0), ("d2", 5.0), ("d3", 1.0)], "doc_id string, score double"
    )
    b = spark.createDataFrame(
        [("d2", 0.9), ("d4", 0.8)], "doc_id string, score double"
    )
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse({"a": a, "b": b}, c=60).collect()}
    want = {
        "d1": 1 / 61,
        "d2": 1 / 62 + 1 / 61,
        "d3": 1 / 63,
        "d4": 1 / 62,
    }
    assert set(got) == set(want)
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=0, abs_tol=1e-15), d
    # d2 (in both lists) outranks everything
    top = rrf_fuse({"a": a, "b": b}, k=1).collect()[0]
    assert top["doc_id"] == "d2"


def test_rrf_rank_ties_broken_on_id(spark):
    from searchengine_spark.query.hybrid import rrf_fuse

    # equal rounded scores -> rank by id ascending
    a = spark.createDataFrame(
        [("x", 1.0), ("b", 1.0), ("a", 1.0)], "doc_id string, score double"
    )
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse({"l": a}).collect()}
    assert got["a"] > got["b"] > got["x"]


def test_hybrid_search_end_to_end(spark, qx_index):
    from searchengine_spark.query.hybrid import hybrid_search

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 7)],
        "vec_id long, embedding array<float>",
    )
    res = hybrid_search(
        qx_index, emb, "alpha beta", [1.0, 0.0], k=3, depth=4
    ).collect()
    assert len(res) == 3
    # ids stay in the index's (string) doc_id space
    assert all(isinstance(r["doc_id"], str) for r in res)
    # descending fused score
    scores = [r["rrf"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_new_query_ops_plans_no_nested_loop(spark, qx_index):
    """Plan assertion: every join in the new operators is an equi-join
    (hash/sort-merge) — no BroadcastNestedLoop, no CartesianProduct."""
    from searchengine_spark.query.hybrid import hybrid_search
    from searchengine_spark.textops.collocations import pmi_collocations

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 7)],
        "vec_id long, embedding array<float>",
    )
    toks = spark.createDataFrame(
        [(i, ["alpha", "beta", "gamma"]) for i in range(20)],
        "doc_id long, tokens array<string>",
    )
    allowed = spark.createDataFrame([("1",), ("4",)], "doc_id string")
    frames = {
        "boolexpr": qx_index.search_boolean("(alpha OR delta) AND NOT beta"),
        "near": qx_index.search_near("alpha beta", 2),
        "bm25_filtered": qx_index.search_bm25_filtered("alpha gamma", allowed),
        "hybrid": hybrid_search(qx_index, emb, "alpha beta", [1.0, 0.0], k=3),
        "colloc": pmi_collocations(toks, min_count=2, top_n=5),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_collocations_hand_computed(spark):
    from searchengine_spark.textops.collocations import pmi_collocations

    docs = spark.createDataFrame(
        [
            (1, ["new", "york", "filler"]),
            (2, ["new", "york", "city"]),
            (3, ["brand", "new", "day"]),
            (4, ["york", "new", "filler"]),
        ],
        "doc_id long, tokens array<string>",
    )
    out = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi_r"])
        for r in pmi_collocations(docs, min_count=2, top_n=None).collect()
    }
    # bigram instances: (new,york)x2, (york,filler), (york,city), (brand,new),
    # (new,day), (york,new), (new,filler) -> T2 = 8; tokens: T1 = 12
    # unigrams: new=4, york=3
    assert set(out) == {("new", "york")}
    cnt, pmi = out[("new", "york")]
    assert cnt == 2
    want = math.log((2 / 8) / ((4 / 12) * (3 / 12)))
    assert pmi == round(want, 6)


def test_conversation_stats_hand_computed(spark):
    from datetime import datetime

    from searchengine_spark.transcripts import conversation_stats

    rows = [
        ("c1", 0, "user", "hello there", "", datetime(2026, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "hi", "", datetime(2026, 1, 1, 0, 0, 30)),
        ("c1", 2, "tool", "", "grep", datetime(2026, 1, 1, 0, 1, 0)),
        ("c1", 3, "tool", "out", "grep", datetime(2026, 1, 1, 0, 2, 0)),
        ("c2", 0, "user", "solo", "", datetime(2026, 1, 2, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r["conv_id"]: r for r in conversation_stats(df).collect()}
    c1 = got["c1"]
    assert c1["n_turns"] == 4
    assert c1["n_assistant"] == 1
    assert c1["n_tool_calls"] == 2
    assert c1["n_distinct_tools"] == 1
    assert c1["duration_s"] == 120
    assert c1["n_tokens"] == 2 + 1 + 0 + 1  # empty text counts 0
    c2 = got["c2"]
    assert (c2["n_turns"], c2["duration_s"], c2["n_tokens"]) == (1, 0, 1)


# ---------------------------------------------------------------------------
# pseudo-relevance feedback
# ---------------------------------------------------------------------------


def test_prf_expands_vocabulary_mismatch(spark):
    from searchengine_spark.index import build_index

    # 'automobile' never co-occurs with the query term 'car' in doc 20,
    # but the feedback docs (1..3) tie them together
    docs = spark.createDataFrame(
        [
            (1, "car automobile engine"),
            (2, "car automobile wheel"),
            (3, "car automobile brake"),
            (20, "automobile polish detail"),   # no 'car' -> invisible to plain BM25
            (21, "banana bread recipe"),
        ],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    plain = {r["doc_id"] for r in idx.search_bm25("car", None).collect()}
    assert "20" not in plain
    prf = {r["doc_id"] for r in
           idx.search_bm25_prf("car", None, fb_docs=3, fb_terms=2).collect()}
    assert "20" in prf        # recovered via the 'automobile' expansion
    assert "21" not in prf    # unrelated doc still unreachable


def test_prf_expansion_terms_exclude_query_and_rank(spark):
    from searchengine_spark.index import build_index
    from searchengine_spark.query.feedback import prf_expansion_terms

    docs = spark.createDataFrame(
        [(1, "car engine engine wheel"), (2, "car engine brake")],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    got = prf_expansion_terms(idx, ["1", "2"], {"car"}, 2)
    # engine: tf 3 everywhere-df idf; brake/wheel: tf 1, rarer idf.
    # tfidf_idf(2, 2) = log10(2) vs tfidf_idf(2, 1) = log10(3):
    # engine 3*0.301 = 0.903 > brake/wheel 0.477 -> engine first, then
    # term-ASC tie between brake and wheel
    assert got == ["engine", "brake"]


def test_prf_degenerate_queries_fall_back(spark, qx_index):
    # stop-word-only query -> empty, like plain BM25
    assert qx_index.search_bm25_prf("the of and", 5).count() == 0
    # unknown term -> empty feedback set -> empty result (plain BM25 twin)
    assert qx_index.search_bm25_prf("qqqzzz", 5).count() == 0


# ---------------------------------------------------------------------------
# verbatim-span overlap
# ---------------------------------------------------------------------------


def test_span_shingles_and_pairs_hand_computed(spark):
    from searchengine_spark.textops.spans import (
        shared_span_pairs,
        span_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d", "e"]),      # shares the abc/bcd spans
            (2, ["a", "b", "c", "d", "x"]),      # with doc 1
            (3, ["z", "a", "b", "c", "d"]),      # shifted copy of the span
            (4, ["q", "r"]),                      # too short for k=3
            (5, ["m", "n", "o", "p", "q"]),      # no overlap
        ],
        "doc_id long, tokens array<string>",
    )
    sh = {(r["doc_id"], r["sh"]) for r in span_shingles(docs, k=3).collect()}
    assert (1, "a b c") in sh and (1, "c d e") in sh
    assert not any(d == 4 for d, _ in sh)  # < k tokens -> no shingles
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in shared_span_pairs(
            docs, k=3, max_shingle_df=10, min_shared=2
        ).collect()
    }
    # docs 1/2/3 all share 'a b c' and 'b c d' (2 shingles); 1-2 also do
    # NOT share more (d e vs d x); 5 shares nothing
    assert pairs == {(1, 2): 2, (1, 3): 2, (2, 3): 2}


def test_span_pairs_frequency_cap_drops_boilerplate(spark):
    from searchengine_spark.textops.spans import shared_span_pairs

    # the same 3-shingle in every doc: with max_shingle_df below the doc
    # count it must be dropped, leaving no pairs
    docs = spark.createDataFrame(
        [(i, ["x", "y", "z"]) for i in range(10)],
        "doc_id long, tokens array<string>",
    )
    assert (
        shared_span_pairs(docs, k=3, max_shingle_df=5, min_shared=1).count()
        == 0
    )
    # raising the cap re-admits them
    assert (
        shared_span_pairs(docs, k=3, max_shingle_df=10, min_shared=1).count()
        == 45
    )


def test_duplication_score_hand_computed(spark):
    from searchengine_spark.textops.spans import duplication_score

    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d"]),  # shingles: abc (shared), bcd
            (2, ["a", "b", "c"]),       # abc only -> fully duplicated
            (3, ["p", "q"]),            # too short
        ],
        "doc_id long, tokens array<string>",
    )
    got = {r["doc_id"]: r for r in duplication_score(docs, k=3).collect()}
    assert got[1]["n_shingles"] == 2 and got[1]["dup_frac"] == 0.5
    assert got[2]["n_shingles"] == 1 and got[2]["dup_frac"] == 1.0
    assert got[3]["n_shingles"] == 0 and got[3]["dup_frac"] is None


def test_pmi_min_count_floor(spark):
    from searchengine_spark.textops.collocations import pmi_collocations

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["c", "d"])],
        "doc_id long, tokens array<string>",
    )
    got = pmi_collocations(docs, min_count=2, top_n=None).collect()
    assert [(r["w1"], r["w2"]) for r in got] == [("a", "b")]


# --- transcript retrieval operators (transcripts.py) ----------------------


def _mini_transcripts(spark):
    """Three tiny conversations with a controlled vocabulary: 'zebra' is
    rare (idf-heavy), 'data' is common. Conv c1 has two zebra turns, c2
    one stronger one, c3 none."""
    rows = [
        ("c1", 0, "user", "zebra data", ""),
        ("c1", 1, "assistant", "data data", ""),
        ("c1", 2, "tool", "zebra data", "grep"),
        ("c2", 0, "user", "zebra zebra zebra", ""),
        ("c2", 1, "assistant", "data", ""),
        ("c3", 0, "user", "data data data", ""),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def _mini_index(spark, tr):
    from searchengine_spark.fixtures import doc_key_col

    corpus = tr.withColumn("doc_id", doc_key_col())
    return build_index(spark, corpus.select("doc_id", "text"), cache=False)


def test_conversation_search_maxp_hand_checked(spark):
    from searchengine_spark.transcripts import conversation_search

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    got = {r["conv_id"]: r for r in
           conversation_search(idx, "zebra", top_k=None).collect()}
    # only convs with a zebra turn appear
    assert set(got) == {"c1", "c2"}
    c1, c2 = got["c1"], got["c2"]
    # c1's two zebra turns have identical (dl=2, tf=1) scores -> rounded
    # tie -> best_turn is the LOWEST tying turn
    assert c1["best_turn"] == 0 and c1["n_hit_turns"] == 2
    # tf=3 in a dl=3 doc beats tf=1 in dl=2 (same idf) under BM25
    assert c2["score_r"] > c1["score_r"]
    assert c2["best_turn"] == 0 and c2["n_hit_turns"] == 1
    # sum of the two identical rounded turn scores, exactly
    assert c1["sum_score_r"] == round(2 * c1["score_r"], 4)
    # MaxP ordering: top_k=1 returns c2
    top1 = conversation_search(idx, "zebra", top_k=1).collect()
    assert [r["conv_id"] for r in top1] == ["c2"]


def test_search_with_context_window_and_edges(spark):
    from searchengine_spark.transcripts import search_with_context

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    out = search_with_context(idx, tr, "zebra", top_k=3, window=1).collect()
    assert [r["doc_id"] for r in out][0] == "c2:0000"  # strongest turn first
    by_id = {r["doc_id"]: r for r in out}
    # c1 turn 2 hit: window=1 pulls turns 1..2 (turn 3 doesn't exist)
    c1t2 = by_id["c1:0002"]
    assert c1t2["n_ctx_turns"] == 2
    assert c1t2["context"] == "[1] assistant: data data\n[2] tool: zebra data"
    # conversation-start edge: turn 0 hit has no preceding turn
    c2t0 = by_id["c2:0000"]
    assert c2t0["context"].startswith("[0] user: zebra zebra zebra")
    assert c2t0["n_ctx_turns"] == 2  # turns 0 and 1


def test_tool_transitions_hand_checked(spark):
    from searchengine_spark.transcripts import tool_transitions

    rows = [
        # c1: grep -> (non-tool turns skipped) -> editor -> grep
        ("c1", 0, "user", "x", ""),
        ("c1", 1, "tool", "x", "grep"),
        ("c1", 2, "assistant", "x", ""),
        ("c1", 3, "tool", "x", "editor"),
        ("c1", 4, "tool", "x", "grep"),
        # c2: grep only
        ("c2", 0, "tool", "x", "grep"),
        # c3: grep -> editor (same transition as nothing else)
        ("c3", 0, "tool", "x", "grep"),
        ("c3", 1, "tool", "x", "editor"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {(r["src_tool"], r["dst_tool"]): (r["n"], r["n_convs"])
           for r in tool_transitions(df).collect()}
    assert got == {
        ("<start>", "grep"): (3, 3),
        ("grep", "editor"): (2, 2),
        ("editor", "grep"): (1, 1),
    }


def test_recency_decay_reranks_and_math(spark):
    import math
    from datetime import datetime, timezone

    from searchengine_spark.query.ranked import search_bm25_recency

    # doc 1: stronger BM25 (tf=2) but 12h old; doc 2: weaker (tf=1, longer
    # dl) but fresh. With a 3h half-life the fresh doc must win.
    t0 = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
    t1 = datetime(2026, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    rows = [("1", "zebra zebra", t0), ("2", "zebra data data data", t1)]
    corpus = spark.createDataFrame(rows, "doc_id string, text string, ts timestamp")
    idx = build_index(spark, corpus.select("doc_id", "text"), cache=False)
    now_es = int(t1.timestamp())  # doc2 age 0, doc1 age 43200 s
    out = search_bm25_recency(
        idx, corpus.select("doc_id", "ts"), "zebra", now_es, 10800.0, 10
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got["1"]["age_s"] == 43200 and got["2"]["age_s"] == 0
    # replay the decay exactly: raw bm25 * 0.5^(age/half_life)
    raw = {r["doc_id"]: r["score"] for r in idx.search_bm25("zebra", None).collect()}
    for d in ("1", "2"):
        want = round(raw[d] * math.pow(0.5, got[d]["age_s"] / 10800.0), 4)
        assert got[d]["score_r"] == want
    # undecayed order has doc 1 first; decay flips it
    assert raw["1"] > raw["2"]
    ordered = [r["doc_id"] for r in out.collect()]
    assert ordered[0] == "2"


def test_suggest_terms_df_order_and_cap(spark):
    from searchengine_spark.query.fuzzy import suggest_terms

    rows = [
        ("1", "apple apricot banana"),
        ("2", "apple apricot"),
        ("3", "apple axe"),
        ("4", "apple"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    # punctuation analyzer: suggestions should be surface forms, not stems
    idx = build_index(spark, corpus, analyzer="punctuation", cache=False)
    got = [(r["term"], r["df"]) for r in suggest_terms(idx, "a", 3).collect()]
    # df: apple=4, apricot=2, axe=1 -> k=3 keeps all three in df-desc order
    assert got == [("apple", 4), ("apricot", 2), ("axe", 1)]
    got2 = [r["term"] for r in suggest_terms(idx, "ap", 1).collect()]
    assert got2 == ["apple"]
    with pytest.raises(ValueError):
        suggest_terms(idx, "", 3)


def test_transcript_ops_plans_no_nested_loop(spark):
    """Plan assertion for the transcript-retrieval operators: every join
    is an equi-join — no BroadcastNestedLoop, no CartesianProduct (the
    context window's |Δturn| bound must stay a residual on the conv_id
    hash join, never a join condition on its own)."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.fuzzy import suggest_terms
    from searchengine_spark.query.ranked import search_bm25_recency
    from searchengine_spark.transcripts import (
        conversation_search,
        search_with_context,
        tool_transitions,
    )

    tr = _mini_transcripts(spark).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    )
    idx = _mini_index(spark, tr)
    from searchengine_spark.fixtures import doc_key_col

    meta = tr.withColumn("doc_id", doc_key_col()).select("doc_id", "ts")
    frames = {
        "conv_search": conversation_search(idx, "zebra", 3),
        "context": search_with_context(idx, tr, "zebra", 3, 1),
        "tool_paths": tool_transitions(tr),
        "recency": search_bm25_recency(idx, meta, "zebra", 1767312000, 3600.0, 3),
        "suggest": suggest_terms(idx, "z", 3),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


# --- fielded query surface (query/fielded.py) ------------------------------


def test_parse_fielded():
    from searchengine_spark.query.fielded import parse_fielded

    free, filt = parse_fielded("spark error role:assistant tool:bash role:user")
    assert free == "spark error"
    assert filt == {"role": ["assistant", "user"], "tool": ["bash"]}
    # degenerate colon tokens stay free text; dup values collapse
    free, filt = parse_fielded("a: :b c role:x role:x")
    assert free == "a: :b c"
    assert filt == {"role": ["x"]}
    assert parse_fielded("plain words") == ("plain words", {})


def test_search_fielded_restriction_and_errors(spark):
    from searchengine_spark.query.fielded import search_fielded

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    from searchengine_spark.fixtures import doc_key_col

    meta = tr.withColumn("doc_id", doc_key_col()).select(
        "doc_id", "role", "tool"
    )
    full = {r["doc_id"]: r["score"]
            for r in idx.search_bm25("zebra", None).collect()}
    got = {r["doc_id"]: r["score"]
           for r in search_fielded(idx, meta, "zebra role:user", None).collect()}
    # only user-role turns match, with UNCHANGED scores (corpus-global stats)
    assert set(got) == {"c1:0000", "c2:0000"}
    for d, s in got.items():
        assert s == full[d]
    # same-field OR: user+tool roles
    got2 = search_fielded(idx, meta, "zebra role:user role:tool", None)
    assert {r["doc_id"] for r in got2.collect()} == {
        "c1:0000", "c1:0002", "c2:0000"
    }
    # no filters -> identical to plain BM25
    got3 = {r["doc_id"]: r["score"]
            for r in search_fielded(idx, meta, "zebra", None).collect()}
    assert got3 == full
    with pytest.raises(ValueError, match="free-text"):
        search_fielded(idx, meta, "role:user", None)
    with pytest.raises(ValueError, match="unknown filter field"):
        search_fielded(idx, meta, "zebra rol:user", None)


# --- BM25F field-weighted ranking (query/bm25f.py) --------------------------


_BM25F_ROWS = [
    ("d1", "title", "spark shuffle tuning guide"),
    ("d1", "body", "how to tune shuffle partitions in spark. shuffle is costly"),
    ("d2", "title", "cooking pasta"),
    ("d2", "body", "spark of flavor in the sauce; shuffle the deck"),
    ("d3", "body", "spark errors and shuffle spill, spark spark"),
    ("d3", "body", "second body fragment mentions shuffle once"),  # additive rows
]


def _bm25f_pyref(rows, query, weights, k1=1.2, b=0.75):
    """Independent pure-python BM25F (Robertson/Zaragoza simple form)."""
    from collections import Counter

    from searchengine_spark.analysis.analyzer import analyze

    docs = {}
    for d, f, t in rows:
        if f in weights:
            docs.setdefault(d, {}).setdefault(f, []).extend(analyze(t))
    dl = {(d, f): len(tk) for d, fs in docs.items() for f, tk in fs.items()}
    fields = {f for _, f in dl}
    avg = {
        f: sum(v for (d2, f2), v in dl.items() if f2 == f)
        / sum(1 for (d2, f2) in dl if f2 == f)
        for f in fields
    }
    n = len(docs)
    q = Counter(analyze(query))
    dfc = {
        t: sum(1 for fs in docs.values() if any(t in tk for tk in fs.values()))
        for t in q
    }
    out = {}
    for d, fs in docs.items():
        s = 0.0
        for t, qtf in sorted(q.items()):
            if not dfc[t]:
                continue
            idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
            wtf = 0.0
            for f in sorted(fs):
                tf = fs[f].count(t)
                if tf:
                    wtf += weights[f] * tf / (1 - b + b * dl[(d, f)] / avg[f])
            if wtf:
                s += qtf * idf * wtf / (k1 + wtf)
        if s:
            out[d] = s
    return out


def test_bm25f_matches_pure_python_reference(spark):
    from searchengine_spark.query.bm25f import search_bm25f

    df = spark.createDataFrame(_BM25F_ROWS, "doc_id string, field string, text string")
    w = {"title": 2.5, "body": 1.0}
    got = {r["doc_id"]: r["score"]
           for r in search_bm25f(spark, df, "spark shuffle", w).collect()}
    exp = _bm25f_pyref(_BM25F_ROWS, "spark shuffle", w)
    assert set(got) == set(exp) == {"d1", "d2", "d3"}
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-12)
    # title boost is live: d1 (title+body hits) outranks d2 (weak body hits)
    assert got["d1"] > got["d2"]


def test_bm25f_searched_fields_restrict_collection_stats(spark):
    from searchengine_spark.query.bm25f import search_bm25f

    df = spark.createDataFrame(_BM25F_ROWS, "doc_id string, field string, text string")
    # body-only search: d2's title-only pasta text is out of N/df/avgdl too
    got = {r["doc_id"]: r["score"]
           for r in search_bm25f(spark, df, "spark shuffle", {"body": 1.0}).collect()}
    exp = _bm25f_pyref(_BM25F_ROWS, "spark shuffle", {"body": 1.0})
    assert got == pytest.approx(exp)
    # raising a matched field's weight strictly raises the score (saturation
    # is monotone in the weighted pseudo-frequency)
    up = {r["doc_id"]: r["score"]
          for r in search_bm25f(spark, df, "spark shuffle", {"body": 3.0}).collect()}
    assert all(up[d] > got[d] for d in got)


def test_bm25f_single_field_rank_identical_to_bm25(spark):
    """With ONE searched field, BM25F reduces to idf*tf/(k1*B + tf) — plain
    BM25 without the (k1+1) numerator — so ranks are identical and scores
    differ by exactly (k1+1) (given qtf=1 per term)."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.bm25f import search_bm25f

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    from searchengine_spark.fixtures import doc_key_col

    fields = tr.withColumn("doc_id", doc_key_col()).select(
        "doc_id", F.lit("text").alias("field"), "text"
    )
    f1 = search_bm25f(spark, fields, "zebra data", {"text": 1.0}).collect()
    b1 = idx.search_bm25("zebra data", None).collect()
    assert [r["doc_id"] for r in f1] == [r["doc_id"] for r in b1]
    k1 = float(idx.k1)
    for rf, rb in zip(f1, b1):
        assert rf["score"] * (k1 + 1.0) == pytest.approx(rb["score"], rel=1e-12)


def test_bm25f_edge_cases(spark):
    from searchengine_spark.query.bm25f import search_bm25f

    df = spark.createDataFrame(_BM25F_ROWS, "doc_id string, field string, text string")
    w = {"title": 2.0, "body": 1.0}
    assert search_bm25f(spark, df, "the of and", w).count() == 0  # stop-only
    assert search_bm25f(spark, df, "xylophone", w).count() == 0  # unknown
    assert search_bm25f(spark, df, "spark", w, k=0).count() == 0
    assert search_bm25f(spark, df, "spark", w, k=2).count() == 2
    with pytest.raises(ValueError, match="at least one"):
        search_bm25f(spark, df, "spark", {})


# --- ordered sloppy phrase (query/phrase.py::search_phrase_slop) ------------


def test_phrase_slop_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "merge sort now"),                  # exact, gap 0
            (2, "merge quick brown sort"),          # ordered, gap 2
            (3, "merge x sort"),                    # ordered, gap 1
            (4, "sort then merge"),                 # REVERSED
            (5, "merge only"),                      # missing 'sort'
            (6, "merge x y z sort"),                # ordered, gap 3
        ],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    assert _ids(idx.search_phrase_slop("merge sort", 0)) == [1]
    assert _ids(idx.search_phrase_slop("merge sort", 1)) == [1, 3]
    assert _ids(idx.search_phrase_slop("merge sort", 2)) == [1, 2, 3]
    assert _ids(idx.search_phrase_slop("merge sort", 3)) == [1, 2, 3, 6]
    # order is enforced: doc 4 never matches ordered slop...
    assert 4 not in _ids(idx.search_phrase_slop("merge sort", 10))
    # ...but does match unordered NEAR at the same span
    assert 4 in _ids(idx.search_near("merge sort", 2))
    # single term: slop irrelevant
    assert _ids(idx.search_phrase_slop("merge", 0)) == [1, 2, 3, 4, 5, 6]
    with pytest.raises(ValueError, match="slop"):
        idx.search_phrase_slop("merge sort", -1)


def test_phrase_slop_zero_equals_exact_phrase(spark):
    # randomized-ish corpus over a tiny vocabulary; slop=0 must equal the
    # exact phrase operator on every doc, including duplicate-term phrases
    vocab = ["alpha", "beta", "gamma", "alpha"]
    rows = []
    n = 0
    for a in vocab:
        for b in vocab:
            for c in vocab:
                rows.append((n, f"{a} {b} {c}"))
                n += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    for phrase in ("alpha beta", "beta alpha", "alpha alpha", "alpha beta gamma"):
        assert _ids(idx.search_phrase_slop(phrase, 0)) == _ids(
            idx.search_phrase(phrase)
        ), phrase
    # slop is monotone: widening never loses docs
    prev: set = set()
    for s in range(0, 4):
        cur = set(_ids(idx.search_phrase_slop("alpha gamma", s)))
        assert prev <= cur
        prev = cur


def test_phrase_slop_artifact_parity(spark, tmp_path):
    from searchengine_spark.index.artifact import build_artifact

    rows = [
        (i, f"merge w{i} sort filler" if i % 3 else f"sort w{i} filler merge")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    lidx = build_index(spark, docs, analyzer="punctuation", cache=False)
    aidx = build_artifact(spark, docs, str(tmp_path / "sx"), analyzer="punctuation")
    for s in (0, 1, 2):
        assert _ids(lidx.search_phrase_slop("merge sort", s)) == _ids(
            aidx.search_phrase_slop("merge sort", s)
        ), f"slop {s}"


# --- regex term search (query/fuzzy.py::regex_terms/search_regex) -----------


def test_regex_terms_and_search(spark, qx_index):
    from searchengine_spark.query import fuzzy as fz

    # anchored full-term match: 'beta'/'zeta' but NOT 'alpha' (ends 'a'
    # but doesn't match the branch) — exercises alternation + classes
    terms = {r["term"] for r in fz.regex_terms(qx_index, "[bz]eta").collect()}
    assert terms == {"beta", "zeta"}
    got = {int(r["doc_id"]): r["n_regex_terms"]
           for r in fz.search_regex(qx_index, "[bz]eta").collect()}
    assert got == {1: 1, 3: 1, 6: 1}
    # anchoring: a bare substring pattern must NOT match mid-term
    assert fz.regex_terms(qx_index, "lph").count() == 0
    assert {r["term"] for r in fz.regex_terms(qx_index, ".*lph.*").collect()} == {
        "alpha"
    }
    # no match -> empty typed frame
    assert fz.search_regex(qx_index, "q[xyz]+").count() == 0
    with pytest.raises(ValueError, match="empty pattern"):
        fz.regex_terms(qx_index, "")
    with pytest.raises(ValueError, match="maxClauseCount"):
        fz.regex_terms(qx_index, ".*", max_terms=3)


# --- MMR diversity rerank (query/mmr.py) ------------------------------------


def test_mmr_diversity_flips_redundant_runner_up(spark):
    from searchengine_spark.query.mmr import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 0.90), (2, 0.89), (3, 0.50)], "doc_id long, score double"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # lam=0.5: doc 2 is near-identical to the seed, so the orthogonal doc 3
    # wins rank 2 despite much lower relevance
    got = [(r["doc_id"], r["mmr_rank"])
           for r in mmr_rerank(cand, emb, 3, lam=0.5).orderBy("mmr_rank").collect()]
    assert got == [(1, 1), (3, 2), (2, 3)]
    # lam=1 degenerates to pure relevance order
    rel = [(r["doc_id"], r["mmr_rank"])
           for r in mmr_rerank(cand, emb, 3, lam=1.0).orderBy("mmr_rank").collect()]
    assert rel == [(1, 1), (2, 2), (3, 3)]


def test_mmr_edge_cases(spark):
    from searchengine_spark.query.mmr import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],  # doc 3 has NO vector
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(cand, emb, 5).orderBy("mmr_rank").collect()
    # vectorless candidates drop; k caps at the pool
    assert [r["doc_id"] for r in out] == [1, 2]
    assert [r["mmr_rank"] for r in out] == [1, 2]
    assert mmr_rerank(cand, emb, 0).count() == 0
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(cand, emb, 2, lam=1.5)


# --- cursor pagination (query/ranked.py::search_bm25_after) -----------------


def test_search_after_pages_partition_full_ranking(spark):
    # 30 docs over a tiny vocab -> plenty of rounded-score ties, and
    # numeric ids >9 so a string tie-break would misorder ('10' < '2')
    rows = [(i, "alpha beta" if i % 3 else "alpha alpha beta gamma")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    q = "alpha gamma"
    full = sorted(
        (
            (r["doc_id"], r["score_r"])
            for r in idx.search_bm25(q, None)
            .selectExpr("cast(doc_id as long) doc_id", "round(score, 4) score_r")
            .collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    pages, cursor = [], None
    while True:
        p = idx.search_bm25_after(q, 7, cursor=cursor, id_cast="long").collect()
        if not p:
            break
        pages.extend((r["doc_id"], r["score_r"]) for r in p)
        cursor = (p[-1]["score_r"], p[-1]["doc_id"])
        if len(p) < 7:
            break
    # pages concatenated == the full ranking: nothing skipped or duplicated
    assert pages == full
    assert len(pages) == 30


def test_search_after_cursor_is_strictly_after(spark, qx_index):
    p1 = qx_index.search_bm25_after("alpha delta", 2, id_cast="long").collect()
    cursor = (p1[-1]["score_r"], p1[-1]["doc_id"])
    p2 = qx_index.search_bm25_after(
        "alpha delta", 2, cursor=cursor, id_cast="long"
    ).collect()
    ids1 = {r["doc_id"] for r in p1}
    ids2 = {r["doc_id"] for r in p2}
    assert not ids1 & ids2
    # page-2 rows sort strictly after the cursor
    for r in p2:
        assert (-r["score_r"], r["doc_id"]) > (-cursor[0], cursor[1])


# --- synonym-aware BM25 (query/synonyms.py) ----------------------------------


def test_synonym_bm25_blended_semantics(spark):
    from searchengine_spark.query.synonyms import search_bm25_synonyms

    docs = spark.createDataFrame(
        [
            (1, "car fast"),
            (2, "automobile fast"),
            (3, "car automobile fast"),   # both variants: blended tf=2
            (4, "fast only here"),
            (5, "boring filler text"),
        ],
        "doc_id long, text string",
    ).selectExpr("cast(doc_id as string) doc_id", "text")
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    got = {int(r["doc_id"]): r["score"]
           for r in search_bm25_synonyms(idx, "car", {"car": ["automobile"]}).collect()}
    # union semantics: docs with EITHER variant match
    assert set(got) == {1, 2, 3}
    # blended frequency: doc 3 (tf_g=2, same dl as others? no — longer dl)
    # gets ONE idf at higher tf, not idf twice; independent-OR would give
    # it ~2x doc 1's score. Compute the expected blend by hand:
    n, df_g = 5, 3
    idf = math.log((n - df_g + 0.5) / (df_g + 0.5) + 1.0)
    k1, b = float(idx.k1), float(idx.b)
    avgdl = float(idx.avgdl)

    def bm25(tf, dl):
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(bm25(1, 2), abs=1e-12)
    assert got[2] == pytest.approx(bm25(1, 2), abs=1e-12)
    assert got[3] == pytest.approx(bm25(2, 3), abs=1e-12)
    assert got[3] < 2 * got[1]  # the anti-stuffing property


def test_synonym_bm25_singleton_groups_equal_plain_bm25(spark, qx_index):
    from searchengine_spark.query.synonyms import search_bm25_synonyms

    plain = {r["doc_id"]: r["score"]
             for r in qx_index.search_bm25("alpha gamma", None).collect()}
    syn = {r["doc_id"]: r["score"]
           for r in search_bm25_synonyms(qx_index, "alpha gamma", {}).collect()}
    assert syn == plain  # bit-identical: same stats, same fold order


def test_synonym_bm25_overlapping_groups_rejected(qx_index):
    from searchengine_spark.query.synonyms import search_bm25_synonyms

    with pytest.raises(ValueError, match="double-count"):
        search_bm25_synonyms(
            qx_index, "alpha beta", {"alpha": ["gamma"], "beta": ["gamma"]}
        )


def test_compile_synonyms_analyzes_both_sides(spark):
    from searchengine_spark.query.synonyms import compile_synonyms

    docs = spark.createDataFrame(
        [("1", "running jumps")], "doc_id string, text string"
    )
    idx = build_index(spark, docs, cache=False)  # composable: Porter stems
    m = compile_synonyms(idx, {"running": ["jogged", "the"]})
    # key and members both stemmed; stop-word synonym drops out
    (key,) = m.keys()
    assert key == "run"
    assert "jog" in m[key] and "run" in m[key] and "the" not in m[key]


def test_session5_ops_plans_no_nested_loop(spark):
    """Plan assertion for the session-5 operators: every join in fielded /
    BM25F / sloppy phrase / regex / synonym / pagination / keyterms plans
    is an equi-join. MMR is deliberately NOT here: its pairwise-cosine
    stage is a depth-bounded inequality join (depth^2 rows regardless of
    corpus size) — the one sanctioned bounded-cross shape."""
    from pyspark.sql import functions as F

    from searchengine_spark.fixtures import doc_key_col
    from searchengine_spark.query import fuzzy as fz
    from searchengine_spark.query.bm25f import search_bm25f
    from searchengine_spark.query.fielded import search_fielded
    from searchengine_spark.query.synonyms import search_bm25_synonyms
    from searchengine_spark.textops.keyterms import doc_keyterms

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    meta = tr.withColumn("doc_id", doc_key_col()).select("doc_id", "role", "tool")
    fields = tr.select(
        F.col("conv_id").alias("doc_id"), F.col("role").alias("field"), "text"
    )
    plans = {
        "fielded": search_fielded(idx, meta, "zebra role:user", None),
        "bm25f": search_bm25f(spark, fields, "zebra data", {"user": 1.0, "tool": 0.5}),
        "phrase_slop": idx.search_phrase_slop("zebra data", 2),
        "regex": fz.search_regex(idx, "z[a-z]+"),
        "synonyms": search_bm25_synonyms(idx, "zebra", {"zebra": ["data"]}),
        "page2": idx.search_bm25_after("zebra data", 2, cursor=(9.9, "a"),
                                       id_cast=None),
        "keyterms": doc_keyterms(tr.withColumn("doc_id", doc_key_col()), 2),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_bm25f_randomized_differential(spark):
    """Seeded random corpora × random weights vs the independent pure-
    python BM25F — exact float equality (the sorted-fold contract)."""
    import random

    from searchengine_spark.query.bm25f import search_bm25f

    rng = random.Random(20260818)
    vocab = ["alpha", "beta", "gamma", "delta", "zebra", "data", "x"]
    fields = ["title", "body", "meta"]
    for trial in range(3):
        rows = []
        for d in range(rng.randint(4, 9)):
            for f in fields:
                if rng.random() < 0.7:  # some (doc, field) groups absent
                    n = rng.randint(1, 8)
                    rows.append(
                        (f"d{d}", f, " ".join(rng.choices(vocab, k=n)))
                    )
        w = {f: round(rng.uniform(0.2, 3.0), 2)
             for f in fields if rng.random() < 0.8}
        if not w:
            w = {"body": 1.0}
        query = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        df = spark.createDataFrame(rows, "doc_id string, field string, text string")
        got = {r["doc_id"]: r["score"]
               for r in search_bm25f(spark, df, query, w).collect()}
        exp = _bm25f_pyref(rows, query, w)
        assert set(got) == set(exp), (trial, query, w)
        for d in got:
            assert got[d] == pytest.approx(exp[d], abs=1e-12), (trial, d)


# ---------------------------------------------------------------------------
# explain_bm25 (Lucene-explain-style score breakdown)
# ---------------------------------------------------------------------------


def test_explain_bm25_partials_sum_to_search_score(spark):
    """sum(partial) per doc == search_bm25 score (6dp rounding only),
    and the breakdown inputs (tf, dl, df) are the index's own stats."""
    from searchengine_spark.query.ranked import explain_bm25

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    res = idx.search_bm25("zebra data", 3).collect()
    ids = [r["doc_id"] for r in res]
    exp = explain_bm25(idx, "zebra data", ids).collect()
    assert {r["doc_id"] for r in exp} == set(ids)
    sums = {}
    for r in exp:
        sums[r["doc_id"]] = sums.get(r["doc_id"], 0.0) + r["partial_r"]
        assert r["df"] == idx.document_frequency(r["term"])
    for r in res:
        assert sums[r["doc_id"]] == pytest.approx(r["score"], abs=1e-5)


def test_explain_bm25_artifact_parity(spark, tmp_path):
    from searchengine_spark.index.artifact import build_artifact
    from searchengine_spark.query.ranked import explain_bm25

    tr = _mini_transcripts(spark)
    from searchengine_spark.fixtures import doc_key_col

    docs = tr.withColumn("doc_id", doc_key_col()).select("doc_id", "text")
    lidx = build_index(spark, docs, cache=False)
    aidx = build_artifact(spark, docs, str(tmp_path / "expl"))
    ids = [r["doc_id"] for r in lidx.search_bm25("zebra data", 3).collect()]
    lrows = [tuple(r) for r in explain_bm25(lidx, "zebra data", ids).collect()]
    arows = [tuple(r) for r in explain_bm25(aidx, "zebra data", ids).collect()]
    assert lrows == arows and lrows


def test_explain_bm25_edge_cases(spark):
    from searchengine_spark.query.ranked import explain_bm25

    idx = _mini_index(spark, _mini_transcripts(spark))
    with pytest.raises(ValueError):
        explain_bm25(idx, "zebra", [])
    # unknown-vocabulary query -> empty frame with the full schema
    out = explain_bm25(idx, "qqqqxyzzy", ["c1:0000"])
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "term", "tf", "dl", "qtf", "df", "idf_r", "partial_r",
    ]


def test_facet_date_histogram_hand_computed(spark):
    from datetime import datetime

    from searchengine_spark.query.morelike import facet_date_histogram

    rows = [
        ("d1", "zebra runs", datetime(2024, 1, 1, 10, 5)),
        ("d2", "zebra sleeps", datetime(2024, 1, 1, 10, 55)),
        ("d3", "zebra eats", datetime(2024, 1, 1, 12, 0)),   # gap at 11:00
        ("d4", "nothing here", datetime(2024, 1, 1, 10, 30)),  # no match
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, ts timestamp")
    idx = build_index(spark, df.select("doc_id", "text"), cache=False)
    got = [
        (r.bucket_es, r.n_hits)
        for r in facet_date_histogram(
            idx, "zebra", df.select("doc_id", "ts"), interval_s=3600
        ).collect()
    ]
    h10 = int(datetime(2024, 1, 1, 10).timestamp())
    h12 = int(datetime(2024, 1, 1, 12).timestamp())
    # two hits in the 10:00 bucket, one at 12:00, NO empty 11:00 bucket,
    # the non-matching doc never counted
    assert got == [(h10, 2), (h12, 1)]
    with pytest.raises(ValueError):
        facet_date_histogram(idx, "zebra", df, interval_s=0)


# ---------------------------------------------------------------------------
# search_bm25_boolean (Lucene BooleanQuery with BM25 scoring)
# ---------------------------------------------------------------------------


def _bool_corpus(spark):
    rows = [
        ("d1", "zebra data merge fast"),
        ("d2", "zebra data data"),
        ("d3", "zebra merge banned"),
        ("d4", "merge fast fast"),
        ("d5", "banned data"),
        ("d6", "unrelated words entirely"),
    ]
    return build_index(
        spark,
        spark.createDataFrame(rows, "doc_id string, text string"),
        cache=False,
    )


def test_bm25_boolean_pure_should_is_plain_bm25(spark):
    from searchengine_spark.query.ranked import search_bm25_boolean

    idx = _bool_corpus(spark)
    a = {r["doc_id"]: r["score"]
         for r in idx.search_bm25("zebra data", None).collect()}
    b = {r["doc_id"]: r["score"]
         for r in search_bm25_boolean(idx, should=["zebra data"]).collect()}
    assert a == b  # exact float equality: the identical sorted fold


def test_bm25_boolean_clause_semantics(spark):
    from searchengine_spark.query.ranked import search_bm25_boolean

    idx = _bool_corpus(spark)
    got = search_bm25_boolean(
        idx, must=["zebra"], should=["fast"], must_not=["banned"]
    ).collect()
    ids = [r["doc_id"] for r in got]
    # d3 has zebra but is vetoed; d4 has fast but lacks the must term;
    # d1 (zebra + fast) must outrank d2 (zebra only, no should hit)
    assert set(ids) == {"d1", "d2"}
    assert ids[0] == "d1"
    # must with zero matches anywhere -> empty, Lucene semantics
    assert search_bm25_boolean(idx, must=["qqqzzz"]).count() == 0
    # all clauses empty / analyzed away -> empty
    assert search_bm25_boolean(idx, should=["the of"]).count() == 0
    with pytest.raises(ValueError, match="must_not"):
        search_bm25_boolean(idx, must=["zebra"], must_not=["zebra"])


def test_bm25_boolean_artifact_parity(spark, tmp_path):
    from searchengine_spark.index.artifact import build_artifact
    from searchengine_spark.query.ranked import search_bm25_boolean

    tr = _mini_transcripts(spark)
    from searchengine_spark.fixtures import doc_key_col

    docs = tr.withColumn("doc_id", doc_key_col()).select("doc_id", "text")
    lidx = build_index(spark, docs, cache=False)
    aidx = build_artifact(spark, docs, str(tmp_path / "boolx"))
    kw = dict(must=["data"], should=["zebra"], must_not=["gamma"])
    lrows = [tuple(r) for r in search_bm25_boolean(lidx, **kw).collect()]
    arows = [tuple(r) for r in search_bm25_boolean(aidx, **kw).collect()]
    assert lrows == arows


def test_conversation_clause_search_hand_computed(spark):
    from searchengine_spark.transcripts import conversation_clause_search

    rows = [
        # c1: user asks about errors, assistant merges -> matches both
        ("c1", 0, "user", "an error happened in the merge", ""),
        ("c1", 1, "assistant", "running the merge now", ""),
        # c2: user mentions error but assistant never merges
        ("c2", 0, "user", "error again", ""),
        ("c2", 1, "assistant", "looking into it", ""),
        # c3: the ASSISTANT says error (wrong role for clause 0)
        ("c3", 0, "user", "please help", ""),
        ("c3", 1, "assistant", "error while merging", ""),
        # c4: both clauses, and the user repeats the error turn
        ("c4", 0, "user", "error one", ""),
        ("c4", 1, "assistant", "merge done", ""),
        ("c4", 2, "user", "error two", ""),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = [
        (r.conv_id, r.hits_0, r.hits_1)
        for r in conversation_clause_search(
            df, [("user", "error"), ("assistant", "merge")]
        ).collect()
    ]
    # c4's second user-error turn counts; role mismatch (c3) excluded.
    # NOTE c4 turn 2 "error two": role=user would be turn_idx%3 pattern in
    # fixtures but here roles are explicit.
    assert got == [("c1", 1, 1), ("c4", 2, 1)]
    # multi-term clause: ALL terms must land in ONE turn of that role
    single = conversation_clause_search(df, [("user", "error merge")])
    assert [r.conv_id for r in single.collect()] == ["c1"]
    with pytest.raises(ValueError, match="no terms"):
        conversation_clause_search(df, [("user", "the of")])
    with pytest.raises(ValueError):
        conversation_clause_search(df, [])


def test_bm25_boolean_duplicate_doc_id_rows_still_match_must(spark):
    """Regression: a doc_id duplicated across rows (two-segment append
    without upsert) must count DISTINCT must terms, not posting rows."""
    from searchengine_spark.query.ranked import search_bm25_boolean

    rows = [
        ("d1", "zebra data merge"),
        ("d1", "zebra data merge"),   # duplicate doc_id
        ("d2", "zebra data"),
    ]
    idx = build_index(
        spark, spark.createDataFrame(rows, "doc_id string, text string"),
        cache=False,
    )
    plain = {r["doc_id"] for r in idx.search_bm25("zebra", None).collect()}
    boolean = {
        r["doc_id"]
        for r in search_bm25_boolean(idx, must=["zebra"]).collect()
    }
    assert boolean == plain == {"d1", "d2"}


def test_facet_mode_validation(spark):
    from searchengine_spark.query.morelike import (
        facet_counts, facet_date_histogram,
    )

    tr = _mini_transcripts(spark)
    idx = _mini_index(spark, tr)
    with pytest.raises(ValueError, match="mode"):
        facet_counts(idx, "zebra", "role", mode="and")
    with pytest.raises(ValueError, match="mode"):
        facet_date_histogram(idx, "zebra", tr, mode="AND")


def test_percolate_hand_computed(spark):
    from searchengine_spark.query.percolate import percolate

    docs = spark.createDataFrame(
        [
            ("d1", ["zebra", "data", "merg"]),
            ("d2", ["zebra", "merg"]),
            ("d3", ["data"]),
        ],
        "doc_id string, tokens array<string>",
    )
    queries = spark.createDataFrame(
        [
            ("q-zebra", "zebra"),
            ("q-both", "zebra data"),     # conjunction: needs both
            ("q-merge", "merging"),       # Porter-stems to 'merg'
            ("q-none", "qqqzzz"),
        ],
        "query_id string, query string",
    )
    got = [(r.doc_id, r.query_id) for r in percolate(queries, docs).collect()]
    assert got == [
        ("d1", "q-both"), ("d1", "q-merge"), ("d1", "q-zebra"),
        ("d2", "q-merge"), ("d2", "q-zebra"),
    ]
    # a vacuous (stop-word-only) stored query is rejected loudly
    bad = spark.createDataFrame(
        [("q-vacuous", "the of and")], "query_id string, query string"
    )
    with pytest.raises(ValueError, match="no terms"):
        percolate(bad, docs)
    # plan: the percolation join must never be a nested loop
    plan = (
        percolate(queries, docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_percolate_prepared_queries_and_no_cache_leak(spark):
    from searchengine_spark.query.percolate import analyze_queries, percolate

    docs = spark.createDataFrame(
        [("d1", ["zebra", "data"]), ("d2", ["zebra"])],
        "doc_id string, tokens array<string>",
    )
    queries = spark.createDataFrame(
        [("q-zebra", "zebra"), ("q-both", "zebra data")],
        "query_id string, query string",
    )
    base = [(r.doc_id, r.query_id) for r in percolate(queries, docs).collect()]
    # the one-shot path must not persist (a per-call persist leaked one
    # CacheManager entry per percolate() in long-running processes)
    plan = percolate(queries, docs)._jdf.queryExecution().executedPlan().toString()
    assert "InMemory" not in plan
    # prepared path: analyze once, reuse across calls — same results
    prep = analyze_queries(queries).persist()
    try:
        got = [
            (r.doc_id, r.query_id)
            for r in percolate(None, docs, prepared_queries=prep).collect()
        ]
        assert got == base
    finally:
        prep.unpersist()
    # vacuous validation lives in analyze_queries too
    bad = spark.createDataFrame(
        [("q-vac", "the of and")], "query_id string, query string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no terms"):
        analyze_queries(bad)


def test_facet_stats_percentile_labels_rounded(spark):
    # int(0.29 * 100) == 28: labels must round, not truncate
    from searchengine_spark.query.morelike import facet_stats

    meta = spark.createDataFrame(
        [("d1", "en", 10.0), ("d2", "en", 20.0), ("d3", "fr", 30.0)],
        "doc_id string, lang string, dl double",
    )
    res = spark.createDataFrame([("d1",), ("d2",), ("d3",)], "doc_id string")
    out = facet_stats(res, meta, "lang", "dl", percentiles=(0.29, 0.58))
    assert "p29" in out.columns and "p58" in out.columns


def test_conversation_dedup_hand_checked(spark):
    from pyspark.sql import functions as F

    from searchengine_spark.transcripts import conversation_dedup

    turns = []
    base = [
        (0, "user", "how do i merge two sorted runs in spark"),
        (1, "assistant", "use a sort merge join over the bucketed runs"),
        (2, "user", "what about skewed keys in the merge"),
        (3, "assistant", "salt the hot keys before the shuffle"),
    ]
    for i, (ti, role, text) in enumerate(base):
        turns.append(("c-a", ti, role, text))       # original
        turns.append(("c-b", ti, role, text))       # exact re-log
        if ti > 0:
            turns.append(("c-c", ti, role, text))   # first turn dropped
    turns.append(("c-d", 0, "user", "completely unrelated zebra pancakes"))
    df = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string"
    )
    out = {r.conv_id: (r.status, r.dup_of)
           for r in conversation_dedup(df, est_threshold=0.3).collect()}
    assert out["c-a"] == ("novel", None)
    assert out["c-b"] == ("exact_dup", "c-a")
    assert out["c-c"][0] == "near_dup" and out["c-c"][1] in ("c-a", "c-b")
    assert out["c-d"] == ("novel", None)
    # turn ORDER matters for exact identity: permuted turns != same conv
    perm = spark.createDataFrame(
        [("p-a", 0, "u", "alpha beta"), ("p-a", 1, "u", "gamma delta"),
         ("p-b", 0, "u", "gamma delta"), ("p-b", 1, "u", "alpha beta")],
        "conv_id string, turn_idx int, role string, text string",
    )
    pout = {r.conv_id: r.status for r in conversation_dedup(perm).collect()}
    assert pout == {"p-a": "novel", "p-b": "novel"}


# ---------------------------------------------------------------------------
# field collapsing (query/collapse.py)
# ---------------------------------------------------------------------------


def test_collapse_hand_computed(spark):
    from searchengine_spark.query.collapse import collapse_results

    scores = spark.createDataFrame(
        [(1, 3.0), (2, 2.5), (3, 2.5), (4, 1.0), (5, 0.5)],
        "doc_id long, score double",
    )
    groups = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "b"), (5, "c"), (6, "c")],
        "doc_id long, src string",
    )
    rows = {
        r.group: r
        for r in collapse_results(scores, groups, "src", k=None, inner_hits=2)
        .collect()
    }
    # best member per group; rounded-score ties break by doc_id asc
    assert rows["a"].doc_id == 1 and rows["a"].score_r == 3.0
    assert rows["b"].doc_id == 2 and rows["b"].score_r == 2.5
    # group_size counts ALL matching members (doc 6 never matched: absent)
    assert rows["a"].group_size == 1
    assert rows["b"].group_size == 3
    assert rows["c"].group_size == 1
    # inner_hits: top-N member doc_ids in (score_r desc, doc_id) order
    assert rows["b"].inner_hits == "2,3"
    assert rows["c"].inner_hits == "5"


def test_collapse_k_cut_and_group_order(spark):
    from searchengine_spark.query.collapse import collapse_results

    scores = spark.createDataFrame(
        [(i, float(i % 3) + 1.0) for i in range(1, 10)],
        "doc_id long, score double",
    )
    groups = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(1, 10)], "doc_id long, src string"
    )
    out = collapse_results(scores, groups, "src", k=2, inner_hits=1).collect()
    assert len(out) == 2
    # groups ranked by representative score desc, then group asc
    assert out[0].score_r >= out[1].score_r
    if out[0].score_r == out[1].score_r:
        assert out[0].group < out[1].group


def test_collapse_bm25_representative_matches_plain_search(spark):
    """The collapse representative set == the best-per-group slice of the
    plain BM25 ranking (same rounded scores), pinning that collapsing only
    regroups — it never rescores."""
    import pyspark.sql.functions as F

    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.query.collapse import search_bm25_collapse

    docs = transcripts_df(spark).select(
        F.concat_ws(":", "conv_id", "turn_idx").alias("doc_id"),
        "text",
        F.col("role").alias("grp"),
    )
    idx = build_index(spark, docs, analyzer="punctuation", cache=False)
    q = "spark shuffle error"
    collapsed = {
        r.group: (r.doc_id, r.score_r)
        for r in search_bm25_collapse(
            idx, q, docs.select("doc_id", "grp"), "grp", k=None
        ).collect()
    }
    plain = idx.search_bm25(q, None).select(
        "doc_id", F.round("score", 4).alias("score_r")
    )
    best = {}
    for r in sorted(
        plain.join(docs.select("doc_id", "grp"), "doc_id").collect(),
        key=lambda r: (-r.score_r, r.doc_id),
    ):
        best.setdefault(r.grp, (r.doc_id, r.score_r))
    assert collapsed == best


def test_tool_loops_hand_checked(spark):
    from searchengine_spark.transcripts import tool_loops

    rows = [
        # c1: grep grep grep editor grep grep — runs (grep,3), (grep,2);
        # the non-tool turn 2 does NOT break the first run (skipped)
        ("c1", 0, "tool", "x", "grep"),
        ("c1", 1, "tool", "x", "grep"),
        ("c1", 2, "assistant", "x", ""),
        ("c1", 3, "tool", "x", "grep"),
        ("c1", 4, "tool", "x", "editor"),
        ("c1", 5, "tool", "x", "grep"),
        ("c1", 6, "tool", "x", "grep"),
        # c2: alternating — no run >= 2
        ("c2", 0, "tool", "x", "grep"),
        ("c2", 1, "tool", "x", "editor"),
        ("c2", 2, "tool", "x", "grep"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        (r["conv_id"], r["start_turn"]): (r["tool"], r["run_len"])
        for r in tool_loops(df).collect()
    }
    assert got == {("c1", 0): ("grep", 3), ("c1", 5): ("grep", 2)}
    # min_run=1 reports every maximal run, including singletons:
    # c1 = (grep,3)(editor,1)(grep,2); c2 = three singletons
    assert tool_loops(df, min_run=1).count() == 3 + 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_run"):
        tool_loops(df, min_run=0)


def test_tool_failure_stats_hand_checked(spark):
    from searchengine_spark.transcripts import tool_failure_stats

    rows = [
        # grep fails twice; first failure retried (next call is grep),
        # second failure followed by editor (not a retry)
        ("c1", 0, "tool", "Error: no match", "grep"),
        ("c1", 1, "tool", "error again", "grep"),
        ("c1", 2, "tool", "ok", "editor"),
        # c2: editor fails, conversation ends (lead is NULL -> no retry)
        ("c2", 0, "tool", "disk ERROR", "editor"),
        ("c2", 1, "user", "error error", ""),  # non-tool: excluded
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        r["tool"]: (r["n_calls"], r["n_fail"], r["n_retry"], r["fail_rate_r"])
        for r in tool_failure_stats(df).collect()
    }
    assert got == {
        "grep": (2, 2, 1, 1.0),
        "editor": (2, 1, 0, 0.5),
    }
