"""Session-7 operators: rank evaluation (P@k/MRR/NDCG), dis-max
multi-field ranking, function-score decay, and concat-and-chunk sequence
packing — hand-computed semantics, invariants, and plan assertions."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark import BM25_B, BM25_K1
from searchengine_spark.index import build_index


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def _frags(spark, counts, capacity, **kw):
    from searchengine_spark.textops.packing import pack_sequences

    df = spark.createDataFrame(counts, "doc_id string, n_tokens long")
    out = pack_sequences(df, capacity, **kw)
    rows = [
        (r.seq_id, r.doc_id, r.doc_offset, r.seq_offset, r.frag_len)
        for r in out.orderBy("seq_id", "doc_id").collect()
    ]
    out.unpersist()
    return rows


def test_pack_sequences_hand_computed(spark):
    # a=5, b=3, c=10 at capacity 6: token intervals a=[0,5) b=[5,8) c=[8,18)
    rows = _frags(
        spark, [("a", 5), ("b", 3), ("c", 10)], 6
    )
    assert rows == [
        (0, "a", 0, 0, 5),
        (0, "b", 0, 5, 1),
        (1, "b", 1, 0, 2),
        (1, "c", 0, 2, 4),
        (2, "c", 4, 0, 6),
    ]


def test_pack_sequences_edge_cases(spark):
    from searchengine_spark.textops.packing import pack_sequences

    # zero-token docs vanish; a doc longer than capacity spans many seqs
    rows = _frags(spark, [("a", 0), ("b", 13)], 4)
    assert rows == [
        (0, "b", 0, 0, 4),
        (1, "b", 4, 0, 4),
        (2, "b", 8, 0, 4),
        (3, "b", 12, 0, 1),
    ]
    df = spark.createDataFrame([("a", 1)], "doc_id string, n_tokens long")
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, 0)


def test_pack_sequences_invariants_and_stats(spark, tiny_corpus):
    from searchengine_spark.textops.packing import pack_sequences, packing_stats

    cap = 64
    counts = tiny_corpus.select(
        "doc_id",
        F.when(F.col("text") != "", F.size(F.split("text", " ")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    frags = pack_sequences(counts, cap)
    # every doc's fragments partition its tokens exactly, in order
    per_doc = {
        r["doc_id"]: r["tot"]
        for r in frags.groupBy("doc_id").agg(F.sum("frag_len").alias("tot")).collect()
    }
    expect = {
        r["doc_id"]: r["n_tokens"]
        for r in counts.where(F.col("n_tokens") > 0).collect()
    }
    assert per_doc == expect
    # every sequence is exactly full except possibly the last
    fills = {
        r["seq_id"]: r["n_tokens"]
        for r in packing_stats(frags, cap).collect()
    }
    last = max(fills)
    assert set(fills) == set(range(last + 1))  # dense seq ids from 0
    for sid, n in fills.items():
        assert n == cap if sid < last else 0 < n <= cap
    # fragment offsets within one multi-fragment doc are contiguous
    multi = (
        frags.groupBy("doc_id").count().where(F.col("count") > 1).limit(1).collect()
    )
    if multi:
        rs = sorted(
            frags.where(F.col("doc_id") == multi[0]["doc_id"]).collect(),
            key=lambda r: r.seq_id,
        )
        off = 0
        for r in rs:
            assert r.doc_offset == off
            off += r.frag_len
    plan = frags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    frags.unpersist()


def test_attach_loss_mask(spark):
    from searchengine_spark.textops.packing import attach_loss_mask, pack_sequences

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 10)], "doc_id string, n_tokens long"
    )
    frags = pack_sequences(df, 6)
    meta = spark.createDataFrame(
        [("a", True), ("b", False)], "doc_id string, train boolean"
    )
    rows = {
        (r.doc_id, r.seq_id): r.loss_mask
        for r in attach_loss_mask(frags, meta).collect()
    }
    assert rows[("a", 0)] is True
    assert rows[("b", 0)] is False and rows[("b", 1)] is False
    # doc absent from meta -> masked out
    assert rows[("c", 1)] is False and rows[("c", 2)] is False
    frags.unpersist()


# ---------------------------------------------------------------------------
# rank_eval
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def re_index(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "apple banana"),
            ("d2", "apple"),
            ("d3", "banana cherry"),
            ("d4", "cherry"),
        ],
        "doc_id string, text string",
    )
    return build_index(spark, docs, cache=False)


def test_rank_eval_hand_computed(spark, re_index):
    from searchengine_spark.query.rankeval import rank_eval

    # q1 "apple banana": BM25 order d1 (both terms) > d2 (dl 1) > d3 (dl 2)
    # q2 "cherry": d4 (dl 1) > d3; no judgments at all
    # q3 unknown term: no retrieval, but judged docs exist
    queries = {"q1": "apple banana", "q2": "cherry", "q3": "zzznotaterm"}
    j = spark.createDataFrame(
        [("q1", "d1", 2), ("q1", "d3", 1), ("q1", "d4", 1), ("q3", "d1", 1)],
        "query_id string, doc_id string, grade int",
    )
    out = {r.query_id: r for r in rank_eval(re_index, queries, j, k=3).collect()}
    assert set(out) == {"q1", "q2", "q3"}

    # q1 retrieved: d1(rank1, g2), d2(rank2, g0), d3(rank3, g1); d4 judged
    # relevant but NOT retrieved (it has no query term)
    dcg = 3.0 / math.log2(2.0) + 0.0 + 1.0 / math.log2(4.0)
    idcg = 3.0 / math.log2(2.0) + 1.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    r1 = out["q1"]
    assert r1.n_judged == 3
    assert r1.p_at_k == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert r1.rr == 1.0
    assert r1.ndcg == pytest.approx(dcg / idcg, abs=1e-6)

    # q2: retrieval happens but nothing judged -> all-zero metrics
    r2 = out["q2"]
    assert (r2.n_judged, r2.p_at_k, r2.rr, r2.ndcg) == (0, 0.0, 0.0, 0.0)
    # q3: judged docs exist but nothing retrieved -> zeros, n_judged kept
    r3 = out["q3"]
    assert (r3.n_judged, r3.p_at_k, r3.rr, r3.ndcg) == (1, 0.0, 0.0, 0.0)


def test_rank_eval_k_cut_and_validation(spark, re_index):
    from searchengine_spark.query.rankeval import rank_eval

    j = spark.createDataFrame(
        [("q1", "d3", 1)], "query_id string, doc_id string, grade int"
    )
    # k=1: only d1 retrieved; the judged d3 falls outside the cut
    out = rank_eval(re_index, {"q1": "apple banana"}, j, k=1).collect()[0]
    assert out.p_at_k == 0.0 and out.rr == 0.0 and out.ndcg == 0.0
    assert out.n_judged == 1
    with pytest.raises(ValueError, match="k must be positive"):
        rank_eval(re_index, {"q1": "apple"}, j, k=0)


# ---------------------------------------------------------------------------
# dis-max
# ---------------------------------------------------------------------------


def _bm25_part(tf, dl, avgdl, idf, qtf=1):
    norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    return qtf * idf * tf * (BM25_K1 + 1.0) / norm


def test_dismax_hand_computed(spark):
    from searchengine_spark.query.bm25f import search_dismax
    from searchengine_spark.query.ranked import bm25_idf

    fields = spark.createDataFrame(
        [
            ("X", "a", "apple"),
            ("X", "b", "apple banana"),
            ("Y", "a", "apple banana"),
        ],
        "doc_id string, field string, text string",
    )
    got = {
        r.doc_id: r.score
        for r in search_dismax(
            spark, fields, "apple banana", ["a", "b"], tie_breaker=0.5
        ).collect()
    }
    # field a: N=2, df(appl)=2, df(banana)=1, dl X=1 Y=2, avgdl=1.5
    sa_x = _bm25_part(1, 1, 1.5, bm25_idf(2, 2))
    sa_y = _bm25_part(1, 2, 1.5, bm25_idf(2, 2)) + _bm25_part(
        1, 2, 1.5, bm25_idf(2, 1)
    )
    # field b: N=1, df both 1, dl X=2, avgdl=2
    sb_x = 2 * _bm25_part(1, 2, 2.0, bm25_idf(1, 1))
    exp_x = max(sa_x, sb_x) + 0.5 * min(sa_x, sb_x)
    assert got["X"] == pytest.approx(exp_x, rel=1e-12)
    assert got["Y"] == pytest.approx(sa_y, rel=1e-12)

    # tie_breaker=0 is pure best-field
    got0 = {
        r.doc_id: r.score
        for r in search_dismax(
            spark, fields, "apple banana", ["a", "b"], tie_breaker=0.0
        ).collect()
    }
    assert got0["X"] == pytest.approx(max(sa_x, sb_x), rel=1e-12)


def test_dismax_validation_and_empty(spark):
    from searchengine_spark.query.bm25f import search_dismax

    fields = spark.createDataFrame(
        [("X", "a", "apple")], "doc_id string, field string, text string"
    )
    with pytest.raises(ValueError, match="at least one field"):
        search_dismax(spark, fields, "apple", [])
    with pytest.raises(ValueError, match="tie_breaker"):
        search_dismax(spark, fields, "apple", ["a"], tie_breaker=1.5)
    assert search_dismax(spark, fields, "zzznotaterm", ["a"]).count() == 0
    assert search_dismax(spark, fields, "the of and", ["a"]).count() == 0


# ---------------------------------------------------------------------------
# function-score decay
# ---------------------------------------------------------------------------


def test_decay_multipliers_hand_computed(spark):
    from searchengine_spark.query.ranked import search_bm25_decay

    docs = spark.createDataFrame(
        [("d1", "apple"), ("d2", "apple"), ("d3", "apple")],
        "doc_id string, text string",
    )
    idx = build_index(spark, docs, cache=False)
    base = {r.doc_id: r.score for r in idx.search_bm25("apple", None).collect()}
    # d1 at the origin (mult 1), d2 inside the offset plateau (mult 1),
    # d3 at exactly offset+scale (mult == decay, by construction)
    meta = spark.createDataFrame(
        [("d1", 1000.0), ("d2", 1080.0), ("d3", 1000.0 + 100.0 + 400.0)],
        "doc_id string, ts double",
    )
    for kind in ("gauss", "exp", "linear"):
        got = {
            r.doc_id: (r.score_r, r.dist)
            for r in search_bm25_decay(
                idx, meta, "apple", 1000.0, 400.0, offset=100.0,
                decay=0.7, kind=kind,
            ).collect()
        }
        assert got["d1"] == (round(base["d1"], 4), 0.0)
        assert got["d2"] == (round(base["d2"], 4), 0.0)
        assert got["d3"][1] == 400.0
        assert got["d3"][0] == pytest.approx(
            round(base["d3"] * 0.7, 4), abs=2e-4
        ), kind


def test_decay_validation(spark):
    from searchengine_spark.query.ranked import search_bm25_decay

    docs = spark.createDataFrame([("d1", "apple")], "doc_id string, text string")
    idx = build_index(spark, docs, cache=False)
    meta = spark.createDataFrame([("d1", 0.0)], "doc_id string, ts double")
    with pytest.raises(ValueError, match="unknown decay kind"):
        search_bm25_decay(idx, meta, "apple", 0, 1, kind="step")
    with pytest.raises(ValueError, match="decay must be"):
        search_bm25_decay(idx, meta, "apple", 0, 1, decay=1.0)
    with pytest.raises(ValueError, match="scale must be"):
        search_bm25_decay(idx, meta, "apple", 0, 0)


# ---------------------------------------------------------------------------
# minimum_should_match
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def msm_index(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "apple banana cherry"),
            ("d2", "apple banana"),
            ("d3", "apple"),
            ("d4", "cherry"),
        ],
        "doc_id string, text string",
    )
    return build_index(spark, docs, cache=False)


def test_min_should_match_gates_docs(spark, msm_index):
    from searchengine_spark.query.ranked import search_bm25_boolean

    should = ["apple", "banana", "cherry"]
    base = {
        r.doc_id: r.score
        for r in search_bm25_boolean(msm_index, should=should).collect()
    }
    assert set(base) == {"d1", "d2", "d3", "d4"}
    got2 = {
        r.doc_id: r.score
        for r in search_bm25_boolean(
            msm_index, should=should, min_should_match=2
        ).collect()
    }
    # the gate filters docs but never changes surviving docs' scores
    assert got2 == {d: base[d] for d in ("d1", "d2")}
    got3 = {
        r.doc_id
        for r in search_bm25_boolean(
            msm_index, should=should, min_should_match=3
        ).collect()
    }
    assert got3 == {"d1"}
    # unsatisfiable threshold -> empty; must+msm compose
    assert (
        search_bm25_boolean(
            msm_index, should=should, min_should_match=4
        ).count()
        == 0
    )
    withmust = {
        r.doc_id
        for r in search_bm25_boolean(
            msm_index,
            must=["apple"],
            should=["banana", "cherry"],
            min_should_match=2,
        ).collect()
    }
    assert withmust == {"d1"}


def test_min_should_match_term_level_multi_token_entries(spark, msm_index):
    from searchengine_spark.query.ranked import search_bm25_boolean

    # one entry analyzing to two tokens contributes BOTH as should terms
    got = {
        r.doc_id
        for r in search_bm25_boolean(
            msm_index, should=["apple banana", "cherry"], min_should_match=2
        ).collect()
    }
    assert got == {"d1", "d2"}


# ---------------------------------------------------------------------------
# term vectors
# ---------------------------------------------------------------------------


def test_term_vectors_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "the happy Happy coding!"),
            ("d2", "coding"),
            ("d3", "zebra"),
        ],
        "doc_id string, text string",
    )
    idx = build_index(spark, docs, cache=False)
    rows = {
        (r.doc_id, r.term): (r.tf, list(r.positions))
        for r in idx.term_vectors(["d1", "d2", "missing"]).collect()
    }
    # 'the' is a stop word: removed BEFORE positions are assigned
    assert rows == {
        ("d1", "happi"): (2, [0, 1]),
        ("d1", "code"): (1, [2]),
        ("d2", "code"): (1, [0]),
    }
    assert idx.term_vectors([]).count() == 0
    # tombstoned docs yield no rows
    idx.delete_documents("zebra")
    assert idx.term_vectors(["d3"]).count() == 0
    assert idx.term_vectors(["d1"]).count() == 2


# ---------------------------------------------------------------------------
# boosting query
# ---------------------------------------------------------------------------


def test_boosting_demotes_not_excludes(spark):
    from searchengine_spark.query.ranked import search_bm25_boosting

    docs = spark.createDataFrame(
        [("d1", "apple"), ("d2", "apple snake"), ("d3", "snake")],
        "doc_id string, text string",
    )
    idx = build_index(spark, docs, cache=False)
    base = {r.doc_id: r.score for r in idx.search_bm25("apple", None).collect()}
    got = {
        r.doc_id: r.score
        for r in search_bm25_boosting(idx, "apple", "snake", 0.5).collect()
    }
    # d3 matches only the negative query: not in the result set at all
    assert set(got) == {"d1", "d2"}
    assert got["d1"] == base["d1"]
    assert got["d2"] == pytest.approx(base["d2"] * 0.5, rel=1e-12)
    # a term shared by both queries scores AND demotes (ES independence)
    both = {
        r.doc_id: r.score
        for r in search_bm25_boosting(idx, "apple", "apple", 0.5).collect()
    }
    assert both["d1"] == pytest.approx(base["d1"] * 0.5, rel=1e-12)
    # unknown negative vocabulary is a no-op demotion
    noop = {
        r.doc_id: r.score
        for r in search_bm25_boosting(idx, "apple", "zzznope", 0.5).collect()
    }
    assert noop == base
    with pytest.raises(ValueError, match="negative_boost"):
        search_bm25_boosting(idx, "apple", "snake", 1.0)
    assert search_bm25_boosting(idx, "zzznope", "snake", 0.5).count() == 0


# ---------------------------------------------------------------------------
# proximity rescorer
# ---------------------------------------------------------------------------


def test_rescore_near_boosts_proximate_docs(spark):
    from searchengine_spark.query.proximity import search_bm25_rescore_near

    # d1 and d2 have identical tf/dl (equal BM25 base); only d2 has the
    # terms adjacent, so the proximity boost must reorder them
    docs = spark.createDataFrame(
        [
            ("d1", "apple zz yy xx ww banana"),
            ("d2", "apple banana qq rr ss tt"),
        ],
        "doc_id string, text string",
    )
    idx = build_index(spark, docs, cache=False)
    base_r = {
        r.doc_id: round(r.score, 4)
        for r in idx.search_bm25("apple banana", None).collect()
    }
    assert base_r["d1"] == base_r["d2"]  # fixture precondition
    rows = search_bm25_rescore_near(
        idx, "apple banana", window=1, boost=0.5, n_rescore=10
    ).collect()
    got = {r.doc_id: (r.score_r, r.near) for r in rows}
    assert got["d2"] == (round(base_r["d2"] * 1.5, 6), True)
    assert got["d1"] == (base_r["d1"], False)
    assert [r.doc_id for r in rows] == ["d2", "d1"]
    # n_rescore cuts the window BEFORE the feature: with window size 1,
    # only the cheap-rank-best doc (tie -> lowest doc_id: d1) survives
    only = search_bm25_rescore_near(
        idx, "apple banana", window=1, boost=0.5, n_rescore=1
    ).collect()
    assert [(r.doc_id, r.near) for r in only] == [("d1", False)]
    # single-term queries are trivially near
    single = search_bm25_rescore_near(idx, "apple", 2, 0.5, 10).collect()
    assert all(r.near for r in single)
    with pytest.raises(ValueError, match="n_rescore"):
        search_bm25_rescore_near(idx, "apple", 1, 0.5, 0)
    with pytest.raises(ValueError, match="window"):
        search_bm25_rescore_near(idx, "apple", -1)


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_session7_ops_plans_no_nested_loop(spark, re_index):
    from searchengine_spark.query.bm25f import search_dismax
    from searchengine_spark.query.ranked import search_bm25_decay
    from searchengine_spark.query.rankeval import rank_eval

    fields = spark.createDataFrame(
        [("X", "a", "apple banana"), ("Y", "b", "apple")],
        "doc_id string, field string, text string",
    )
    meta = spark.createDataFrame(
        [("d1", 10.0), ("d2", 20.0)], "doc_id string, ts double"
    )
    j = spark.createDataFrame(
        [("q1", "d1", 1)], "query_id string, doc_id string, grade int"
    )
    # NB: rank_eval with a SINGLE query is a degenerate plan — Catalyst
    # constant-folds the lone query_id to a literal, the metric joins lose
    # their equi-key, and a 1-row-build NLJ appears (harmless: the build
    # side is the per-query metrics frame, <= |Q| rows). Assert the real
    # multi-query shape, which is all hash joins.
    from searchengine_spark.query.proximity import search_bm25_rescore_near
    from searchengine_spark.query.ranked import search_bm25_boosting

    frames = {
        "dismax": search_dismax(spark, fields, "apple banana", ["a", "b"]),
        "decay": search_bm25_decay(re_index, meta, "apple", 0.0, 100.0),
        "rank_eval": rank_eval(
            re_index, {"q1": "apple", "q2": "banana"}, j, k=5
        ),
        "boosting": search_bm25_boosting(re_index, "apple", "cherry", 0.5),
        "rescore": search_bm25_rescore_near(
            re_index, "apple banana", 2, 0.5, 10
        ),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------------------
# int8 quantized ANN + hard negatives
# ---------------------------------------------------------------------------


def test_quantize_embeddings_hand_computed(spark):
    from searchengine_spark.textops.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.27]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: (list(r.qvec), r.scale) for r in quantize_embeddings(df).collect()}
    q, s = rows[1]
    assert s == pytest.approx(1.0 / 127.0, rel=1e-9)
    # round half AWAY from zero: -63.5 -> -64
    assert q == [127, -64, 34]
    qz, sz = rows[2]
    assert qz == [0, 0, 0] and sz == 1e-12  # eps scale, all-zero quant


def test_int8_topk_matches_exact_on_fixture(spark):
    from searchengine_spark.fixtures import transcripts_df  # noqa: F401
    from searchengine_spark.textops.similarity import brute_force_topk, int8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").collect()[0].embedding]
    base = emb.where("vec_id <> 0")
    exact = [r.vec_id for r in brute_force_topk(base, qv, 10).collect()]
    got = [r.vec_id for r in int8_topk(base, qv, 10, rerank_factor=4).collect()]
    # int8 coarse + exact rerank: high-overlap approximation, identical head
    assert got[0] == exact[0]
    assert len(set(got) & set(exact)) >= 8
    # scores on the shared ids equal the exact scores (float rerank)
    ex = {r.vec_id: r.cos_sim for r in brute_force_topk(base, qv, 10).collect()}
    for r in int8_topk(base, qv, 10, rerank_factor=4).collect():
        if r.vec_id in ex:
            assert r.cos_sim == pytest.approx(ex[r.vec_id], rel=1e-12)
    with pytest.raises(ValueError, match="rerank_factor"):
        int8_topk(base, qv, 0)


def test_hard_negatives_semantics(spark):
    from searchengine_spark.textops.similarity import hard_negatives

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.99, 0.1], 0),   # same label: excluded
            (3, [0.9, 0.2], 1),    # different label: the hard negative
            (4, [-1.0, 0.0], 1),   # different label, far
            (5, [1.0, 0.01], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = [
        (r.anchor_id, r.vec_id)
        for r in hard_negatives(df, [1], k=2).collect()
    ]
    # nearest different-label first; same-label 2 and self 1 never appear
    assert rows == [(1, 5), (1, 3)]
    with pytest.raises(ValueError, match="not found"):
        hard_negatives(df, [99])
    with pytest.raises(ValueError, match="at least one"):
        hard_negatives(df, [])
    plan = (
        hard_negatives(df, [1, 3], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_temperature_quotas(spark):
    from searchengine_spark.textops.sampling import temperature_quotas

    df = spark.createDataFrame(
        [(f"d{i}", "big") for i in range(90)]
        + [(f"e{i}", "small") for i in range(10)],
        "doc_id string, lang string",
    )
    # alpha=1: natural proportions
    assert temperature_quotas(df, 50, 1.0) == {"big": 45, "small": 5}
    # alpha=0: uniform over labels
    assert temperature_quotas(df, 20, 0.0) == {"big": 10, "small": 10}
    # alpha=0.5 up-samples the small label vs natural share — here so far
    # past its population (raw 12.5 > 10) that the cap binds, and capped
    # capacity is NOT redistributed (documented)
    q = temperature_quotas(df, 50, 0.5)
    assert q == {"big": 38, "small": 10}
    # quotas never exceed the label population (capped, not redistributed)
    q = temperature_quotas(df, 120, 0.0)
    assert q == {"big": 60, "small": 10}
    with pytest.raises(ValueError, match="alpha"):
        temperature_quotas(df, 10, -1.0)
    with pytest.raises(ValueError, match="total"):
        temperature_quotas(df, -1)


# ---------------------------------------------------------------------------
# query DSL compiler
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dsl_setup(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "apple banana", "en", 10.0),
            ("d2", "apple", "en", 20.0),
            ("d3", "apple banana snake", "de", 30.0),
            ("d4", "banana", "en", 40.0),
        ],
        "doc_id string, text string, lang string, ts double",
    )
    idx = build_index(spark, docs.select("doc_id", "text"), cache=False)
    return idx, docs


def test_dsl_match_equals_bm25(spark, dsl_setup):
    from searchengine_spark.query.dsl import search_dsl

    idx, _ = dsl_setup
    got = [(r.doc_id, r.score) for r in
           search_dsl(idx, {"match": {"query": "apple banana"}}).collect()]
    want = [(r.doc_id, r.score) for r in
            idx.search_bm25("apple banana", None).collect()]
    assert got == want


def test_dsl_bool_with_filters(spark, dsl_setup):
    from searchengine_spark.query.dsl import search_dsl
    from searchengine_spark.query.ranked import search_bm25_boolean

    idx, docs = dsl_setup
    dsl = {
        "bool": {
            "must": [{"match": {"query": "apple"}}],
            "should": [{"match": {"query": "banana"}}],
            "must_not": [{"match": {"query": "snake"}}],
            "filter": [
                {"term": {"lang": "en"}},
                {"range": {"ts": {"gte": 5.0, "lt": 30.0}}},
            ],
        }
    }
    got = {r.doc_id: r.score for r in search_dsl(idx, dsl, meta=docs).collect()}
    # d3 fails lang+must_not, d4 fails must; d1/d2 survive with scores
    # equal to the UNfiltered boolean query (restriction semantics)
    base = {
        r.doc_id: r.score
        for r in search_bm25_boolean(
            idx, must=["apple"], should=["banana"], must_not=["snake"]
        ).collect()
    }
    assert got == {d: base[d] for d in ("d1", "d2")}


def test_dsl_boosting_and_function_score(spark, dsl_setup):
    from searchengine_spark.query.dsl import search_dsl
    from searchengine_spark.query.ranked import search_bm25_boosting

    idx, docs = dsl_setup
    dsl = {
        "boosting": {
            "positive": {"match": {"query": "apple"}},
            "negative": {"match": {"query": "snake"}},
            "negative_boost": 0.25,
        }
    }
    got = {r.doc_id: r.score for r in search_dsl(idx, dsl).collect()}
    want = {
        r.doc_id: r.score
        for r in search_bm25_boosting(idx, "apple", "snake", 0.25).collect()
    }
    assert got == want

    fs = {
        "function_score": {
            "query": {"match": {"query": "apple"}},
            "gauss": {"field": "ts", "origin": 10.0, "scale": 20.0,
                      "decay": 0.5},
        }
    }
    got = {r.doc_id: r.score for r in search_dsl(idx, fs, meta=docs).collect()}
    base = {r.doc_id: r.score for r in idx.search_bm25("apple", None).collect()}
    assert got["d1"] == pytest.approx(base["d1"], rel=1e-12)  # at origin
    # d3 at distance 20 == scale: multiplier is exactly decay
    assert got["d3"] == pytest.approx(base["d3"] * 0.5, rel=1e-9)


def test_dsl_errors(spark, dsl_setup):
    from searchengine_spark.query.dsl import DslError, search_dsl

    idx, docs = dsl_setup
    for bad in [
        {"fuzzy": {"query": "x"}},
        {"bool": {"mustt": []}},
        {"bool": {"filter": [{"range": {"ts": {"between": 1}}}]}},
        {"bool": {"filter": [{"bool": {}}]}},
        {"function_score": {"query": {"match": {"query": "x"}}}},
        {"function_score": {"query": {"match": {"query": "x"}},
                            "gauss": {"origin": 0, "scale": 1}}},
        {"boosting": {"positive": {"match": {"query": "x"}}}},  # no negative
    ]:
        with pytest.raises(DslError):
            search_dsl(idx, bad, meta=docs)
    # filter/function_score without meta
    with pytest.raises(DslError, match="meta"):
        search_dsl(idx, {"bool": {"must": [{"match": {"query": "apple"}}],
                                  "filter": [{"term": {"lang": "en"}}]}})


def test_pack_sequences_duplicate_order_col_is_total(spark):
    # duplicate order_col values (equal timestamps): the id tie-break in
    # the range keys + partition sort makes concatenation order TOTAL, so
    # offsets are reproducible run to run (without it, same-ts rows landed
    # in shuffle-arrival order and every downstream fragment moved)
    from searchengine_spark.textops.packing import pack_sequences

    df = spark.createDataFrame(
        [("b", 1, 3), ("a", 1, 2), ("c", 0, 2)],
        "doc_id string, ts int, n_tokens long",
    )
    out = pack_sequences(df, 4, order_col="ts")
    rows = [
        (r.seq_id, r.doc_id, r.doc_offset, r.seq_offset, r.frag_len)
        for r in out.orderBy("seq_id", "doc_id").collect()
    ]
    out.unpersist()
    # total order: c (ts=0), then a, b (ts=1 tie -> doc_id order)
    # intervals: c=[0,2) a=[2,4) b=[4,7); capacity 4
    assert rows == [
        (0, "a", 0, 2, 2),
        (0, "c", 0, 0, 2),
        (1, "b", 0, 0, 3),
    ]


def test_zero_norm_embeddings_excluded_not_crash(spark):
    # Spark 4 defaults to ANSI mode, where double division by zero THROWS:
    # one zero/padding embedding anywhere in the corpus must be excluded
    # from every cosine ranking, not abort the whole job
    from searchengine_spark.textops.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        hard_negatives,
        int8_topk,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 1), (3, [0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    emb = df.select("vec_id", "embedding")
    assert [r.vec_id for r in brute_force_topk(emb, [1.0, 0.0], 3).collect()] == [1, 2]
    assert [r.vec_id for r in int8_topk(emb, [1.0, 0.0], 3).collect()] == [1, 2]
    assert [
        (r.anchor_id, r.vec_id) for r in hard_negatives(df, [1], k=5).collect()
    ] == [(1, 2)]
    pairs = embedding_near_dup_pairs(emb, threshold=0.5, exact=True).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    # zero-norm on the QUERY side is a caller error, reported loudly
    with pytest.raises(ValueError, match="zero-norm"):
        brute_force_topk(emb, [0.0, 0.0], 3)
    with pytest.raises(ValueError, match="zero-norm"):
        int8_topk(emb, [0.0, 0.0], 3)
    with pytest.raises(ValueError, match="zero-norm anchor"):
        hard_negatives(df, [3], k=1)


def test_ltr_features_hand_computed(spark):
    # features over a 4-doc corpus, checked against the engine's own
    # single-query rankers plus hand arithmetic
    from searchengine_spark.index import build_index
    from searchengine_spark.query.ltr import ltr_features

    docs = spark.createDataFrame(
        [("1", "spark join hash table"), ("2", "spark spark merge"),
         ("3", "vector stream data"), ("4", "join hash join")],
        "doc_id string, text string",
    )
    idx = build_index(spark, docs, analyzer="punctuation")
    out = ltr_features(idx, {"qa": "spark join", "qb": "vector"}, k=3,
                       id_cast="long")
    rows = {(r.query_id, r.doc_id): r for r in out.collect()}
    # bm25_r identical to the single-query ranker's rounded scores
    ref = {r.doc_id: round(r.score, 4)
           for r in idx.search_bm25("spark join", None).collect()}
    for (qid, d), r in rows.items():
        if qid == "qa":
            assert r.bm25_r == ref[str(d)]
    # doc 1 matches both qa terms; docs 2/4 match one of two
    assert rows[("qa", 1)].coverage_r == 1.0
    assert rows[("qa", 2)].coverage_r == 0.5
    assert rows[("qa", 4)].tf_sum == 2  # 'join' twice
    assert rows[("qa", 1)].dl == 4
    # tfidf_r identical to the single-query TF-IDF ranker
    tref = {r.doc_id: round(r.score, 4)
            for r in idx.search_tfidf("spark join", None).collect()}
    for (qid, d), r in rows.items():
        if qid == "qa":
            assert r.tfidf_r == tref[str(d)]
    # judgments attach as label, unjudged candidates at 0
    j = spark.createDataFrame([("qa", 1, 2)],
                              "query_id string, doc_id long, grade int")
    lab = {r.doc_id: r.label
           for r in ltr_features(idx, {"qa": "spark join"}, k=3,
                                 id_cast="long", judgments=j).collect()}
    assert lab[1] == 2 and lab[2] == 0
    # empty inputs and no-match queries degrade to empty, k honored
    assert ltr_features(idx, {}, k=3).count() == 0
    assert ltr_features(idx, {"qz": "zzz"}, k=3).count() == 0
    assert ltr_features(idx, {"qa": "join"}, k=1).count() == 1
    # proximity feature: min distance between DIFFERENT-term occurrences,
    # NULL when < 2 distinct terms matched; other columns unchanged
    prox = {(r.query_id, r.doc_id): r for r in ltr_features(
        idx, {"qa": "spark join hash", "qb": "vector"}, k=3,
        id_cast="long", proximity=True).collect()}
    assert prox[("qa", 1)].min_pair_dist == 1   # spark@0 join@1 hash@2
    assert prox[("qa", 4)].min_pair_dist == 1   # join@0 hash@1 join@2
    assert prox[("qa", 2)].min_pair_dist is None  # only 'spark' matched
    assert prox[("qb", 3)].min_pair_dist is None  # single-term query
    # non-adjacent closest pair: 'spark ... hash' via doc 1 terms spark/hash
    sh = {(r.query_id, r.doc_id): r.min_pair_dist for r in ltr_features(
        idx, {"qs": "spark hash"}, k=3, id_cast="long",
        proximity=True).collect()}
    assert sh[("qs", 1)] == 2                   # spark@0 .. hash@2
    # plan: broadcast joins only, never a nested loop over the postings
    plan = (
        ltr_features(idx, {"qa": "spark join", "qb": "vector"}, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # proximity variant: still no cartesian, and the candidate restriction
    # reaches the positional branch as a broadcast semi-join (positions of
    # non-candidate docs never shuffle — the rescorer invariant)
    pplan = (
        ltr_features(idx, {"qa": "spark join", "qb": "vector"}, k=3,
                     proximity=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in pplan
    assert "LeftSemi, BuildRight" in pplan


def test_doc_vectors_hand_computed(spark):
    # corpus-wide sparse TF-IDF vectors agree with the per-doc mlt_terms
    # selection (same score, same tie-break), respect n_terms and deletes
    from searchengine_spark.index import build_index
    from searchengine_spark.query.morelike import doc_vectors, mlt_terms

    docs = spark.createDataFrame(
        [("1", "apple banana apple"), ("2", "banana cherry"), ("3", "cherry")],
        "doc_id string, text string",
    )
    idx = build_index(spark, docs, analyzer="punctuation")
    out = doc_vectors(idx, n_terms=2)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.weight_r))
    # per-doc term order matches the driver-side mlt_terms selection
    for d in ("1", "2", "3"):
        assert [t for _, t, _ in sorted(got[d])] == mlt_terms(idx, d, 2)
    # doc 1: apple tf=2 beats banana tf=1 (same idf class ordering)
    assert got["1"][0][1] == "apple"
    import math
    # apple: tf=2 in doc 1, df=1 across 3 docs -> 2 * log10(3/1 + 1)
    w_apple = round(2 * math.log10(3 / 1 + 1), 6)
    assert got["1"][0][2] == w_apple
    with __import__("pytest").raises(ValueError, match="n_terms"):
        doc_vectors(idx, 0)
    # tombstoned docs drop out
    idx.delete_documents("cherry")
    left = {r.doc_id for r in doc_vectors(idx, 2).collect()}
    assert left == {"1"}


def test_training_triplets_hand_computed(spark):
    from searchengine_spark.textops.similarity import training_triplets

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),    # same label, very close
            (3, [0.0, 1.0], 0),    # same label, orthogonal -> hardest pos
            (4, [0.95, 0.05], 1),  # diff label, closest -> hardest neg
            (5, [-1.0, 0.0], 1),   # diff label, far
            (6, [0.0, 0.0], 1),    # zero vector: excluded everywhere
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = [
        (r.anchor_id, r.pos_id, r.neg_id)
        for r in training_triplets(df, [1], k=2).collect()
    ]
    # pos = 3 (lowest same-label cosine); negs = 4 then 5; 6 never appears
    assert rows == [(1, 3, 4), (1, 3, 5)]
    # anchor with no same-label partner yields nothing
    only = spark.createDataFrame(
        [(7, [1.0, 0.0], 9), (8, [0.5, 0.5], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    assert training_triplets(only, [7], k=2).count() == 0
    with pytest.raises(ValueError, match="not found"):
        training_triplets(df, [99])
