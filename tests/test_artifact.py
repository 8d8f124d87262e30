"""Persisted artifact: block codec roundtrip, build/load parity, WAND
exactness, checkpoint/resume, compaction, metrics + lineage, compression.

Mirrors the reference's index-content tests (``Team18FlushTest.java:30-55``,
merge tests ``Team10MergeTest.java:20-114``) and compression-effectiveness
test (``Team5IndexCompressionTest.java:76,122``) against the Spark artifact.
"""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark.codec import varbyte
from searchengine_spark.fixtures import doc_key_col, transcripts_df
from searchengine_spark.index import build_index
from searchengine_spark.index.artifact import (
    build_artifact,
    compact,
    latest_snapshot,
    load_artifact,
)
from searchengine_spark.index.blocks import pack_term_run, unpack_block
from searchengine_spark.index.ordinals import assign_doc_ordinals, segment_base


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        transcripts_df(spark, "tiny")
        .withColumn("doc_id", doc_key_col())
        .select("doc_id", "text")
    )


@pytest.fixture(scope="module")
def lidx(spark, corpus):
    return build_index(spark, corpus, cache=True)


@pytest.fixture(scope="module")
def aidx(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("art") / "idx")
    return build_artifact(
        spark, corpus, path, n_segments=2, source_desc="tiny fixture"
    )


# ---------------------------------------------------------------------------
# block codec (no Spark)
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip():
    base = segment_base(3)  # exercise large ordinal bases (the 2^40 regression)
    ords = np.array([base + 1, base + 5, base + 6, base + 300], dtype=np.int64)
    tfs = np.array([1, 3, 2, 7], dtype=np.int64)
    dls = np.array([10, 20, 15, 9], dtype=np.int64)
    pos = [[0], [1, 4, 9], [2, 3], [0, 1, 2, 3, 4, 5, 6]]
    rows = pack_term_run("t", ords, tfs, dls, pos, block_size=3)
    assert [r["n"] for r in rows] == [3, 1]
    assert rows[0]["max_tf"] == 3 and rows[0]["min_dl"] == 10
    assert rows[1]["first_ord"] == base + 300
    got_ords, got_tfs, got_dls, got_pos = [], [], [], []
    for r in rows:
        u = unpack_block(r)
        got_ords.extend(u["ords"])
        got_tfs.extend(u["tfs"])
        got_dls.extend(u["dls"])
        got_pos.extend([list(p) for p in u["pos"]])
    assert got_ords == list(ords) and got_tfs == list(tfs)
    assert got_dls == list(dls) and got_pos == pos


def test_score_front_exact_block_bound():
    """The stored (tf, dl) Pareto front yields the EXACT per-block max of
    the BM25 score part for any (k1, b, avgdl) — and is therefore always
    <= the (max_tf, min_dl) composite bound (tightness) and >= every
    posting's actual part (validity)."""
    import itertools

    from searchengine_spark.index.blocks import (
        bm25_part_upper_bound,
        score_front,
    )

    rng = np.random.default_rng(5)

    def part(tf, dl, k1, b, avgdl):
        return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    for trial in range(50):
        n = int(rng.integers(1, 129))
        tfs = rng.integers(1, 30, size=n).astype(np.int64)
        dls = rng.integers(1, 500, size=n).astype(np.int64)
        f_tfs, f_dls = score_front(tfs, dls)
        assert len(f_tfs) == len(f_dls) >= 1
        for k1, b, avgdl in itertools.product(
            (0.5, 1.2, 2.0), (0.0, 0.4, 0.75, 1.0), (3.0, 80.0, 1e4)
        ):
            exact = max(part(t, d, k1, b, avgdl) for t, d in zip(tfs, dls))
            front = max(part(t, d, k1, b, avgdl) for t, d in zip(f_tfs, f_dls))
            comp = bm25_part_upper_bound(tfs.max(), dls.min(), k1, b, avgdl)
            if len(f_tfs) == 1 and (f_tfs[0], f_dls[0]) == (
                tfs.max(),
                dls.min(),
            ):
                # capped/collapsed front: valid upper bound, not exact
                assert front >= exact - 1e-12
            else:
                assert abs(front - exact) < 1e-12
            assert front <= comp + 1e-12


def test_wand_front_bound_prunes_more_than_composite(spark, tmp_path):
    """The Pareto-front bound must (a) keep WAND exact and (b) prune
    strictly MORE blocks than the (max_tf, min_dl) composite on a corpus
    with anti-correlated tf/dl — high-tf postings living in long docs.
    There the composite crosses max_tf with another posting's min_dl into
    an infeasible high bound, while the front bound sees the block's true
    (low) max score part and drops it below θ."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from searchengine_spark.query.ranked import _query_weights, bm25_idf
    from searchengine_spark.query.wand import _score_blocks

    rows = []
    # blocks 0-1 (doc_ids a****): heavy docs — "target" x8 in 400-token
    # docs — interleaved with light matches in medium docs. Their true max
    # score part is LOW (length-normalized away), but max_tf=8 with a
    # neighbor's small dl makes the composite bound high.
    for i in range(256):
        if i % 2 == 0:
            filler = " ".join(f"fill{i}w{j}" for j in range(397))
            rows.append((f"a{i:04d}", ("target " * 3) + filler))
        else:
            filler = " ".join(f"fill{i}w{j}" for j in range(40 + (i % 11)))
            rows.append((f"a{i:04d}", "target " + filler))
    # blocks 2-3 (doc_ids z****): short docs with one "target" — the top
    # scorers that set θ (varying dl => distinct scores, no tie plateau)
    for i in range(256):
        filler = " ".join(f"zfill{i}w{j}" for j in range(11 + (i % 30)))
        rows.append((f"z{i:04d}", "target " + filler))
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    path = str(tmp_path / "frontidx")
    aidx = build_artifact(spark, corpus, path, analyzer="punctuation")

    k = 20
    # exactness first: WAND == logical on the same corpus
    lidx = build_index(spark, corpus, analyzer="punctuation", cache=False)
    a = [(r["doc_id"], round(r["score"], 9)) for r in aidx.search_bm25("target", k).collect()]
    l = [(r["doc_id"], round(r["score"], 9)) for r in lidx.search_bm25("target", k).collect()]
    assert a == l

    # replay the prune decision under both bounds at the same θ
    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1 + 1.0) / (
            t + k1 * (1.0 - b + b * dl.cast("double") / F.lit(avgdl))
        )

    weights = _query_weights(aidx, "target", bm25_idf)
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    mtf = F.col("max_tf").cast("double")
    comp = mtf * (k1 + 1.0) / (
        mtf + k1 * (1.0 - b + b * F.col("min_dl") / F.lit(avgdl))
    )
    cand = (
        aidx.blocks_for_terms([w[0] for w in weights])
        .join(F.broadcast(qdf), "term")
        .withColumn("ubf", F.col("qtf") * F.col("idf") * F.array_max(
            F.zip_with("ub_tfs", "ub_dls", part)))
        .withColumn("ubo", F.col("qtf") * F.col("idf") * comp)
        .persist()
    )
    n_seed = math.ceil(k / aidx.block_size) + 1
    w = Window.partitionBy("term").orderBy(
        F.desc("ubf"), F.asc("first_ord"), F.asc("block_seq")
    )
    seed = cand.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= n_seed
    )
    top = (
        _score_blocks(aidx, seed, qdf).orderBy(F.desc("score")).limit(k).collect()
    )
    assert len(top) >= k
    theta = min(r["score"] for r in top)
    # single term => "others" budget is 0: prune test is ub >= θ directly
    kept_front = cand.where(F.col("ubf") >= theta).count()
    kept_comp = cand.where(F.col("ubo") >= theta).count()
    n_cand = cand.count()
    cand.unpersist()
    assert kept_front <= kept_comp  # front is never looser
    assert kept_front < kept_comp, (
        f"front bound should prune strictly more: cand={n_cand} "
        f"front={kept_front} comp={kept_comp} theta={theta}"
    )


def test_wand_aligned_others_prunes_and_stays_exact(
    spark, tmp_path, monkeypatch
):
    """Block-aligned others (true BMW): on a corpus where the two query
    terms cluster in DIFFERENT doc_id regions (ordinals follow doc_id, so
    term blocks are ordinal-local), the aligned bound must (a) keep WAND
    bit-identical to the logical path and (b) prune blocks the global
    others bound keeps. Region A is pure-alpha (long docs, low parts),
    region B pure-beta including a few high-tf short docs that push beta's
    GLOBAL max ub above θ (so the global bound keeps every alpha block),
    region C holds the true top scorers (both terms): aligned others for
    region-A alpha blocks is ~0 (no beta block shares their buckets), so
    they prune; C blocks share buckets with both terms and survive — as
    admissibility requires, since they contain the top-k docs."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from searchengine_spark.query import wand
    from searchengine_spark.query.ranked import _query_weights, bm25_idf
    from searchengine_spark.query.wand import _aligned_keep, _score_blocks

    rows = []
    for i in range(1500):  # region A: alpha-only, long docs
        filler = " ".join(f"af{i}w{j}" for j in range(150))
        rows.append((f"a{i:05d}", "alpha " + filler))
    for i in range(1500):  # region B: beta-only, long docs
        filler = " ".join(f"bf{i}w{j}" for j in range(150))
        rows.append((f"b{i:05d}", "beta " + filler))
    for i in range(40):  # region B hot-beta: raises beta's global max ub
        filler = " ".join(f"bh{i}w{j}" for j in range(12))
        rows.append((f"bzz{i:04d}", ("beta " * 8) + filler))
    for i in range(100):  # region C: both terms — the true top-k docs
        filler = " ".join(f"cf{i}w{j}" for j in range(46 + i % 5))
        rows.append((f"c{i:05d}", "alpha beta " + filler))
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    path = str(tmp_path / "alignidx")
    aidx = build_artifact(spark, corpus, path, analyzer="punctuation")
    lidx = build_index(spark, corpus, analyzer="punctuation", cache=False)

    k = 10
    monkeypatch.setattr(wand, "_ALIGNED_MIN_BLOCKS", 1)
    a = [
        (r["doc_id"], round(r["score"], 9))
        for r in aidx.search_bm25("alpha beta", k).collect()
    ]
    l = [
        (r["doc_id"], round(r["score"], 9))
        for r in lidx.search_bm25("alpha beta", k).collect()
    ]
    assert a == l
    assert all(d.startswith("c") for d, _ in a)

    # replay the prune decision: aligned must drop blocks global keeps
    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1 + 1.0) / (
            t + k1 * (1.0 - b + b * dl.cast("double") / F.lit(avgdl))
        )

    weights = _query_weights(aidx, "alpha beta", bm25_idf)
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    cand = (
        aidx.blocks_for_terms([w[0] for w in weights])
        .join(F.broadcast(qdf), "term")
        .withColumn(
            "ub",
            F.col("qtf") * F.col("idf")
            * F.array_max(F.zip_with("ub_tfs", "ub_dls", part)),
        )
        .withColumn("bid", F.concat_ws("#", "seg", "block_seq", "term"))
        .persist()
    )
    stats = cand.groupBy("term").agg(
        F.max("ub").alias("m"),
        F.expr("approx_percentile(last_ord - first_ord + 1, 0.5)").alias("ms"),
    ).collect()
    g = {r["term"]: r["m"] for r in stats}
    total_ub = sum(g.values())
    med_span = min(r["ms"] for r in stats)
    n_seed = math.ceil(k / aidx.block_size) + 1
    w = Window.partitionBy("term").orderBy(
        F.desc("ub"), F.asc("first_ord"), F.asc("block_seq")
    )
    seed = cand.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= n_seed
    )
    top = (
        _score_blocks(aidx, seed, qdf)
        .orderBy(F.desc("score")).limit(k).collect()
    )
    assert len(top) >= k
    theta = min(r["score"] for r in top)

    others = spark.createDataFrame(
        [(t, total_ub - g[t]) for t in g], "term string, others double"
    )
    kept_global = cand.join(F.broadcast(others), "term").where(
        F.col("ub") + F.col("others") >= theta
    ).count()
    kept_aligned = _aligned_keep(
        spark, cand, g, total_ub, theta, med_span
    ).count()
    n_cand = cand.count()

    # driver-side pandas twin must produce the IDENTICAL keep set
    from searchengine_spark.query.wand import (
        _aligned_keep_bids,
        _aligned_keep_ids,
        _block_buckets,
        _bucket_wlog,
        _wide_max,
        _wide_max_pd,
    )

    meta = _block_buckets(cand, _bucket_wlog(med_span))
    mpd = meta.toPandas()
    keep_driver = _aligned_keep_bids(
        mpd, g, total_ub, theta, _wide_max_pd(mpd, g)
    )
    keep_dist = {
        r["bid"]
        for r in _aligned_keep_ids(
            spark, meta, g, total_ub, theta, _wide_max(meta, g)
        ).collect()
    }
    cand.unpersist()
    assert keep_driver == keep_dist
    assert kept_aligned <= kept_global  # aligned is never looser
    assert kept_aligned < kept_global, (
        f"aligned others should prune strictly more: cand={n_cand} "
        f"aligned={kept_aligned} global={kept_global} theta={theta}"
    )


def test_wand_necessary_term_gating_exact_and_prunes(
    spark, tmp_path, monkeypatch
):
    """Necessary-term gating (the WAND pivot-skip): a rare high-idf term
    ("needle") dominates θ while the ubiquitous term ("hay") has max ub ≪ θ,
    so S = {needle} and every hay block sharing no bucket with a needle
    posting must be dropped whole. The needle postings sit at BOTH ends of
    the ordinal range, so needle's single block is WIDE — a span-based
    bucket set would cover every bucket and prune nothing; the exact-decode
    branch (the risky code) recovers just the two edge buckets. Exactness:
    gating only drops blocks that cannot contain a ≥θ doc, so results stay
    bit-identical to the logical path."""
    from pyspark.sql import functions as F

    from searchengine_spark.query import wand
    from searchengine_spark.query.ranked import _query_weights, bm25_idf
    from searchengine_spark.query.wand import (
        _block_buckets,
        _bucket_wlog,
        _gate_keep_ids,
    )

    rows = []
    for i in range(3060):
        if i < 15 or i >= 3045:
            # needle docs: short (high BM25 partial → the true top-k),
            # slightly varying length to avoid mass ties
            filler = " ".join(f"nf{i}w{j}" for j in range(8 + i % 5))
            rows.append((f"d{i:05d}", "needle hay " + filler))
        else:
            filler = " ".join(f"hf{i}w{j}" for j in range(150))
            rows.append((f"d{i:05d}", "hay " + filler))
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    path = str(tmp_path / "gateidx")
    aidx = build_artifact(spark, corpus, path, analyzer="punctuation")
    lidx = build_index(spark, corpus, analyzer="punctuation", cache=False)

    k = 10
    monkeypatch.setattr(wand, "_ALIGNED_MIN_BLOCKS", 1)
    a = [
        (r["doc_id"], round(r["score"], 9))
        for r in aidx.search_bm25("needle hay", k).collect()
    ]
    l_rows = lidx.search_bm25("needle hay", k).collect()
    l = [(r["doc_id"], round(r["score"], 9)) for r in l_rows]
    assert a == l
    assert len(a) == k

    # replay the gate decision at the true k-th score (max admissible θ)
    k1v, bv = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1v + 1.0) / (
            t + k1v * (1.0 - bv + bv * dl.cast("double") / F.lit(avgdl))
        )

    weights = _query_weights(aidx, "needle hay", bm25_idf)
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    cand = (
        aidx.blocks_for_terms([w[0] for w in weights])
        .join(F.broadcast(qdf), "term")
        .withColumn(
            "ub",
            F.col("qtf") * F.col("idf")
            * F.array_max(F.zip_with("ub_tfs", "ub_dls", part)),
        )
        .withColumn("bid", F.concat_ws("#", "seg", "block_seq", "term"))
        .persist()
    )
    stats = cand.groupBy("term").agg(
        F.max("ub").alias("m"),
        F.expr("approx_percentile(last_ord - first_ord + 1, 0.5)").alias(
            "ms"
        ),
    ).collect()
    g = {r["term"]: r["m"] for r in stats}
    med_span = min(r["ms"] for r in stats)
    wlog = _bucket_wlog(med_span)
    meta = _block_buckets(cand, wlog)
    needle_term = max(g, key=g.get)
    theta = min(r["score"] for r in l_rows)
    assert g[needle_term] >= theta > min(g.values())  # S = {needle} setup

    gate = _gate_keep_ids(spark, aidx, cand, meta, g, theta, wlog)
    assert gate is not None, "gating must apply on this corpus"
    n_cand = cand.count()
    n_kept = gate.count()
    # the wide-decode branch must have run (needle's block spans the range)
    assert (
        meta.where((F.col("term") == needle_term) & ~F.col("narrow")).count()
        >= 1
    )
    # every S-term block is kept (gating never drops the necessary terms)
    n_needle = meta.where(F.col("term") == needle_term).count()
    kept_needle = (
        meta.join(gate, "bid", "left_semi")
        .where(F.col("term") == needle_term)
        .count()
    )

    # driver-side gate twin (incl. the wide-decode branch) must produce
    # the IDENTICAL keep set
    from searchengine_spark.query.wand import _gate_keep_bids

    gate_driver = _gate_keep_bids(
        spark, aidx, cand, meta.toPandas(), g, theta, wlog
    )
    gate_dist = {r["bid"] for r in gate.collect()}
    cand.unpersist()
    assert gate_driver == gate_dist
    assert kept_needle == n_needle
    assert n_kept <= n_cand - 15, (
        f"gating should drop the needle-free hay blocks wholesale: "
        f"cand={n_cand} kept={n_kept} theta={theta}"
    )


def test_wand_randomized_differential(spark, tmp_path, monkeypatch):
    """Randomized differential exactness for the full pruning stack: on
    random corpora with CLUSTERED term placement (each term concentrates
    around a random doc-id center, so ordinal-aligned bounds really prune
    — uniform corpora only exercise the keep-everything fallback), every
    artifact WAND result must be bit-identical to the logical index, with
    the seed+prune and aligned+gating paths forced on by dropping their
    size thresholds."""
    import numpy as np

    from searchengine_spark.query import wand

    monkeypatch.setattr(wand, "_SMALL_QUERY_BLOCKS", 0)
    monkeypatch.setattr(wand, "_ALIGNED_MIN_BLOCKS", 1)

    for seed in (7, 23):
        rng = np.random.default_rng(seed)
        n_docs = 1500
        vocab = [f"t{seed}w{v:03d}" for v in range(40)]
        centers = rng.integers(0, n_docs, size=len(vocab))
        widths = rng.integers(30, n_docs // 2, size=len(vocab))
        rows = []
        for i in range(n_docs):
            toks = []
            for v, term in enumerate(vocab):
                if abs(i - int(centers[v])) < int(widths[v]) and (
                    rng.random() < 0.35
                ):
                    toks.extend([term] * int(rng.integers(1, 4)))
            toks.extend(
                f"f{seed}d{i}x{j}" for j in range(int(rng.integers(3, 40)))
            )
            rows.append((f"d{i:05d}", " ".join(toks)))
        corpus = spark.createDataFrame(rows, "doc_id string, text string")
        path = str(tmp_path / f"rnd{seed}")
        aidx = build_artifact(spark, corpus, path, analyzer="punctuation")
        lidx = build_index(spark, corpus, analyzer="punctuation", cache=False)
        for qi in range(4):
            nt = int(rng.integers(2, 5))
            q = " ".join(rng.choice(vocab, size=nt, replace=False))
            k = int(rng.integers(3, 25))
            # first query per corpus also forces the DISTRIBUTED keep
            # plan (driver cap 0); the rest take the driver-side path
            monkeypatch.setattr(
                wand, "_DRIVER_PRUNE_MAX_BLOCKS", 0 if qi == 0 else 262144
            )
            a = [
                (r["doc_id"], round(r["score"], 9))
                for r in aidx.search_bm25(q, k).collect()
            ]
            l = [
                (r["doc_id"], round(r["score"], 9))
                for r in lidx.search_bm25(q, k).collect()
            ]
            assert a == l, (seed, q, k)


def test_subcompact_crash_before_commit_invisible_and_gced(
    spark, corpus, tmp_path, monkeypatch
):
    """Iceberg-style atomicity: if subcompact crashes AFTER writing the new
    segment's files but BEFORE committing the snapshot, readers still see
    the old snapshot exactly, and expire_snapshots removes the orphaned
    segment directory."""
    import os

    from searchengine_spark.index import artifact as art

    path = str(tmp_path / "crash_idx")
    a = corpus.where("doc_id < 'conv-00000010'")
    b = corpus.where("doc_id >= 'conv-00000010'")
    build_artifact(spark, a.select("doc_id", "text"), path)
    art.append_segment(spark, b.select("doc_id", "text"), path)
    before = latest_snapshot(path)
    seg_dirs_before = set(os.listdir(os.path.join(path, "blocks")))

    real_commit = art._commit_snapshot

    def boom(p, snap):
        raise RuntimeError("simulated crash before snapshot commit")

    monkeypatch.setattr(art, "_commit_snapshot", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        art.subcompact(spark, path, [0, 1])
    monkeypatch.setattr(art, "_commit_snapshot", real_commit)

    # reader view is byte-identical to the pre-crash snapshot...
    assert latest_snapshot(path) == before
    reloaded = load_artifact(spark, path)
    assert {s["segment_id"] for s in reloaded.snapshot["segments"]} == {0, 1}
    # ...even though orphan files exist on disk
    orphans = set(os.listdir(os.path.join(path, "blocks"))) - seg_dirs_before
    assert orphans, "crash test is vacuous: no orphan segment was written"
    # physical GC removes the orphans; live segments survive
    art.expire_snapshots(path, keep_last=1)
    after = set(os.listdir(os.path.join(path, "blocks")))
    assert after == seg_dirs_before
    # and the artifact still answers queries
    assert reloaded.search_bm25("spark shuffle error", 5).count() == 5


def test_varbyte_large_values_roundtrip():
    vals = [0, 1, 2**31 - 1, 2**40, 2**40 + 7, 2**62]
    assert list(varbyte.decode(varbyte.encode(vals))) == vals


def test_varbyte_overflow_guard():
    # beyond-int64 inputs must fail loudly, never silently truncate
    with pytest.raises((ValueError, OverflowError)):
        varbyte.encode_plain([1 << 70])


# ---------------------------------------------------------------------------
# ordinals
# ---------------------------------------------------------------------------


def test_ordinals_dense_and_ordered(spark, corpus):
    from pyspark.sql import functions as F

    docs = corpus.select("doc_id").withColumn("dl", F.lit(1))
    out = assign_doc_ordinals(docs, base=100).orderBy("doc_id").collect()
    n = len(out)
    assert [r["doc_ord"] for r in out] == list(range(100, 100 + n))
    assert [r["doc_id"] for r in out] == sorted(r["doc_id"] for r in out)
    out_df = assign_doc_ordinals(docs, base=100)
    out_df.unpersist()


# ---------------------------------------------------------------------------
# artifact parity with the logical index
# ---------------------------------------------------------------------------


def test_artifact_postings_identical(lidx, aidx):
    lp = sorted(
        (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]))
        for r in lidx.postings.collect()
    )
    ap = sorted(
        (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]))
        for r in aidx.postings.collect()
    )
    assert lp == ap


def test_artifact_stats_match(lidx, aidx):
    ls = {r["term"]: (r["df"], r["cf"]) for r in lidx.term_stats.collect()}
    as_ = {r["term"]: (r["df"], r["cf"]) for r in aidx.term_stats.collect()}
    assert ls == as_
    assert aidx.n_docs == lidx.n_docs
    assert aidx.avgdl == pytest.approx(lidx.avgdl)


WAND_QUERIES = [
    "spark shuffle error",
    "elizabeth pride prejudice",
    "function error timeout retry",
    "zqmarkeralpha",
]


@pytest.mark.parametrize("q", WAND_QUERIES)
def test_wand_rank_identical_to_logical(lidx, aidx, q):
    l = [(r["doc_id"], r["score"]) for r in lidx.search_bm25(q, 10).collect()]
    w = [(r["doc_id"], r["score"]) for r in aidx.search_bm25(q, 10).collect()]
    assert [d for d, _ in l] == [d for d, _ in w]
    assert np.allclose([s for _, s in l], [s for _, s in w], rtol=0, atol=1e-12)


def test_bm25_batch_over_artifact_matches_wand(lidx, aidx):
    """The inherited search_bm25_batch decodes only the union-term blocks;
    per query_id it must match both the logical batch and the per-query
    WAND path bit-identically."""
    queries = {f"w{i}": q for i, q in enumerate(WAND_QUERIES)}
    ab = aidx.search_bm25_batch(queries, 10).collect()
    lb = lidx.search_bm25_batch(queries, 10).collect()
    key = lambda r: (r["query_id"], r["doc_id"], r["score"])  # noqa: E731
    assert sorted(map(key, ab)) == sorted(map(key, lb))
    for qid, q in queries.items():
        got = [(r["doc_id"], r["score"]) for r in ab if r["query_id"] == qid]
        want = [
            (r["doc_id"], r["score"]) for r in aidx.search_bm25(q, 10).collect()
        ]
        assert got == want, f"{qid}: artifact batch != per-query WAND"


def test_wand_exhaustive_modes_agree(aidx):
    q = "spark shuffle error"
    wand = [(r["doc_id"], round(r["score"], 10))
            for r in aidx.search_bm25(q, 5, mode="wand").collect()]
    exh = [(r["doc_id"], round(r["score"], 10))
           for r in aidx.search_bm25(q, None, mode="exhaustive").collect()[:5]]
    assert wand == exh


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_wand_scoring_plan_has_no_doc_table_scan(spark, aidx):
    """The scale contract of the restructured WAND path: scoring operates in
    ordinal space and must NOT scan the corpus-sized docs table — doc_id
    recovery happens after the top-k cut via a point lookup (at 10^12 docs a
    per-query doc-table join is the bottleneck)."""
    from searchengine_spark.query import wand
    from searchengine_spark.query.ranked import _query_weights, bm25_idf

    weights = _query_weights(aidx, "spark shuffle error", bm25_idf)
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    scored = wand._score_blocks(
        aidx, aidx.blocks_for_terms([t for t, _, _ in weights]), qdf
    )
    plan = _plan_of(scored)
    assert "/docs" not in plan, "doc-table scan leaked into WAND scoring plan"
    assert "/blocks" in plan  # sanity: it is reading the block artifact


def test_phrase_candidate_scan_prunes_position_bytes(
    spark, aidx, lidx, monkeypatch
):
    """Phrase search's phase-1 candidate pass must scan the block files
    WITHOUT the pos column (the dominant bytes of a positional index), and
    the two-phase plan must return exactly the logical path's results."""
    from searchengine_spark.query import phrase as ph

    nopos = aidx.postings_for_terms(["spark", "error"], positional=False)
    plan = _plan_of(nopos)
    assert "/blocks" in plan
    assert "pos:binary" not in plan, "position bytes leak into nopos scan"
    withpos = aidx.postings_for_terms(["spark", "error"])
    assert "pos:binary" in _plan_of(withpos)  # sanity: default reads them
    # force the two-phase path on the tiny fixture (real gate is df-based)
    monkeypatch.setattr(ph, "_TWO_PHASE_MIN_DF", 0)
    for q in ("spark shuffle", "merge sort algorithm", "spark spark"):
        a = sorted(r["doc_id"] for r in aidx.search_phrase(q).collect())
        l = sorted(r["doc_id"] for r in lidx.search_phrase(q).collect())
        assert a == l
    # and the small-query gate keeps the single-pass plan
    monkeypatch.setattr(ph, "_TWO_PHASE_MIN_DF", 1 << 60)
    a = sorted(r["doc_id"] for r in aidx.search_phrase("spark shuffle").collect())
    l = sorted(r["doc_id"] for r in lidx.search_phrase("spark shuffle").collect())
    assert a == l


def test_docs_for_ordinals_pushes_filters(aidx):
    """Hydration point lookup: seg partition filter (directory pruning) and
    doc_ord IN (row-group pruning) must reach the parquet scan."""
    some = [r["doc_ord"] for r in aidx.docs_tbl.limit(3).collect()]
    plan = _plan_of(aidx.docs_for_ordinals(some))
    assert "PushedFilters" in plan and "doc_ord" in plan
    assert "PartitionFilters" in plan and "seg" in plan


def test_bm25_batch_plan_shape(aidx):
    """Pin the session-17 serving-plan lessons (BENCH.md + CLAUDE.md):

    1. scoring is groupBy-then-window — the aggregate's exchange hashes
       on (query_id, doc_ord), NOT on a coarse (query_id, _salt) key
       (the single-exchange variant measured 15% slower at 5.5M turns);
    2. the post-hydration tail collapses to ONE partition, so the final
       cut and result ordering add NO rangepartitioning exchange (no
       range-boundary sampling job);
    3. Spark 4's WindowGroupLimit pushdown is active on the phase-1 cut
       (the reason the second scoring exchange is nearly free — only
       per-map-partition top-k survivors re-shuffle).

    >= 2 queries: a single-query batch constant-folds query_id and
    degenerates the window partitioning (CLAUDE.md)."""
    df = aidx.search_bm25_batch(
        {"a": "spark shuffle error", "b": "merge sort algorithm"}, k=5
    )
    plan = _plan_of(df)
    low = plan.lower()
    assert "rangepartitioning" not in low, "range-sampling tail reappeared"
    assert "singlepartition" in low, "single-task tail exchange missing"
    assert "hashpartitioning(query_id" in low and "doc_ord" in low, (
        "scoring exchange no longer clustered on (query_id, doc_ord)"
    )
    assert "windowgrouplimit" in low, "WindowGroupLimit pushdown inactive"
    # and the plan still never scans the corpus docs table pre-cut more
    # than the single post-cut hydration join requires
    assert low.count("/docs") <= plan.count("/blocks")


def test_boolean_phrase_over_artifact(lidx, aidx):
    assert (
        sorted(r["doc_id"] for r in aidx.search_and("error function").collect())
        == sorted(r["doc_id"] for r in lidx.search_and("error function").collect())
    )
    assert (
        sorted(r["doc_id"] for r in aidx.search_phrase("merge sort algorithm").collect())
        == sorted(r["doc_id"] for r in lidx.search_phrase("merge sort algorithm").collect())
    )


# ---------------------------------------------------------------------------
# snapshots: resume, metrics, lineage, compaction
# ---------------------------------------------------------------------------


def test_snapshot_metrics_and_lineage(aidx):
    snap = aidx.snapshot
    assert snap["snapshot_id"] == 2 and len(snap["segments"]) == 2
    for seg in snap["segments"]:
        assert seg["n_postings"] > 0 and seg["n_blocks"] > 0 and seg["bytes"] > 0
        assert seg["partitions"], "per-partition metrics missing"
        assert sum(p["postings"] for p in seg["partitions"]) == seg["n_postings"]
        assert "filter" in seg["lineage"]
    assert sum(s["n_docs"] for s in snap["segments"]) == aidx.n_docs


def test_resume_after_crash(spark, corpus, lidx, tmp_path):
    path = str(tmp_path / "resume_idx")
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_artifact(
            spark, corpus, path, n_segments=3, fail_after_segments=1
        )
    snap = latest_snapshot(path)
    assert snap["snapshot_id"] == 1 and len(snap["segments"]) == 1
    # partial artifact is loadable (last committed snapshot)
    partial = load_artifact(spark, path)
    assert partial.n_docs == snap["segments"][0]["n_docs"]
    # resume completes only the remaining segments
    full = build_artifact(spark, corpus, path, n_segments=3)
    assert {s["segment_id"] for s in full.snapshot["segments"]} == {0, 1, 2}
    assert full.n_docs == lidx.n_docs
    l = [r["doc_id"] for r in lidx.search_bm25("spark shuffle error", 5).collect()]
    a = [r["doc_id"] for r in full.search_bm25("spark shuffle error", 5).collect()]
    assert l == a


def test_resume_config_mismatch_rejected(spark, corpus, aidx):
    with pytest.raises(ValueError, match="different config"):
        build_artifact(
            spark, corpus, aidx.path, n_segments=2, analyzer="punctuation"
        )


def test_compact_preserves_results(spark, lidx, aidx, tmp_path):
    cidx = compact(spark, aidx.path, str(tmp_path / "compacted"))
    assert len(cidx.snapshot["segments"]) == 1
    assert cidx.n_docs == aidx.n_docs
    l = [(r["doc_id"], round(r["score"], 10))
         for r in lidx.search_bm25("elizabeth pride prejudice", 10).collect()]
    c = [(r["doc_id"], round(r["score"], 10))
         for r in cidx.search_bm25("elizabeth pride prejudice", 10).collect()]
    assert l == c


def test_subcompact_merges_subset_preserves_results(spark, corpus, tmp_path):
    """Streaming pattern: base segment + micro-segments; sub-compact only
    the micro-segments (the base is untouched). A pure merge must be
    bit-identical (scores, stats, doc counts); a merge after deletes purges
    merged-segment tombstones and keeps deleted docs invisible."""
    from searchengine_spark.index.artifact import subcompact

    path = str(tmp_path / "sub_idx")
    aidx = build_artifact(spark, corpus, path, n_segments=3)
    q = "spark shuffle error"
    before = [
        (r["doc_id"], round(r["score"], 10))
        for r in aidx.search_bm25(q, 10).collect()
    ]
    before_and = sorted(
        r["doc_id"] for r in aidx.search_and("error function").collect()
    )
    stats_before = {
        r["term"]: (r["df"], r["cf"]) for r in aidx.term_stats.collect()
    }

    merged = subcompact(spark, path, [1, 2])
    seg_ids = {s["segment_id"] for s in merged.snapshot["segments"]}
    assert seg_ids == {0, 3}, seg_ids
    assert merged.n_docs == aidx.n_docs
    after = [
        (r["doc_id"], round(r["score"], 10))
        for r in merged.search_bm25(q, 10).collect()
    ]
    assert after == before  # scores bit-identical: pure merge
    assert (
        sorted(r["doc_id"] for r in merged.search_and("error function").collect())
        == before_and
    )
    stats_after = {
        r["term"]: (r["df"], r["cf"]) for r in merged.term_stats.collect()
    }
    assert stats_after == stats_before

    # now with deletes: merge the remaining two segments, purging
    n_deleted = merged.delete_documents("checkpoint")
    assert n_deleted > 0
    merged2 = subcompact(spark, path, [0, 3])
    assert {s["segment_id"] for s in merged2.snapshot["segments"]} == {4}
    assert merged2.n_docs == aidx.n_docs - n_deleted  # physically purged
    assert merged2.search_keyword("checkpoint").count() == 0
    assert merged2.snapshot.get("tombstones") == []  # all purged, none left


def test_time_travel_and_expire_snapshots(spark, corpus, tmp_path):
    """Iceberg-role lifecycle: superseded segments stay readable via
    snapshot time travel until expire_snapshots GCs them, after which the
    latest snapshot still works and expired travel raises."""
    import os

    from searchengine_spark.index.artifact import expire_snapshots, subcompact

    path = str(tmp_path / "tt_idx")
    build_artifact(spark, corpus, path, n_segments=3)
    pre = load_artifact(spark, path)
    pre_snap_id = pre.snapshot["snapshot_id"]
    q = "spark shuffle error"
    before = [
        (r["doc_id"], round(r["score"], 10))
        for r in pre.search_bm25(q, 10).collect()
    ]
    subcompact(spark, path, [0, 1])
    # time travel: the pre-merge snapshot still reads the old segments
    old = load_artifact(spark, path, snapshot_id=pre_snap_id)
    assert {s["segment_id"] for s in old.snapshot["segments"]} == {0, 1, 2}
    travelled = [
        (r["doc_id"], round(r["score"], 10))
        for r in old.search_bm25(q, 10).collect()
    ]
    assert travelled == before
    # expire: only the latest snapshot survives; merged-away segs deleted
    stats = expire_snapshots(path, keep_last=1)
    assert stats["snapshots_removed"] >= 1
    assert stats["segments_removed"] == 2  # segs 0 and 1 folded into 3
    assert not os.path.isdir(os.path.join(path, "blocks", "seg=0"))
    latest = load_artifact(spark, path)
    after = [
        (r["doc_id"], round(r["score"], 10))
        for r in latest.search_bm25(q, 10).collect()
    ]
    assert after == before  # pure merge: results bit-identical
    with pytest.raises(FileNotFoundError, match="expired or never"):
        load_artifact(spark, path, snapshot_id=pre_snap_id)


def test_snapshot_tags_pin_and_resolve(spark, corpus, tmp_path):
    """Iceberg named refs: create_tag pins a snapshot against
    expire_snapshots and resolves via load_artifact(ref=...); remove_tag
    makes it expirable again."""
    import os

    from searchengine_spark.index.artifact import (
        create_tag,
        expire_snapshots,
        list_refs,
        remove_tag,
        subcompact,
    )

    path = str(tmp_path / "tag_idx")
    build_artifact(spark, corpus, path, n_segments=3)
    pre = load_artifact(spark, path)
    sid = create_tag(path, "v1")
    assert sid == pre.snapshot["snapshot_id"]
    assert list_refs(path) == {"v1": sid}
    q = "spark shuffle error"
    before = [
        (r["doc_id"], round(r["score"], 10))
        for r in pre.search_bm25(q, 10).collect()
    ]
    subcompact(spark, path, [0, 1])

    tagged = load_artifact(spark, path, ref="v1")
    assert {s["segment_id"] for s in tagged.snapshot["segments"]} == {0, 1, 2}
    got = [
        (r["doc_id"], round(r["score"], 10))
        for r in tagged.search_bm25(q, 10).collect()
    ]
    assert got == before

    with pytest.raises(ValueError, match="already points"):
        create_tag(path, "v1")
    with pytest.raises(FileNotFoundError):
        create_tag(path, "v2", snapshot_id=999)
    with pytest.raises(ValueError, match="not both"):
        load_artifact(spark, path, snapshot_id=sid, ref="v1")
    with pytest.raises(KeyError, match="unknown ref"):
        load_artifact(spark, path, ref="nope")

    # expiry keeps the tagged snapshot AND the segment files it lists
    # (the two mid-build checkpoint snapshots are unpinned and do expire)
    stats = expire_snapshots(path, keep_last=1)
    assert stats["snapshots_removed"] == 2
    assert stats["segments_removed"] == 0
    assert os.path.isdir(os.path.join(path, "blocks", "seg=0"))
    assert load_artifact(spark, path, ref="v1").search_bm25(q, 10).count() == 10

    # untag -> the old snapshot becomes expirable, files GC'd
    assert remove_tag(path, "v1") == sid
    with pytest.raises(KeyError, match="does not exist"):
        remove_tag(path, "v1")
    stats = expire_snapshots(path, keep_last=1)
    assert stats["snapshots_removed"] == 1
    assert stats["segments_removed"] == 2
    assert not os.path.isdir(os.path.join(path, "blocks", "seg=0"))
    with pytest.raises(KeyError, match="unknown ref"):
        load_artifact(spark, path, ref="v1")


def test_subcompact_rejects_bad_input(spark, corpus, tmp_path):
    from searchengine_spark.index.artifact import subcompact

    path = str(tmp_path / "sub_bad")
    build_artifact(spark, corpus, path, n_segments=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least two"):
        subcompact(spark, path, [0])
    with _pytest.raises(ValueError, match="unknown segment"):
        subcompact(spark, path, [0, 9])


def test_segment_dump_exact_contents(spark, tmp_path):
    """Reference Team18FlushTest style: tiny hand-written corpus -> build ->
    dump segment -> compare against hand-computed postings."""
    rows = [
        ("d1", "I am Happy Today!"),
        ("d2", "happy happy coding"),
        ("d3", "the of and"),  # analyzes to nothing, still a document
    ]
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    aidx = build_artifact(
        spark, corpus, str(tmp_path / "flush"), analyzer="punctuation"
    )
    seg = aidx.get_index_segment(0)
    assert seg["inverted_lists"] == {
        "happy": ["d1", "d2"],
        "today": ["d1"],
        "coding": ["d2"],
    }
    assert seg["positions"] == {
        ("happy", "d1"): [0],
        ("today", "d1"): [1],
        ("happy", "d2"): [0, 1],
        ("coding", "d2"): [2],
    }
    assert seg["documents"] == {"d1", "d2", "d3"}
    assert aidx.n_docs == 3  # zero-token doc counts toward N


def test_document_iterator(spark, tiny_corpus):
    from searchengine_spark.index import build_index

    idx = build_index(spark, tiny_corpus.select("doc_id", "text"), cache=False)
    it = list(idx.document_iterator())
    assert len(it) == idx.n_docs
    ids = [r["doc_id"] for r in it]
    assert ids == sorted(ids)


def test_nonpositional_fast_path_matches(spark, corpus, lidx, tmp_path):
    """positional=False (vectorized term-count UDF, no position lists) must
    give identical BM25/boolean results; phrase raises (reference parity
    with the non-positional index flag, InvertedIndexManager.java:234)."""
    aidx = build_artifact(
        spark, corpus, str(tmp_path / "np_idx"), positional=False
    )
    q = "spark shuffle error"
    l = [(r["doc_id"], round(r["score"], 10))
         for r in lidx.search_bm25(q, 10).collect()]
    a = [(r["doc_id"], round(r["score"], 10))
         for r in aidx.search_bm25(q, 10).collect()]
    assert l == a
    assert (
        sorted(r["doc_id"] for r in aidx.search_and("error function").collect())
        == sorted(r["doc_id"] for r in lidx.search_and("error function").collect())
    )
    with pytest.raises(ValueError, match="positional"):
        aidx.search_phrase("merge sort algorithm")


def test_compression_effective(aidx):
    """Reference Team5IndexCompressionTest: delta+varbyte must beat raw by
    >1.5x on posting ints (docids+tfs+dls vs 3 raw int32s per posting)."""
    total_bytes = sum(s["bytes"] for s in aidx.snapshot["segments"])
    n_postings = sum(s["n_postings"] for s in aidx.snapshot["segments"])
    # positional artifact: subtract position bytes for the docid comparison
    from pyspark.sql import functions as F

    nonpos = aidx.blocks.agg(
        F.sum(F.length("docs") + F.length("tfs") + F.length("dls")).alias("b")
    ).collect()[0]["b"]
    raw = 3 * 4 * n_postings
    assert raw > 1.5 * nonpos, f"compression ratio too low: {raw}/{nonpos}"


def test_segment_by_column(spark, corpus, lidx, tmp_path):
    """segment_col: one committed segment per distinct value (the
    date-partitioned-ingestion pattern); equality filters land in lineage
    and results match the one-shot logical build."""
    from pyspark.sql import functions as F

    with_day = corpus.withColumn(
        "day", F.concat(F.lit("d"), F.substring("doc_id", 12, 1))
    )
    aidx = build_artifact(
        spark, with_day, str(tmp_path / "bycol"), segment_col="day"
    )
    days = {r["day"] for r in with_day.select("day").distinct().collect()}
    assert len(aidx.snapshot["segments"]) == len(days)
    filters = {s["lineage"]["filter"] for s in aidx.snapshot["segments"]}
    assert all("day ==" in f for f in filters)
    assert aidx.n_docs == lidx.n_docs
    q = "spark shuffle error"
    l = [(r["doc_id"], round(r["score"], 10)) for r in lidx.search_bm25(q, 10).collect()]
    a = [(r["doc_id"], round(r["score"], 10)) for r in aidx.search_bm25(q, 10).collect()]
    assert l == a


def test_describe_artifact_metadata_only(spark, corpus, tmp_path):
    """describe_artifact summarizes from snapshot metadata alone (no Spark
    arg at all) and tracks appends/deletes."""
    from searchengine_spark.index.artifact import (
        append_segment,
        build_artifact,
        describe_artifact,
        load_artifact,
    )

    path = str(tmp_path / "desc")
    a = corpus.where("conv_id < 'conv-00000008'").select("doc_id", "text")
    b = corpus.where("conv_id >= 'conv-00000008'").select("doc_id", "text")
    build_artifact(spark, a, path)
    append_segment(spark, b, path, stream_batch_id=1)
    load_artifact(spark, path).delete_documents("zqmarkeralpha")

    d = describe_artifact(path)
    assert d["n_segments"] == 2
    assert d["n_docs"] == corpus.count()
    assert d["n_postings"] > 0 and d["bytes"] > 0
    assert 0 < d["bytes_per_posting"] < 100
    assert d["n_tombstone_files"] == 1
    assert d["n_snapshots"] == 3  # build, append, delete
    assert len(d["segments"]) == 2
    assert all(r["n_partitions"] >= 1 for r in d["segments"])
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        describe_artifact(str(tmp_path / "nope"))


def test_all_postings_nonpositional_prunes_pos_and_doc_vectors_runs(
    spark, aidx, lidx
):
    """all_postings(positional=False) — the corpus-wide export hook — must
    scan block files WITHOUT the pos column, and doc_vectors must return
    identical rows on both backends (artifact ordinal delete-filtering and
    logical doc_id filtering included)."""
    from searchengine_spark.query.morelike import doc_vectors

    nopos = aidx.all_postings(positional=False)
    plan = _plan_of(nopos)
    assert "/blocks" in plan
    assert "pos:binary" not in plan, "position bytes leak into export scan"
    a = sorted(
        (r.doc_id, r.term, r.weight_r, r.rank)
        for r in doc_vectors(aidx, n_terms=3).collect()
    )
    b = sorted(
        (r.doc_id, r.term, r.weight_r, r.rank)
        for r in doc_vectors(lidx, n_terms=3).collect()
    )
    assert a == b and len(a) > 0
