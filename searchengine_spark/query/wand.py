"""Block-max WAND top-k BM25 over the compressed block artifact.

Classic WAND is a sequential cursor algorithm; this is the exact,
vectorized/distributed restatement (SURVEY.md §4.2.2):

1. **Candidate blocks**: parquet scan of block rows for the query terms
   (``term IN (...)`` pushed to the scan; only metadata + compressed bytes
   of the query terms' blocks are ever read).
2. **Per-block upper bound**: ub = qtf·idf·max over the block's stored
   (tf, dl) Pareto front of tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) — the
   EXACT per-block max score part for the current (k1, b) and global
   avgdl (the maximizer of a tf-increasing, dl-decreasing function lies
   on the front); falls back to the looser monotone (max_tf, min_dl)
   composite for artifacts packed before the front columns existed.
3. **Seed θ**: decode only the ⌈k/block_size⌉+1 highest-ub blocks per term,
   score them exactly; the k-th best (partial) score is a valid lower bound
   θ of the true k-th score.
4. **Prune**: a block of term t is dropped iff ub(block) + others(block)
   < θ, where others(block) upper-bounds what any doc in the block's
   doc-ordinal range can collect from the OTHER query terms. Two
   admissible bounds, tightest applicable wins:

   - *global others* (small queries): Σ_{t'≠t} max-ub(t') — one scalar
     per term, no extra jobs;
   - *block-aligned others* (the real Block-Max WAND, used when the
     candidate set is large): for each block, Σ_{t'≠t} max(ub over t''s
     blocks whose ordinal range overlaps this block's). Distributed
     restatement: ordinal space is bucketed (width ≈ the densest term's
     block span); each NARROW block (≤ ``_ALIGNED_MAX_SPAN`` buckets)
     posts its ub into its buckets, and per-(bucket, term) maxima form a
     metadata-sized table; a candidate block then takes, per other term,
     the max over its own buckets (equi-join on bucket — never a range
     join), falling back to that term's max over WIDE blocks when no
     narrow block shares a bucket. Admissible because a doc's posting
     for t' lives in a t'-block containing its ordinal, which therefore
     overlaps the candidate block's range: if narrow it shares the
     doc's bucket (buckets cover ranges inclusively), if wide it is
     covered by the wide max. Hot-term blocks — the ones worth pruning
     — are exactly the narrow ones, so the aligned sum varies along the
     ordinal axis and drops blocks the global bound never could (on
     disjunctive multi-term queries the global bound prunes ~nothing:
     Σ other-max alone usually exceeds θ).

   Any doc in a dropped block has true score < θ ≤ true
   k-th score, so: (a) every true top-k doc has ALL its blocks kept (its
   blocks can't satisfy the drop test — the doc itself is a witness), hence
   is scored exactly; (b) docs scored partially (some blocks dropped) have
   estimate ≤ true score < θ, so they cannot displace a fully-scored top-k
   doc. The result is therefore exact, including boundary ties.
5. **Score + top-k + hydrate**: decode kept blocks, per-posting BM25
   partials, deterministic per-doc fold in sorted-term order (bit-identical
   to the logical path and the pure-Python oracle), one shuffle on
   ``doc_ord``, distributed TakeOrdered of the *ordinal-keyed* scores.
   The corpus-sized ``doc_ord → doc_id`` mapping is consulted only AFTER
   the top-k cut, for the ≤ k+ties surviving ordinals, via a point lookup
   (``seg`` partition pruning + ``doc_ord IN (...)`` row-group pruning on
   the docs parquet — see ``ArtifactIndex.docs_for_ordinals``). At 10^12
   docs this touches a handful of row groups instead of shuffling the whole
   doc table per query.

Tie-break contract: the final ranking orders by (score desc, doc_id asc) —
identical to the logical path. The ordinal-space top-k cut keeps *every*
doc whose score ties the k-th score (boundary set ``score >= θ_k``), so the
doc_id tie-break is applied to the complete tie cluster even though
ordinals order by (segment, doc_id) rather than globally by doc_id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranked import _query_weights, bm25_idf

# Safety valve for the boundary-tie collect: if more than this many docs tie
# the k-th score, fall back to a distributed cut (pathological corpora only —
# e.g. every doc identical).
_MAX_TIE_COLLECT = 65536

# Candidate-set size above which the block-aligned others bound is computed.
# Measured crossover (600k-doc bursty corpus, local[32]): the machinery
# costs ~2-3 extra job round-trips (~1 s locally); decode+score runs
# ~0.6 ms/block, so a typically-prunable (≥60%) candidate set breaks even
# near 2.5-3k blocks — 5.1k-block rare+hot queries WIN 19% wall-clock,
# 1.4k-block burst triples LOSE 33% (BENCH.md A/B tables). On a real
# cluster per-block cost is orders of magnitude higher and job latency
# similar, so this local calibration is the conservative setting.
_ALIGNED_MIN_BLOCKS = 3072
# A block spanning more than this many buckets is "wide": it posts no
# per-bucket entries and is bounded by its term's global wide max instead.
_ALIGNED_MAX_SPAN = 16
# Two-phase seed: how many top phase-A ordinals get their buckets'
# candidate blocks decoded for complete scores (× k), and the θ_A/total_ub
# fraction above which phase B is skipped (θ already near the best any doc
# could reach — completion cannot raise it usefully).
_SEED_COMPLETE_FACTOR = 8
_SEED_COMPLETE_MIN_FRAC = 0.8
# Necessary-term gating: max number of wide gating-term blocks to decode
# for exact posting buckets (wide blocks are rare-term blocks, so this is
# ~65k postings); above it gating is skipped.
_GATE_MAX_WIDE_DECODE = 512
# Candidate-set size at or below which everything is decoded outright (a
# seed+prune pass costs more than it saves on tiny queries).
_SMALL_QUERY_BLOCKS = 256
# Candidate sets whose block metadata fits comfortably on the driver have
# their keep-set computed there in vectorized pandas (ONE metadata collect
# + ONE broadcast semi-join instead of ~10 tiny shuffle stages whose fixed
# latency exceeds the decode savings below ~10^6 docs — measured: the
# distributed plan LOST 18% wall-clock on rare+hot queries at 600k docs
# despite pruning 96% of blocks). Above the cap the distributed plan runs
# with identical semantics; 256k blocks ≈ 32M postings per query term set,
# ~20 MB of metadata on the driver.
_DRIVER_PRUNE_MAX_BLOCKS = 262144


def _empty(index) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id string, score double")


def _score_blocks(aidx, blocks: DataFrame, qdf: DataFrame) -> DataFrame:
    """Decode block rows and BM25-score them -> (doc_ord, score), with
    tombstoned docs filtered (they must not seed θ either — a deleted
    high-scorer would prune blocks that surviving docs need). No doc-table
    join happens here: doc_id recovery is deferred to after the top-k cut."""
    from ..index.artifact import decode_barrier

    # NB: "pos" deliberately excluded — scoring never reads positions, and
    # pruning the column here keeps position bytes out of the parquet scan.
    block_cols = ["term", "first_ord", "docs", "tfs", "dls"]
    decoded = decode_barrier(blocks.select(*block_cols), False)
    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0
    tf = F.col("tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    partial = F.col("qtf") * F.col("idf") * tf * (k1 + 1.0) / norm
    scored = (
        decoded.join(F.broadcast(qdf), "term")
        .select("doc_ord", F.struct("term", partial.alias("partial")).alias("p"))
        .groupBy("doc_ord")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("score")
        )
    )
    return aidx.filter_deleted_ords(scored)


def _finalize_topk(aidx, scored: DataFrame, k: int) -> DataFrame:
    """(doc_ord, score) -> exact top-k (doc_id, score) under the
    (score desc, doc_id asc) contract, touching the doc table only for the
    boundary set (all docs with score >= k-th score, typically ~k rows).

    A doc_id duplicated across segments (legal transient state) owns one
    ordinal per instance; results are per doc_id, keeping the max instance
    score (instances of a true duplicate score identically). Because the
    per-ordinal k-th score can then over-cut, the fetch escalates until the
    deduped boundary holds >= k distinct doc_ids — one pass when there are
    no duplicates, which is the steady state."""
    spark = aidx.spark
    scored = scored.persist()
    try:
        fetch_k = k
        while True:
            top = (
                scored.orderBy(F.desc("score"), F.asc("doc_ord"))
                .limit(fetch_k)
                .collect()
            )
            if not top:
                return _empty(aidx)
            exhausted = len(top) < fetch_k  # every scored ordinal fetched
            if exhausted:
                boundary = top
            else:
                theta_k = top[-1]["score"]
                # every potential member of the final top-k under ANY
                # tie-break
                cand = scored.where(F.col("score") >= theta_k)
                boundary = cand.limit(_MAX_TIE_COLLECT + 1).collect()
                if len(boundary) > _MAX_TIE_COLLECT:
                    # pathological tie plateau: cut distributedly (doc-table
                    # join before the limit — slow but exact)
                    return (
                        scored.join(
                            aidx.docs_tbl.select("doc_ord", "doc_id"),
                            "doc_ord",
                        )
                        .groupBy("doc_id")
                        .agg(F.max("score").alias("score"))
                        .orderBy(F.desc("score"), F.asc("doc_id"))
                        .limit(k)
                        .localCheckpoint(eager=True)
                    )
            id_by_ord = {
                r["doc_ord"]: r["doc_id"]
                for r in aidx.docs_for_ordinals(
                    [r["doc_ord"] for r in boundary]
                ).collect()
            }
            best: dict = {}
            for r in boundary:
                did, s = id_by_ord[r["doc_ord"]], r["score"]
                if did not in best or s > best[did]:
                    best[did] = s
            if exhausted or len(best) >= k:
                rows = sorted(best.items(), key=lambda x: (-x[1], x[0]))[:k]
                return spark.createDataFrame(
                    rows, "doc_id string, score double"
                )
            fetch_k *= 4  # duplicates over-filled the per-ordinal cut
    finally:
        scored.unpersist()


def _bucket_wlog(med_span) -> int:
    """log2 bucket width: the next power of two >= the densest query term's
    median block span, so hot-term blocks span ~1 bucket."""
    return max(0, int(max(1, med_span) - 1).bit_length())


def _block_buckets(cand, wlog) -> DataFrame:
    """Per-block bucket metadata: (bid, term, ub, bk0, bk1, narrow)."""
    return cand.select(
        "bid",
        "term",
        "ub",
        F.shiftright("first_ord", wlog).alias("bk0"),
        F.shiftright("last_ord", wlog).alias("bk1"),
        (
            F.shiftright("last_ord", wlog) - F.shiftright("first_ord", wlog)
            < _ALIGNED_MAX_SPAN
        ).alias("narrow"),
    )


def _wide_max(meta, g) -> dict:
    """Per-term max ub over WIDE blocks (0.0 for terms with none)."""
    wide = dict.fromkeys(g, 0.0)
    wide.update(
        {
            r["term"]: r["wm"]
            for r in meta.where(~F.col("narrow"))
            .groupBy("term")
            .agg(F.max("ub").alias("wm"))
            .collect()
        }
    )
    return wide


def _aligned_keep_ids(spark, meta, g, total_ub, theta, wide) -> DataFrame:
    """bid column of blocks surviving the block-aligned others bound.

    Bound shape per narrow candidate block B of term t:
        others(B) = Σ_{u≠t} max( max{ub(B'): B' narrow block of u sharing a
                                 bucket with B}, wide_max(u) )
                  = (Σ_{u≠t} wide_max(u))                       [``base``]
                    + Σ_{u≠t, present} max(0, nmax_u(B) − wide_max(u))
                                                                [``extra``]
    which is ≤ the global Σ_{u≠t} max-ub(u) (every ub ≤ its term's global
    max), i.e. never looser. Wide candidate blocks keep the global bound —
    they are rare-term blocks spanning most of the ordinal axis, where
    alignment cannot discriminate anyway. All joins move block METADATA
    only (bid, term, ub, bucket) — never the compressed bytes."""
    wide_total = sum(wide.values())
    buckets = meta.where("narrow").select(
        "bid", "term", "ub", F.explode(F.sequence("bk0", "bk1")).alias("bk")
    )
    bucket_max = (
        buckets.groupBy("bk", "term")
        .agg(F.max("ub").alias("bmax"))
        .select(F.col("bk"), F.col("term").alias("oterm"), "bmax")
    )
    wdf = spark.createDataFrame(
        [(t, float(wide[t])) for t in g], "oterm string, wm double"
    )
    extra = (
        buckets.select("bid", "term", "bk")
        .join(bucket_max, "bk")
        .where(F.col("term") != F.col("oterm"))
        .groupBy("bid", "oterm")
        .agg(F.max("bmax").alias("nmax"))
        .join(F.broadcast(wdf), "oterm")
        .select(
            "bid",
            F.greatest(F.lit(0.0), F.col("nmax") - F.col("wm")).alias("c"),
        )
        .groupBy("bid")
        .agg(F.sum("c").alias("extra"))
    )
    base = spark.createDataFrame(
        [(t, wide_total - wide[t]) for t in g], "term string, base double"
    )
    gothers = spark.createDataFrame(
        [(t, total_ub - g[t]) for t in g], "term string, gothers double"
    )
    return (
        meta.join(extra, "bid", "left")
        .join(F.broadcast(base), "term")
        .join(F.broadcast(gothers), "term")
        .withColumn(
            "others",
            F.when(
                F.col("narrow"),
                F.col("base") + F.coalesce(F.col("extra"), F.lit(0.0)),
            ).otherwise(F.col("gothers")),
        )
        .where(F.col("ub") + F.col("others") >= theta)
        .select("bid")
    )


def _aligned_keep(spark, cand, g, total_ub, theta, med_span) -> DataFrame:
    """Kept subset of ``cand`` under the block-aligned others bound (see
    ``_aligned_keep_ids``)."""
    meta = _block_buckets(cand, _bucket_wlog(med_span))
    keep_ids = _aligned_keep_ids(
        spark, meta, g, total_ub, theta, _wide_max(meta, g)
    )
    return cand.join(keep_ids, "bid", "left_semi")


def _explode_buckets_pd(mpd):
    """Driver-side bucket explosion of NARROW blocks: pandas frame
    (bid, term, ub, bk) — one row per (block, covered bucket). Narrow
    spans are < ``_ALIGNED_MAX_SPAN``, so this is at most 16× the block
    count."""
    import numpy as np
    import pandas as pd

    nar = mpd[mpd["narrow"]]
    spans = (nar["bk1"] - nar["bk0"] + 1).to_numpy()
    idx = np.repeat(np.arange(len(nar)), spans)
    offs = np.arange(spans.sum()) - np.repeat(np.cumsum(spans) - spans, spans)
    return pd.DataFrame(
        {
            "bid": nar["bid"].to_numpy()[idx],
            "term": nar["term"].to_numpy()[idx],
            "ub": nar["ub"].to_numpy()[idx],
            "bk": nar["bk0"].to_numpy()[idx] + offs,
        }
    )


def _wide_max_pd(mpd, g) -> dict:
    """Driver-side twin of ``_wide_max``."""
    wide = dict.fromkeys(g, 0.0)
    wide.update(mpd[~mpd["narrow"]].groupby("term")["ub"].max().to_dict())
    return wide


def _aligned_keep_bids(mpd, g, total_ub, theta, wide) -> set:
    """Driver-side twin of ``_aligned_keep_ids``: the surviving bid set,
    computed with vectorized pandas over collected block metadata. Same
    bound, same admissibility argument — pinned identical to the
    distributed plan by tests."""
    import numpy as np

    wide_total = sum(wide.values())
    buckets = _explode_buckets_pd(mpd)
    bucket_max = (
        buckets.groupby(["bk", "term"], sort=False)["ub"]
        .max()
        .rename("bmax")
        .reset_index()
        .rename(columns={"term": "oterm"})
    )
    m = buckets[["bid", "term", "bk"]].merge(bucket_max, on="bk")
    m = m[m["term"] != m["oterm"]]
    nmax = (
        m.groupby(["bid", "oterm"], sort=False)["bmax"].max().reset_index()
    )
    c = np.maximum(
        0.0, nmax["bmax"].to_numpy() - nmax["oterm"].map(wide).to_numpy()
    )
    extra = nmax.assign(c=c).groupby("bid", sort=False)["c"].sum()
    base = {t: wide_total - wide[t] for t in g}
    gothers = {t: total_ub - g[t] for t in g}
    others = np.where(
        mpd["narrow"].to_numpy(),
        mpd["term"].map(base).to_numpy()
        + mpd["bid"].map(extra).fillna(0.0).to_numpy(),
        mpd["term"].map(gothers).to_numpy(),
    )
    keepmask = mpd["ub"].to_numpy() + others >= theta
    return set(mpd["bid"].to_numpy()[keepmask])


def _gate_terms(g, theta):
    """The necessary-term prefix S (see ``_gate_keep_ids``), or None when
    gating does not apply."""
    order = sorted(g.items(), key=lambda kv: -kv[1])
    rest = sum(v for _, v in order)
    S = []
    for t, v in order:
        if rest < theta:
            break
        S.append(t)
        rest -= v
    if rest >= theta or not S or len(S) == len(g):
        return None
    return S


def _gate_wide_buckets(spark, aidx, cand, wide_bids, wlog) -> set:
    """Exact posting buckets of the given wide blocks (one decode job —
    wide blocks are rare-term blocks, so this is bounded postings)."""
    from ..index.artifact import decode_barrier

    bdf = spark.createDataFrame([(b,) for b in wide_bids], "bid string")
    wide = cand.join(F.broadcast(bdf), "bid", "left_semi").select(
        "term", "first_ord", "docs", "tfs", "dls"
    )
    rows = (
        decode_barrier(wide, False)
        .select(F.shiftright("doc_ord", wlog).alias("bk"))
        .distinct()
        .collect()
    )
    return {r["bk"] for r in rows}


def _gate_keep_bids(spark, aidx, cand, mpd, g, theta, wlog):
    """Driver-side twin of ``_gate_keep_ids``: the keep bid set, or None
    when gating does not apply. Wide S-term blocks still take one Spark
    decode job for exact posting buckets; everything else is pandas over
    collected metadata."""
    S = _gate_terms(g, theta)
    if S is None:
        return None
    s_set = set(S)
    s_rows = mpd[mpd["term"].isin(s_set)]
    s_wide = s_rows[~s_rows["narrow"]]
    if len(s_wide) > _GATE_MAX_WIDE_DECODE:
        return None
    d = set()
    nar = s_rows[s_rows["narrow"]]
    for bk0, bk1 in zip(nar["bk0"].to_numpy(), nar["bk1"].to_numpy()):
        d.update(range(int(bk0), int(bk1) + 1))
    if len(s_wide):
        d |= _gate_wide_buckets(spark, aidx, cand, list(s_wide["bid"]), wlog)
    keep = set(s_rows["bid"])
    non_s = mpd[~mpd["term"].isin(s_set)]
    keep.update(non_s[~non_s["narrow"]]["bid"])
    eb = _explode_buckets_pd(non_s)
    keep.update(eb["bid"][eb["bk"].isin(d)])
    return keep


def _gate_keep_ids(spark, aidx, cand, meta, g, theta, wlog):
    """Necessary-term gating (the classic WAND pivot-skip, restated for
    whole-block sets): sort terms by global max ub desc and take the
    smallest prefix S with Σ_{u∉S} max-ub(u) < θ. A doc containing only
    non-S terms then has true score < θ, so every doc with true score ≥ θ
    carries at least one S-term posting — and a non-S block whose ordinal
    range shares no bucket with any S posting cannot contain such a doc
    and is dropped whole. D (the S-posting bucket set) = narrow S blocks'
    bucket spans ∪ exact posting buckets of wide S blocks (decoded — wide
    blocks are rare-term blocks, so this is cheap and gives the
    posting-level precision the pivot-skip needs; with more than
    ``_GATE_MAX_WIDE_DECODE`` of them gating is skipped). At corpus scale
    this is the dominant win for rare+hot queries: the hot terms' blocks
    collapse to the rare terms' neighborhoods. Returns the bid keep-set,
    or None when gating does not apply."""
    S = _gate_terms(g, theta)
    if S is None:
        return None
    s_meta = meta.where(F.col("term").isin(S))
    s_wide_ids = s_meta.where(~F.col("narrow")).select("bid")
    n_wide = s_wide_ids.count()
    if n_wide > _GATE_MAX_WIDE_DECODE:
        return None
    d_buckets = s_meta.where("narrow").select(
        F.explode(F.sequence("bk0", "bk1")).alias("bk")
    )
    if n_wide:
        from ..index.artifact import decode_barrier

        wide = cand.join(s_wide_ids, "bid", "left_semi").select(
            "term", "first_ord", "docs", "tfs", "dls"
        )
        d_wide = decode_barrier(wide, False).select(
            F.shiftright("doc_ord", wlog).alias("bk")
        )
        d_buckets = d_buckets.union(d_wide)
    d_buckets = d_buckets.distinct()
    non_s_keep = (
        meta.where(~F.col("term").isin(S) & F.col("narrow"))
        .select("bid", F.explode(F.sequence("bk0", "bk1")).alias("bk"))
        .join(d_buckets, "bk")
        .select("bid")
        .distinct()
    )
    always = meta.where(F.col("term").isin(S) | ~F.col("narrow")).select(
        "bid"
    )
    return non_s_keep.union(always).distinct()


def search_bm25_blockmax(aidx, query, k: int) -> DataFrame:
    weights = _query_weights(aidx, query, bm25_idf)
    if not weights or k == 0:
        return _empty(aidx)
    spark = aidx.spark
    qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
    terms = [t for t, _, _ in weights]

    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1 + 1.0) / (
            t + k1 * (1.0 - b + b * dl.cast("double") / F.lit(avgdl))
        )

    # block bound from the stored (tf, dl) Pareto front: the EXACT max
    # score part over the block for the current (k1, b, avgdl) — tighter
    # than part(max_tf, min_dl), which remains the fallback for artifacts
    # packed before the front columns existed (null there)
    front_tfs = F.coalesce(F.col("ub_tfs"), F.array(F.col("max_tf")))
    front_dls = F.coalesce(F.col("ub_dls"), F.array(F.col("min_dl")))
    ub = (
        F.col("qtf")
        * F.col("idf")
        * F.array_max(F.zip_with(front_tfs, front_dls, part))
    )

    # persist: the candidate block set feeds three jobs (per-term ub budget,
    # seed scoring, final pruned scoring) — without it each job re-lists and
    # re-reads the block files
    cand = (
        aidx.blocks_for_terms(terms)
        .join(F.broadcast(qdf), "term")
        .withColumn("ub", ub)
        # deterministic per-block key for the aligned-prune joins (numeric
        # parts + '#' make the key unambiguous no matter what characters
        # the term contains). first_ord is required for uniqueness:
        # block_seq restarts at 0 in every pack partition, so a hot term
        # split across range partitions repeats (seg, block_seq, term) —
        # first_ord is strictly increasing across a term's blocks within a
        # segment and disambiguates the twins (a duplicate bid let a kept
        # block resurrect its pruned twin and inflated the aligned bound's
        # per-bid bucket sets on exactly the hot terms it exists to prune)
        .withColumn(
            "bid", F.concat_ws("#", "seg", "block_seq", "first_ord", "term")
        )
        .persist()
    )

    # per-term global max ub (|q| rows) — the "other terms" budget — plus
    # the per-term median block span (sets the aligned-bound bucket width)
    stats = cand.groupBy("term").agg(
        F.max("ub").alias("m"),
        F.count(F.lit(1)).alias("nb"),
        F.expr("approx_percentile(last_ord - first_ord + 1, 0.5)").alias("ms"),
    ).collect()
    g = {r["term"]: r["m"] for r in stats}
    if not g:
        return _empty(aidx)
    total_ub = sum(g.values())
    n_cand_blocks = sum(r["nb"] for r in stats)
    # densest term's median span: hot-term blocks are the prunable ones and
    # alignment needs buckets at THEIR granularity
    med_span = min(r["ms"] for r in stats if r["ms"] is not None)

    # small queries: decoding everything is cheaper than a seed+prune pass
    if n_cand_blocks <= _SMALL_QUERY_BLOCKS:
        out = _finalize_topk(aidx, _score_blocks(aidx, cand, qdf), k)
        cand.unpersist()
        return out

    # seed θ from the highest-impact blocks of each term. Two-phase cut
    # (ranked.salted_topk_per_query): a window partitioned by term alone
    # sorts a hot term's ENTIRE block-metadata list in one task (78M
    # block rows for a 10^10-posting term at scale); the salted cut picks
    # the identical n_seed blocks with cluster-wide parallelism.
    from .ranked import salted_topk_per_query

    n_seed = math.ceil(k / aidx.block_size) + 1
    seed = salted_topk_per_query(
        cand,
        n_seed,
        [F.desc("ub"), F.asc("first_ord"), F.asc("block_seq")],
        F.struct("first_ord", "block_seq"),
        spark,
        query_col="term",
    )
    aligned = len(g) > 1 and n_cand_blocks >= _ALIGNED_MIN_BLOCKS
    if not aligned:
        top = (
            _score_blocks(aidx, seed, qdf)
            .orderBy(F.desc("score"))
            .limit(k)
            .collect()
        )
        theta = (
            min(r["score"] for r in top) if len(top) >= k else float("-inf")
        )
        if theta == float("-inf"):
            kept = cand
        else:
            others = spark.createDataFrame(
                [(t, total_ub - g[t]) for t in g],
                "term string, others double",
            )
            kept = cand.join(F.broadcast(others), "term").where(
                F.col("ub") + F.col("others") >= theta
            )
        out = _finalize_topk(aidx, _score_blocks(aidx, kept, qdf), k)
        cand.unpersist()
        return out

    # multi-term + large candidate set: the global others bound prunes
    # ~nothing (Σ other-max alone usually clears θ). Strengthen θ with a
    # two-phase seed, then prune with the block-aligned bound plus
    # necessary-term gating. Below _DRIVER_PRUNE_MAX_BLOCKS the keep-set
    # is computed driver-side over ONE metadata collect (the distributed
    # twin's ~10 tiny shuffle stages cost more than the decode they save
    # at local scale); above it, the distributed plan — all joins
    # metadata-sized either way.
    wlog = _bucket_wlog(med_span)
    meta = _block_buckets(cand, wlog)
    mpd = (
        meta.toPandas() if n_cand_blocks <= _DRIVER_PRUNE_MAX_BLOCKS
        else None
    )

    # phase A: per-term top blocks, scored separately — each doc only
    # collects partials from the decoded blocks, so θ_A is weak whenever
    # the terms' best blocks live in different ordinal regions
    pa = (
        _score_blocks(aidx, seed, qdf)
        .orderBy(F.desc("score"), F.asc("doc_ord"))
        .limit(_SEED_COMPLETE_FACTOR * k)
        .collect()
    )
    theta_a = pa[k - 1]["score"] if len(pa) >= k else float("-inf")
    seed_final = seed
    if pa and theta_a < _SEED_COMPLETE_MIN_FRAC * total_ub:
        # phase B (seed completion): decode ALL candidate blocks in the
        # top phase-A ordinals' buckets so those docs get complete scores
        # — θ then approaches the true k-th score instead of the best
        # single-term partial. Skipped when θ_A is already near total_ub
        # (flat corpora: the per-term seeds overlap and complete anyway).
        bks = {r["doc_ord"] >> wlog for r in pa}
        if mpd is not None:
            eb = _explode_buckets_pd(mpd)
            comp = sorted(set(eb["bid"][eb["bk"].isin(bks)]))
            comp_ids = spark.createDataFrame(
                [(b,) for b in comp], "bid string"
            )
        else:
            bdf = spark.createDataFrame(
                [(b,) for b in sorted(bks)], "bk long"
            )
            comp_ids = (
                meta.where("narrow")
                .select(
                    "bid", F.explode(F.sequence("bk0", "bk1")).alias("bk")
                )
                .join(F.broadcast(bdf), "bk")
                .select("bid")
            )
        seed_final = cand.join(
            comp_ids.union(seed.select("bid")).distinct(), "bid", "left_semi"
        )
    if seed_final is seed:
        # phase B skipped: θ_A already IS the k-th best over the seed —
        # rescoring the identical seed would repeat the same Spark job
        theta = theta_a
    else:
        top = (
            _score_blocks(aidx, seed_final, qdf)
            .orderBy(F.desc("score"))
            .limit(k)
            .collect()
        )
        theta = (
            min(r["score"] for r in top) if len(top) >= k else float("-inf")
        )

    if theta == float("-inf"):
        kept = cand
    elif mpd is not None:
        wide = _wide_max_pd(mpd, g)
        keep = _aligned_keep_bids(mpd, g, total_ub, theta, wide)
        gate = _gate_keep_bids(spark, aidx, cand, mpd, g, theta, wlog)
        if gate is not None:
            keep &= gate
        kdf = spark.createDataFrame([(b,) for b in sorted(keep)], "bid string")
        kept = cand.join(F.broadcast(kdf), "bid", "left_semi")
    else:
        wide = _wide_max(meta, g)
        keep_ids = _aligned_keep_ids(spark, meta, g, total_ub, theta, wide)
        gate_ids = _gate_keep_ids(spark, aidx, cand, meta, g, theta, wlog)
        if gate_ids is not None:
            keep_ids = keep_ids.join(gate_ids, "bid", "left_semi")
        kept = cand.join(keep_ids, "bid", "left_semi")

    out = _finalize_topk(aidx, _score_blocks(aidx, kept, qdf), k)
    cand.unpersist()
    return out
