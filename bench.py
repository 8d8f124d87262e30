#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Beyond the per-query wall times it also reports the north-rule metric —
index-build throughput in turns/sec over the deterministic synthetic
transcripts corpus (FIXTURES.md) — under ``extras.build_turns_per_sec``.
Scaling-efficiency evidence (same build at local[8] vs local[32]) lives in
``scripts/scaling_run.py`` / BENCH.md, not here, because it needs two fresh
JVMs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _calib_work(k: int) -> str:
    import hashlib

    h = hashlib.md5()
    for _ in range(k):
        h.update(b"x" * 64)
    return h.hexdigest()


def host_calibration(procs: int = 8, n: int = 2_000_000) -> dict:
    """In-window host-health marker (~1 s): a fixed CPU-bound kernel run
    single-process and ``procs``-way. On a quiet host the parallel wall
    time equals the single time (each worker does the SAME work); tenancy
    throttling shows up as ratio > 1. Recorded in extras so every bench
    JSON carries the window quality it was measured under — the same
    interpretation rule as scripts/scaling_run.py's per-trial calibration
    (BENCH.md '±20% host variance')."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    _calib_work(n)
    single = time.perf_counter() - t0
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(_calib_work, [n] * procs)
    par = time.perf_counter() - t0
    return {
        "calib_single_s": round(single, 3),
        "calib_par8_s": round(par, 3),
        "calib_throttle_ratio": round(par / single, 3) if single > 0 else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from pyspark.sql import functions as F

    from searchengine_spark.fixtures import doc_key_col, transcripts_df
    from searchengine_spark.index import build_index
    from searchengine_spark.session import get_spark
    from searchengine_spark.textops import dedup as dd
    from searchengine_spark.textops import similarity as sim

    calib_start = host_calibration()
    spark = get_spark("searchengine-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    q: dict[str, float] = {}

    # --- index build over the sf documents table (postings + stats) ---
    t0 = time.perf_counter()
    idx = build_index(spark, docs, analyzer="punctuation")
    idx.postings.count()  # materialize the persisted postings
    q["index_build"] = time.perf_counter() - t0

    # --- query surface (each .collect()s a small result) ---
    q["ft_bm25_top20"], _ = timed(lambda: idx.search_bm25("spark join hash", 20).collect())
    q["ft_tfidf_top20"], _ = timed(lambda: idx.search_tfidf("spark join hash", 20).collect())
    q["ft_and"], _ = timed(lambda: idx.search_and("merge join hash").collect())
    q["ft_or"], _ = timed(lambda: idx.search_or("vector stream").collect())
    q["ft_phrase"], _ = timed(lambda: idx.search_phrase("table hash").collect())

    # --- batched query workload: Q queries in ONE postings scan ---
    # (informational extras; demonstrates the per-query fixed cost —
    # scan + shuffle setup — amortizing across a workload, the shape that
    # dominates at cluster scale)
    batch_qs = {
        "b0": "spark join hash",
        "b1": "merge join hash",
        "b2": "vector stream",
        "b3": "table hash",
        "b4": "spark checkpoint",
        "b5": "merge vector",
    }
    extras_times: dict[str, float] = {}
    extras_times["bm25_seq6"], _ = timed(
        lambda: [idx.search_bm25(t, 20).collect() for t in batch_qs.values()]
    )
    extras_times["bm25_batch6"], _ = timed(
        lambda: idx.search_bm25_batch(batch_qs, 20).collect()
    )

    # --- compressed artifact: build + block-max WAND query ---
    import shutil
    import tempfile

    from searchengine_spark.index.artifact import build_artifact

    art_dir = tempfile.mkdtemp(prefix="bench_artifact_")
    t0 = time.perf_counter()
    aidx = build_artifact(
        spark, docs, art_dir, analyzer="punctuation",
        source_desc=f"bench {sf_dir}",
    )
    q["artifact_build"] = time.perf_counter() - t0
    q["ft_bm25_wand"], _ = timed(
        lambda: aidx.search_bm25("spark join hash", 20).collect()
    )
    shutil.rmtree(art_dir, ignore_errors=True)

    # --- training-data ops ---
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.regexp_replace("text", "[,.;?!]", " ")), r"\s+"),
            lambda x: x != "",
        ).alias("tokens"),
    )
    q["dedup_minhash"], _ = timed(
        lambda: dd.minhash_candidate_pairs(toks).count()
    )
    # new-op timings live in extras (headline total stays comparable
    # across rounds; these are informational)
    docs_tok = docs.select(
        "doc_id",
        "text",
        F.filter(
            F.split(F.lower(F.regexp_replace("text", "[,.;?!]", " ")), r"\s+"),
            lambda x: x != "",
        ).alias("tokens"),
    )
    extras_times["dedup_pipeline"], _ = timed(
        lambda: dd.dedup_pipeline(docs_tok).count()
    )
    from searchengine_spark.textops import quality as tq

    extras_times["simhash_pairs_h7"], _ = timed(
        lambda: tq.simhash_near_pairs(docs, max_hamming=7).count()
    )
    extras_times["quality_filter"], _ = timed(
        lambda: tq.quality_filter(docs).count()
    )
    # round-3 operators (as-of / range join, repetition, decontamination,
    # SemDeDup) — timed through the same registry callables the driver runs
    from searchengine_spark import entry_queries as eq

    for name in (
        "events_asof",
        "events_range_join",
        "repetition_signals",
        "contamination_overlap",
        "semantic_dedup",
        "pii_scrub",
        "training_mix",
        "dedup_incremental",
        "lm_perplexity",
        "bpe_merges",
        "doc_chunks",
        "events_funnel",
        "events_retention",
        "ppr_top20",
        "hits_top20",
        "span_pairs",
        "dup_score",
        "colloc_top20",
        "doc_keyterms",
        "graph_bfs_depth",
        "graph_labelprop",
        "graph_walks",
        "walk_skipgrams",
        "walk_ppmi",
        "ft_collapse",
        "eval_ngram_overlap",
        "quality_classifier",
        "shard_stats",
        "ann_pq_top10",
        "ann_ivfpq_top10",
        "curation_funnel",
    ):
        extras_times[name], _ = timed(
            lambda n=name: eq.QUERIES[n](spark, sf_dir).count()
        )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.limit(1).collect()[0]
    qvec = [float(x) for x in qrow["embedding"]]
    q["ann_cosine_top10"], _ = timed(
        lambda: sim.brute_force_topk(emb, qvec, 10).collect()
    )
    # round-3 query-surface extensions, timed against the ALREADY-BUILT
    # index (the registry ft_* callables rebuild one per call)
    from searchengine_spark.query import hybrid as hyb

    extras_times["ft_boolexpr"], _ = timed(
        lambda: idx.search_boolean("(spark OR vector) AND NOT merge").count()
    )
    extras_times["ft_near"], _ = timed(
        lambda: idx.search_near("merge join", 2).count()
    )
    extras_times["ft_bm25_filtered"], _ = timed(
        lambda: idx.search_bm25_filtered(
            "spark join hash",
            docs.where((F.col("lang") == "en") & (F.col("n_chars") >= 200)),
            20,
        ).collect()
    )
    # exclude the query's own embedding row so the fused plan matches the
    # hybrid_rrf_top10 contract entry (no rank-1 self-hit in the ANN list)
    emb_rest = emb.where(F.col("vec_id") != qrow["vec_id"])
    extras_times["hybrid_rrf"], _ = timed(
        lambda: hyb.hybrid_search(
            idx, emb_rest, "spark join hash", qvec, k=10, id_cast="long"
        ).collect()
    )
    extras_times["ft_bm25_prf"], _ = timed(
        lambda: idx.search_bm25_prf(
            "spark join hash", 20, id_cast="long"
        ).collect()
    )
    from searchengine_spark.query import fuzzy as fz
    from searchengine_spark.query.mmr import mmr_rerank

    extras_times["ft_phrase_slop"], _ = timed(
        lambda: idx.search_phrase_slop("table hash", 2).count()
    )
    extras_times["ft_regex"], _ = timed(
        lambda: fz.search_regex(idx, "s(c|t)[a-z]+|[a-z]*dow").count()
    )
    extras_times["mmr_top10"], _ = timed(
        lambda: mmr_rerank(
            sim.brute_force_topk(emb_rest, qvec, 50),
            emb_rest,
            10,
            id_col="vec_id",
            rel_col="cos_sim",
        ).count()
    )
    # fielded filter grammar against the ALREADY-BUILT cached index (the
    # operator under test is the filter compilation + filtered BM25 plan;
    # an uncached per-query re-analyze would just re-measure the build)
    from searchengine_spark.query.bm25f import search_bm25f
    from searchengine_spark.query.fielded import search_fielded

    extras_times["ft_fielded"], _ = timed(
        lambda: search_fielded(
            idx, docs.select("doc_id", "lang"), "spark join hash lang:en", 20
        ).collect()
    )
    # BM25F pays its own one-pass analyze by design (fit-and-score form)
    extras_times["ft_bm25f"], _ = timed(
        lambda: search_bm25f(
            spark,
            docs.select("doc_id", F.col("lang").alias("field"), "text"),
            "spark join hash",
            {"en": 2.0, "de": 1.0},
            20,
        ).collect()
    )

    # session-6 additions: corpus analytics + scored-boolean/explain, all
    # against the cached documents index / raw documents frame
    from searchengine_spark.query.ranked import explain_bm25, search_bm25_boolean
    from searchengine_spark.textops import significance as sg

    extras_times["ft_bm25_bool"], _ = timed(
        lambda: search_bm25_boolean(
            idx, must=["merge"], should=["sort fast"], must_not=["dup"], k=20
        ).collect()
    )
    top_ids = [r["doc_id"] for r in idx.search_bm25("spark join hash", 10).collect()]
    extras_times["ft_bm25_explain"], _ = timed(
        lambda: explain_bm25(idx, "spark join hash", top_ids).collect()
    )
    extras_times["ft_sig_terms"], _ = timed(
        lambda: sg.significant_terms_for_search(
            idx, "dup merge", top_n=10, min_fg_df=5
        ).collect()
    )
    from searchengine_spark.entry_queries import _tok_col

    extras_times["sig_terms_by_lang"], _ = timed(
        lambda: sg.significant_terms_by_group(
            docs.select(
                F.col("lang").alias("group"), _tok_col(F.col("text")).alias("tokens")
            ),
            top_n=10,
            min_fg_df=5,
        ).collect()
    )

    from searchengine_spark.query.percolate import percolate

    perc_queries = spark.createDataFrame(
        [("q-dup", "dup"), ("q-ms", "merge sort"), ("q-sjh", "spark join hash")],
        "query_id string, query string",
    )
    extras_times["ft_percolate"], _ = timed(
        lambda: percolate(
            perc_queries, docs.select("doc_id", _tok_col(F.col("text")).alias("tokens")),
            analyzer="punctuation",
        ).count()
    )

    # session-7 additions: msm boolean, term vectors, dis-max, rank eval
    extras_times["ft_bm25_msm"], _ = timed(
        lambda: search_bm25_boolean(
            idx, should=["merge sort", "hash", "join"], k=20,
            min_should_match=2,
        ).collect()
    )
    extras_times["ft_term_vectors"], _ = timed(
        lambda: idx.term_vectors(top_ids).collect()
    )
    from searchengine_spark.query.bm25f import search_dismax

    extras_times["ft_dismax"], _ = timed(
        lambda: search_dismax(
            spark,
            docs.select("doc_id", F.col("lang").alias("field"), "text"),
            "spark join hash",
            ["en", "de"],
            tie_breaker=0.3,
            k=20,
        ).collect()
    )
    from searchengine_spark.query.rankeval import rank_eval

    _re_j = spark.createDataFrame(
        [("q0", str(d), 1) for d in top_ids[:5]],
        "query_id string, doc_id string, grade int",
    )
    extras_times["ft_rank_eval"], _ = timed(
        lambda: rank_eval(
            idx, {"q0": "spark join hash", "q1": "merge sort"}, _re_j, 10
        ).collect()
    )
    from searchengine_spark.query.ltr import ltr_features

    extras_times["ft_ltr_features"], _ = timed(
        lambda: ltr_features(
            idx, {"q0": "spark join hash", "q1": "merge sort"}, k=20,
            judgments=_re_j,
        ).collect()
    )
    extras_times["ft_ltr_prox"], _ = timed(
        lambda: ltr_features(
            idx, {"q0": "spark join hash", "q1": "merge sort"}, k=20,
            proximity=True,
        ).collect()
    )
    from searchengine_spark.query.morelike import doc_vectors

    extras_times["ft_doc_vectors"], _ = timed(
        lambda: doc_vectors(idx, n_terms=5).count()
    )

    # --- relational surface ---
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q["rel_tpch_q1"], _ = timed(
        lambda: li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_discount"), F.count(F.lit(1)))
        .collect()
    )

    # --- north-rule throughput: transcripts index build, turns/sec ---
    tr = transcripts_df(spark, n_convs=bench_convs).withColumn(
        "doc_id", doc_key_col()
    )
    n_turns = tr.count()  # generation cost paid here, not inside the timing
    t0 = time.perf_counter()
    tidx = build_index(spark, tr.select("doc_id", "text"), cache=False)
    n_postings = tidx.postings.count()
    build_s = time.perf_counter() - t0
    q["transcripts_build"] = build_s
    turns_per_sec = n_turns / build_s if build_s > 0 else 0.0

    # trending terms over the full bench transcripts corpus (the one-pass
    # analyze IS the operator's own cost — no index reuse by design)
    from datetime import timedelta

    from searchengine_spark.analysis.analyzer import make_analyze_udf
    from searchengine_spark.fixtures import _EPOCH

    split_es = int(_EPOCH.timestamp()) + (bench_convs // 2) * 3600
    extras_times["tr_trending_terms"], _ = timed(
        lambda: sg.trending_terms(
            tr.select(
                F.unix_timestamp("ts").alias("es"),
                make_analyze_udf()(F.col("text")).alias("tokens"),
            ),
            split_es,
            ts_col="es",
            min_after=10,
            top_n=20,
        ).collect()
    )

    # sequence packing over the full bench transcripts corpus (the global
    # prefix sum + fragment explosion IS the operator — no index reuse)
    from searchengine_spark.textops.packing import pack_sequences

    def _pack():
        counts = tr.select(
            "doc_id",
            F.when(F.col("text") != "", F.size(F.split("text", " ")))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )
        frags = pack_sequences(counts, 2048)
        n = frags.count()
        frags.unpersist()
        return n

    extras_times["tr_pack_sequences"], _ = timed(_pack)

    # conversation-level dedup over the full bench transcripts corpus
    # (assembly + MinHash banding IS the operator — no index reuse)
    from searchengine_spark.transcripts import conversation_dedup

    extras_times["tr_conv_dedup"], _ = timed(
        lambda: conversation_dedup(
            tr.select("conv_id", "turn_idx", "role", "text")
        ).count()
    )

    idx.postings.unpersist()
    idx.term_stats.unpersist()
    calib_end = host_calibration()
    total = sum(q.values())
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in q.items()},
                "sf": sf,
                "extras": {
                    "cpus": cpus,
                    "bench_convs": bench_convs,
                    "bench_turns": n_turns,
                    "bench_postings": n_postings,
                    "build_turns_per_sec": round(turns_per_sec, 1),
                    "host_calibration": {
                        "start": calib_start,
                        "end": calib_end,
                    },
                    "newop_sec": {
                        k: round(v, 3) for k, v in extras_times.items()
                    },
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
