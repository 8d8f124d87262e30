#!/usr/bin/env python
"""Block-max WAND pruning efficacy: Pareto-front bound vs (max_tf, min_dl).

Builds (or reuses) a transcripts artifact, then for a query set replays the
WAND candidate/seed/θ computation and counts how many candidate blocks each
bound keeps at the SAME θ — the blocks-decoded reduction the tighter bound
buys. Appends a table to BENCH.md.

Usage: python scripts/wand_prune_report.py [--convs 100000] [--path DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "spark shuffle error checkpoint",
    "merge sort algorithm",
    "vector stream compress",
    "index build partition skew",
    "hash join broadcast memory spill",
]


def _base26_word(i: int) -> str:
    """Deterministic letters-only vocabulary word (prefix keeps it off the
    stop list and >= 4 chars)."""
    s = ""
    n = i
    while True:
        s = chr(ord("a") + n % 26) + s
        n //= 26
        if n == 0:
            break
    return "qz" + s.rjust(3, "a")


def _make_zipf_vocab(vocab_size: int):
    """(words, stem->word map): the surface vocabulary plus a reverse map so
    query terms picked from the (stemmed) stats table can be spelled back
    as real corpus words."""
    from searchengine_spark.analysis.porter import stem
    from searchengine_spark.analysis.stopwords import STOP_WORDS

    words, stem_to_word = [], {}
    i = 0
    while len(words) < vocab_size:
        w = _base26_word(i)
        i += 1
        if w in STOP_WORDS:
            continue
        words.append(w)
        stem_to_word.setdefault(stem(w), w)
    return words, stem_to_word


def zipf_corpus(spark, n_docs: int, vocab_size: int, s: float = 1.07,
                avg_len: int = 60, seed: int = 7, topics: int = 0):
    """Deterministic-ish (seeded per batch) Zipf-vocabulary corpus: token
    draws follow P(rank r) ~ 1/r^s over ``vocab_size`` words, doc lengths
    uniform in [avg_len/3, 2*avg_len) — the realistic skewed term
    distribution the flat 330-word fixture corpus deliberately lacks.

    ``topics > 0`` adds the OTHER property real corpora have and i.i.d.
    synthesis lacks: ordinal locality. Docs in contiguous doc_id regions
    (region = id // (n_docs/topics)) draw half their tokens from a
    topic-rotated Zipf (rank r -> word (r + topic*stride) % V), half from
    the global distribution — so topical terms are dense inside their
    region and tail-sparse outside it, the shape block-max pruning exists
    for (an i.i.d. corpus makes every 128-doc block statistically
    identical, and NO admissible block bound can prune — measured below).

    Perf-demo corpus only (never feeds an oracle): exact content depends on
    partition boundaries, the DISTRIBUTION does not."""
    import numpy as np
    import pandas as pd

    words, _ = _make_zipf_vocab(vocab_size)
    V = len(words)
    p = 1.0 / np.power(np.arange(1, V + 1, dtype=np.float64), s)
    p /= p.sum()
    warr = np.array(words, dtype=object)
    stride = V // max(topics, 1)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if not len(ids):
                continue
            rng = np.random.default_rng(seed * 1_000_003 + int(ids[0]))
            lens = rng.integers(avg_len // 3, avg_len * 2, size=len(ids))
            total = int(lens.sum())
            ranks = rng.choice(V, size=total, p=p)
            if topics:
                doc_of = np.repeat(np.arange(len(ids)), lens)
                topic = (ids[doc_of] * topics // n_docs).astype(np.int64)
                topical = rng.random(total) < 0.5
                ranks = np.where(
                    topical, (ranks + topic * stride) % V, ranks
                )
            toks = warr[ranks]
            offs = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            yield pd.DataFrame(
                {
                    "doc_id": [f"d{int(x):09d}" for x in ids],
                    "text": [
                        " ".join(toks[a:b])
                        for a, b in zip(offs[:-1], offs[1:])
                    ],
                }
            )

    return (
        spark.range(n_docs)
        .repartition(64)
        .mapInPandas(gen, "doc_id string, text string")
    )


def bursty_corpus(spark, n_docs: int, vocab_size: int,
                  bursts: list, seed: int = 7, p_hit: float = 0.6):
    """Zipf background + BURSTY terms: each (term, start, end) burst
    appears with prob ``p_hit`` and tf ~ 1+Poisson(1) in docs whose id
    falls in [start, end), and nowhere else. This is the realistic shape
    of time-ordered transcript corpora (a tool/topic dominates a time
    window, and doc_id order follows time) — the ordinal locality that
    block-max pruning exists for, which i.i.d. synthesis lacks."""
    import numpy as np
    import pandas as pd

    base = zipf_corpus(spark, n_docs, vocab_size, seed=seed)

    def inject(batches):
        for pdf in batches:
            ids = pdf["doc_id"].str.slice(1).astype("int64").to_numpy()
            rng = np.random.default_rng(seed * 9_000_011 + int(ids[0]))
            suffix = np.full(len(ids), "", dtype=object)
            for term, s, e in bursts:
                hit = (ids >= s) & (ids < e) & (rng.random(len(ids)) < p_hit)
                reps = 1 + rng.poisson(1.0, size=len(ids))
                for i in np.flatnonzero(hit):
                    suffix[i] += (" " + term) * int(reps[i])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "text": pdf["text"] + suffix}
            )

    return base.mapInPandas(inject, "doc_id string, text string")


def _zipf_queries(aidx, stem_to_word, n_queries: int = 5):
    """Queries mixing df strata (hot head term + mid + tail), spelled with
    surface words that stem to the chosen stats terms — the asymmetric
    shape block-max pruning exists for."""
    from pyspark.sql import functions as F

    stats = (
        aidx.term_stats.orderBy(F.desc("df"))
        .select("term", "df")
        .collect()
    )
    terms = [r["term"] for r in stats if r["term"] in stem_to_word]
    n = len(terms)
    strata = [
        terms[: max(1, n // 200)],                 # head (hottest 0.5%)
        terms[n // 20 : n // 10],                  # mid
        terms[n // 3 : n // 2],                    # tail
    ]
    queries = []
    for q in range(n_queries):
        picks = [
            strata[0][q % len(strata[0])],
            strata[1][(q * 7 + 1) % len(strata[1])],
            strata[2][(q * 13 + 5) % len(strata[2])],
        ]
        queries.append(" ".join(stem_to_word[t] for t in picks))
    return queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100000)
    ap.add_argument("--path", default="")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument(
        "--zipf-vocab", type=int, default=0,
        help="build a Zipf-vocabulary corpus of --convs docs over this many "
        "words instead of the fixture transcripts (0 = off)",
    )
    ap.add_argument(
        "--topics", type=int, default=0,
        help="with --zipf-vocab: give the corpus topical ordinal locality "
        "(contiguous doc regions drawing half their tokens from a "
        "topic-rotated Zipf) and query topical term triples",
    )
    ap.add_argument(
        "--bursty", action="store_true",
        help="with --zipf-vocab: inject bursty terms (time-windowed, "
        "partially overlapping) and query burst triples — the "
        "time-ordered-transcripts shape where block alignment pays",
    )
    ap.add_argument(
        "--rarehot", action="store_true",
        help="with --bursty: query a rare burst term paired with the "
        "global Zipf HEAD word (present in ~every doc) — the classic "
        "necessary-term-gating shape: the hot term's max ub sits below "
        "θ, so its blocks outside the rare term's posting buckets drop "
        "wholesale",
    )
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from searchengine_spark.fixtures import doc_key_col, transcripts_df
    from searchengine_spark.index.artifact import build_artifact, load_artifact
    from searchengine_spark.query.ranked import _query_weights, bm25_idf
    from searchengine_spark.query.wand import (
        _aligned_keep_ids,
        _block_buckets,
        _bucket_wlog,
        _gate_keep_ids,
        _score_blocks,
        _wide_max,
    )
    from searchengine_spark.session import get_spark

    spark = get_spark("wand-prune", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    tag = (
        f"zipf{args.zipf_vocab}t{args.topics}"
        + ("b" if args.bursty else "")
        + "_"
        if args.zipf_vocab
        else ""
    )
    path = args.path or os.path.join(
        "/tmp", f"wand_prune_artifact_{tag}{args.convs}"
    )
    # burst windows: per query group q, three terms in staggered windows
    # (width w, stagger w*0.3) so the triple overlap is 40% of a window —
    # blocks outside it are what alignment should prune
    w = args.convs // 6
    burst_list = [
        (f"qburst{3 * q + j}", q * args.convs // 6 + j * (3 * w // 10),
         q * args.convs // 6 + j * (3 * w // 10) + w)
        for q in range(5)
        for j in range(3)
    ]
    if not os.path.exists(os.path.join(path, "snapshots")):
        if args.zipf_vocab and args.bursty:
            corpus = bursty_corpus(
                spark, args.convs, args.zipf_vocab, burst_list
            )
        elif args.zipf_vocab:
            corpus = zipf_corpus(
                spark, args.convs, args.zipf_vocab, topics=args.topics
            )
        else:
            corpus = transcripts_df(spark, n_convs=args.convs).withColumn(
                "doc_id", doc_key_col()
            )
        build_artifact(
            spark, corpus.select("doc_id", "text"), path,
            source_desc=f"wand prune report {tag}{args.convs} convs",
        )
    aidx = load_artifact(spark, path)

    if args.zipf_vocab and args.bursty and args.rarehot:
        words, _ = _make_zipf_vocab(args.zipf_vocab)
        queries = [f"qburst{3 * q} {words[0]}" for q in range(5)]
        print(json.dumps({"rarehot_queries": queries}), flush=True)
    elif args.zipf_vocab and args.bursty:
        queries = [
            " ".join(f"qburst{3 * q + j}" for j in range(3))
            for q in range(5)
        ]
        print(json.dumps({"burst_queries": queries}), flush=True)
    elif args.zipf_vocab and args.topics:
        # topical queries: each topic's 3 head words — dense in that
        # topic's doc region, tail-sparse everywhere else
        words, _ = _make_zipf_vocab(args.zipf_vocab)
        stride = len(words) // args.topics
        queries = [
            " ".join(
                words[(r + t * stride) % len(words)] for r in range(3)
            )
            for t in range(1, args.topics, max(1, args.topics // 5))
        ][:5]
        print(json.dumps({"topical_queries": queries}), flush=True)
    elif args.zipf_vocab:
        _, stem_to_word = _make_zipf_vocab(args.zipf_vocab)
        queries = _zipf_queries(aidx, stem_to_word)
        print(json.dumps({"zipf_queries": queries}), flush=True)
    else:
        queries = QUERIES

    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1 + 1.0) / (
            t + k1 * (1.0 - b + b * dl.cast("double") / F.lit(avgdl))
        )

    rows = []
    for query in queries:
        weights = _query_weights(aidx, query, bm25_idf)
        if not weights:
            continue
        qdf = spark.createDataFrame(weights, "term string, qtf int, idf double")
        terms = [t for t, _, _ in weights]
        ub_front = (
            F.col("qtf") * F.col("idf")
            * F.array_max(F.zip_with("ub_tfs", "ub_dls", part))
        )
        mtf = F.col("max_tf").cast("double")
        comp = mtf * (k1 + 1.0) / (
            mtf + k1 * (1.0 - b + b * F.col("min_dl") / F.lit(avgdl))
        )
        ub_old = F.col("qtf") * F.col("idf") * comp
        cand = (
            aidx.blocks_for_terms(terms)
            .join(F.broadcast(qdf), "term")
            .withColumn("ubf", ub_front)
            .withColumn("ubo", ub_old)
            .withColumn("ub", ub_front)
            .withColumn("bid", F.concat_ws("#", "seg", "block_seq", "term"))
            .persist()
        )
        stats = cand.groupBy("term").agg(
            F.max("ubf").alias("mf"), F.max("ubo").alias("mo"),
            F.count(F.lit(1)).alias("nb"),
            F.expr(
                "approx_percentile(last_ord - first_ord + 1, 0.5)"
            ).alias("ms"),
        ).collect()
        n_blocks = sum(r["nb"] for r in stats)
        tot_f = sum(r["mf"] for r in stats)
        tot_o = sum(r["mo"] for r in stats)
        gf = {r["term"]: r["mf"] for r in stats}
        go = {r["term"]: r["mo"] for r in stats}

        # θ = the TRUE k-th score (exhaustive scoring) — the ideal the real
        # path's two-phase seed approximates; the bound comparison below is
        # then a property of the bounds, not of seed quality. (The old
        # per-term-only seed θ was the round-3 finding: it sat at the best
        # single-term partial and NO bound could prune against it.)
        top = (
            _score_blocks(aidx, cand, qdf)
            .orderBy(F.desc("score")).limit(args.k).collect()
        )
        theta = min(r["score"] for r in top) if len(top) >= args.k else float("-inf")

        others_f = spark.createDataFrame(
            [(t, tot_f - gf[t]) for t in gf], "term string, o double"
        )
        others_o = spark.createDataFrame(
            [(t, tot_o - go[t]) for t in go], "term string, o double"
        )
        kept_f = cand.join(F.broadcast(others_f), "term").where(
            F.col("ubf") + F.col("o") >= theta
        ).count()
        kept_o = cand.join(F.broadcast(others_o), "term").where(
            F.col("ubo") + F.col("o") >= theta
        ).count()
        med_span = min(r["ms"] for r in stats if r["ms"] is not None)
        wlog = _bucket_wlog(med_span)
        meta = _block_buckets(cand, wlog)
        wide = _wide_max(meta, gf)
        keep_ids = _aligned_keep_ids(spark, meta, gf, tot_f, theta, wide)
        gate_ids = _gate_keep_ids(spark, aidx, cand, meta, gf, theta, wlog)
        if gate_ids is not None:
            keep_ids = keep_ids.join(gate_ids, "bid", "left_semi")
        kept_a = cand.join(keep_ids, "bid", "left_semi").count()

        t0 = time.perf_counter()
        n_res = aidx.search_bm25(query, args.k).count()
        wall = time.perf_counter() - t0
        cand.unpersist()
        rows.append(
            {
                "query": query, "cand_blocks": n_blocks,
                "kept_front": kept_f, "kept_composite": kept_o,
                "kept_aligned": kept_a,
                "theta": round(theta, 4), "results": n_res,
                "search_sec": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    total_c = sum(r["cand_blocks"] for r in rows)
    total_f = sum(r["kept_front"] for r in rows)
    total_o = sum(r["kept_composite"] for r in rows)
    total_a = sum(r["kept_aligned"] for r in rows)
    print(json.dumps({
        "total_candidate_blocks": total_c,
        "kept_front": total_f,
        "kept_composite": total_o,
        "kept_aligned": total_a,
        "front_vs_composite_reduction": round(1 - total_f / max(total_o, 1), 3),
        "aligned_vs_global_reduction": round(1 - total_a / max(total_f, 1), 3),
    }))

    md_rows = "\n".join(
        f"| {r['query']} | {r['cand_blocks']:,} | {r['kept_composite']:,} | "
        f"{r['kept_front']:,} | {r['kept_aligned']:,} | {r['search_sec']} |"
        for r in rows
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## WAND block pruning: Pareto-front vs composite bound "
            f"({time.strftime('%Y-%m-%d %H:%M', time.gmtime())} UTC, "
            f"{args.convs:,} "
            + (
                f"Zipf-vocab({args.zipf_vocab:,}) docs"
                if args.zipf_vocab
                else "convs"
            )
            + f", k={args.k})\n\n"
            f"Blocks KEPT (decoded) at the same θ under each per-block upper "
            f"bound — composite = part(max_tf, min_dl) with global others; "
            f"front = exact Pareto-front block max with global others; "
            f"aligned = front bound + block-aligned others (true BMW):\n\n"
            f"| query | candidate blocks | kept (composite) | kept (front) "
            f"| kept (aligned) | search s |\n|---|---|---|---|---|---|\n"
            f"{md_rows}\n\n"
            f"**Totals: {total_c:,} candidates -> {total_o:,} kept "
            f"(composite), {total_f:,} (front), {total_a:,} (aligned: "
            f"{round(100 * (1 - total_a / max(total_c, 1)), 1)}% of "
            f"candidate blocks pruned).**\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
