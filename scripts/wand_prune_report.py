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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100000)
    ap.add_argument("--path", default="")
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from searchengine_spark.fixtures import doc_key_col, transcripts_df
    from searchengine_spark.index.artifact import build_artifact, load_artifact
    from searchengine_spark.query.ranked import _query_weights, bm25_idf
    from searchengine_spark.query.wand import _score_blocks
    from searchengine_spark.session import get_spark

    spark = get_spark("wand-prune", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    path = args.path or os.path.join(
        "/tmp", f"wand_prune_artifact_{args.convs}"
    )
    if not os.path.exists(os.path.join(path, "snapshots")):
        corpus = transcripts_df(spark, n_convs=args.convs).withColumn(
            "doc_id", doc_key_col()
        )
        build_artifact(
            spark, corpus.select("doc_id", "text"), path,
            source_desc=f"wand prune report {args.convs} convs",
        )
    aidx = load_artifact(spark, path)

    k1, b = float(aidx.k1), float(aidx.b)
    avgdl = float(aidx.avgdl) or 1.0

    def part(tf, dl):
        t = tf.cast("double")
        return t * (k1 + 1.0) / (
            t + k1 * (1.0 - b + b * dl.cast("double") / F.lit(avgdl))
        )

    rows = []
    for query in QUERIES:
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
            .persist()
        )
        stats = cand.groupBy("term").agg(
            F.max("ubf").alias("mf"), F.max("ubo").alias("mo"),
            F.count(F.lit(1)).alias("nb"),
        ).collect()
        n_blocks = sum(r["nb"] for r in stats)
        tot_f = sum(r["mf"] for r in stats)
        tot_o = sum(r["mo"] for r in stats)
        gf = {r["term"]: r["mf"] for r in stats}
        go = {r["term"]: r["mo"] for r in stats}

        # θ seed exactly as the real path (using the shipped front bound)
        n_seed = math.ceil(args.k / aidx.block_size) + 1
        w = Window.partitionBy("term").orderBy(
            F.desc("ubf"), F.asc("first_ord"), F.asc("block_seq")
        )
        seed = cand.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= n_seed
        )
        top = (
            _score_blocks(aidx, seed, qdf)
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

        t0 = time.perf_counter()
        n_res = aidx.search_bm25(query, args.k).count()
        wall = time.perf_counter() - t0
        cand.unpersist()
        rows.append(
            {
                "query": query, "cand_blocks": n_blocks,
                "kept_front": kept_f, "kept_composite": kept_o,
                "theta": round(theta, 4), "results": n_res,
                "search_sec": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    total_c = sum(r["cand_blocks"] for r in rows)
    total_f = sum(r["kept_front"] for r in rows)
    total_o = sum(r["kept_composite"] for r in rows)
    print(json.dumps({
        "total_candidate_blocks": total_c,
        "kept_front": total_f,
        "kept_composite": total_o,
        "front_vs_composite_reduction": round(1 - total_f / max(total_o, 1), 3),
    }))

    md_rows = "\n".join(
        f"| {r['query']} | {r['cand_blocks']:,} | {r['kept_composite']:,} | "
        f"{r['kept_front']:,} | {r['search_sec']} |"
        for r in rows
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## WAND block pruning: Pareto-front vs composite bound "
            f"({time.strftime('%Y-%m-%d %H:%M', time.gmtime())} UTC, "
            f"{args.convs:,} convs, k={args.k})\n\n"
            f"Blocks KEPT (decoded) at the same θ under each per-block upper "
            f"bound — the front bound is the exact per-block max, the "
            f"composite is part(max_tf, min_dl):\n\n"
            f"| query | candidate blocks | kept (composite) | kept (front) "
            f"| search s |\n|---|---|---|---|---|\n{md_rows}\n\n"
            f"**Totals: {total_c:,} candidates -> {total_o:,} kept under the "
            f"composite bound, {total_f:,} under the Pareto front "
            f"({round(100 * (1 - total_f / max(total_o, 1)), 1)}% fewer "
            f"blocks decoded).**\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
