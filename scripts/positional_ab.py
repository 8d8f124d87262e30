"""Wide-positional-scan A/B of the batch-vectorized positional decode
barrier vs the old per-block loop (VERDICT r4 item 5: session-16's A/B
was 330k turns / ~8% e2e; the claimed compounding win is on WIDE
positional scans — rescore/NEAR over hot terms — at >= 1M turns).

Arms alternate within one JVM (decoder monkeypatched per rep): `new` is
the shipped `_make_decoder(True)` (batch concat decode + Arrow-native
positions); `old` replays every Arrow batch through the per-block
`unpack_block` loop with an object positions column — the pre-session-16
shape.  Workloads:

  * `wide_scan`: positional decode of the N hottest terms, reduced
    JVM-side (sum of tf and of position-list sizes) — the barrier cost
    in isolation, nothing above it.
  * `near_batch`: NEAR(window=6) over hot-term pairs — e2e proximity,
    JVM matching above the barrier included.

Usage: python scripts/positional_ab.py [--convs 250000] [--reps 4]
               [--hot-terms 12] [--cpus 8]
Prints one JSON line; append the table to BENCH.md by hand.
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def _old_make_decoder(positional: bool):
    """The pre-session-16 positional barrier: one `unpack_block` call per
    block row, positions as a Python-object column of per-posting
    ndarrays. Defined here (script scope) so cloudpickle ships it by
    value; `unpack_block` itself resolves from the shipped package."""
    from searchengine_spark.index.blocks import unpack_block

    def decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ords_l, terms_l, tfs_l, dls_l, pos_l = [], [], [], [], []
            for row in pdf.to_dict("records"):
                u = unpack_block(row, with_positions=positional)
                n = len(u["ords"])
                ords_l.append(u["ords"])
                tfs_l.append(u["tfs"])
                dls_l.append(u["dls"])
                terms_l.append(np.repeat(row["term"], n))
                if positional:
                    if u["pos"] is not None:
                        pos_l.extend(u["pos"])
                    else:
                        pos_l.extend([None] * n)
            if not ords_l:
                continue
            out = {
                "doc_ord": np.concatenate(ords_l),
                "term": np.concatenate(terms_l),
                "tf": np.concatenate(tfs_l).astype(np.int32),
            }
            if positional:
                out["positions"] = pos_l
            out["dl"] = np.concatenate(dls_l).astype(np.int32)
            yield pd.DataFrame(out)

    return decode


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=250_000)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--hot-terms", type=int, default=12)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--work", default="/tmp/posab")
    args = ap.parse_args()

    import os

    from pyspark.sql import functions as F

    from searchengine_spark.index import artifact as art_mod
    from searchengine_spark.index.artifact import build_artifact, load_artifact
    from searchengine_spark.session import get_spark
    from searchengine_spark.fixtures import transcripts_df, doc_key_col

    spark = get_spark(
        "positional-ab",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    art_dir = os.path.join(args.work, "artifact")
    if not os.path.exists(os.path.join(art_dir, "_snapshots")):
        src = os.path.join(args.work, "transcripts")
        if not os.path.exists(src):
            df = transcripts_df(
                spark, n_convs=args.convs, partitions=128
            ).withColumn("doc_id", doc_key_col())
            df.select("doc_id", "text").write.mode("overwrite").parquet(src)
        corpus = spark.read.parquet(src)
        build_artifact(spark, corpus, art_dir, source_desc="positional A/B")
    idx = load_artifact(spark, art_dir)
    n_turns = idx.n_docs

    # hottest terms by df from the stats table (the wide-scan shape: a
    # hot term's postings span many blocks)
    # stats hold ANALYZED terms; keep only analyzer fixed points so the
    # NEAR queries (which re-analyze) hit exactly these hot terms
    hot = [
        r["term"]
        for r in idx.term_stats.orderBy(F.desc("df"))
        .limit(4 * args.hot_terms)
        .collect()
        if idx.analyze_query(r["term"]) == [r["term"]]
    ][: args.hot_terms]
    pairs = [(hot[i], hot[(i + 1) % len(hot)]) for i in range(0, 6)]

    new_decoder = art_mod._make_decoder

    def wide_scan():
        df = idx.postings_for_terms(hot, positional=True, spread=True)
        return df.agg(
            F.sum("tf").alias("s"), F.sum(F.size("positions")).alias("p")
        ).collect()

    def near_batch():
        total = 0
        for a, b in pairs:
            total += idx.search_near(f"{a} {b}", window=6).count()
        return total

    arms = {"new": new_decoder, "old": _old_make_decoder}
    # warm both arms once (codegen, python workers, page cache)
    for dec in arms.values():
        art_mod._make_decoder = dec
        wide_scan()
        near_batch()
    times = {w: {a: [] for a in arms} for w in ("wide_scan", "near_batch")}
    for _ in range(args.reps):
        for arm, dec in arms.items():
            art_mod._make_decoder = dec
            t0 = time.perf_counter()
            wide_scan()
            times["wide_scan"][arm].append(
                round(time.perf_counter() - t0, 2)
            )
            t0 = time.perf_counter()
            near_batch()
            times["near_batch"][arm].append(
                round(time.perf_counter() - t0, 2)
            )
    art_mod._make_decoder = new_decoder
    med = {
        w: {a: round(statistics.median(v), 2) for a, v in d.items()}
        for w, d in times.items()
    }
    print(
        json.dumps(
            {
                "turns": n_turns,
                "hot_terms": args.hot_terms,
                "cpus": args.cpus,
                "runs": times,
                "medians": med,
                "speedup": {
                    w: round(med[w]["old"] / med[w]["new"], 2)
                    for w in med
                    if med[w]["new"] > 0
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
