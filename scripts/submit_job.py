#!/usr/bin/env python
"""spark-submit entry point: build / query / compact the index artifact on a
real cluster (the north rule's ``spark-submit --py-files`` contract).

Package and submit::

    cd <repo> && zip -qr /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_job.py build \
        --input  s3://bucket/transcripts_parquet \
        --output s3://bucket/index_artifact \
        --segments 16

    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_job.py query \
        --index s3://bucket/index_artifact --q "spark shuffle error" --k 10

    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_job.py compact \
        --index s3://bucket/index_artifact --output s3://bucket/index_v2

Lifecycle commands (same submission shape): ``append`` ingests one new
parquet increment as a committed segment (idempotent per --batch-id —
re-running a crashed ingestion job is a no-op), ``tag``/``expire``/
``snapshots`` manage named versions and GC, ``changelog`` reads the docs
added between two snapshots (the downstream process-only-new-data scan).

The master/executor topology comes from spark-submit; this script only sets
engine-relevant session conf (AQE, Arrow). Re-running a killed ``build``
with the same arguments resumes from the last committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True, help="transcripts parquet/table path")
    b.add_argument("--output", required=True, help="artifact path")
    b.add_argument("--doc-id-col", default=None,
                   help="doc id column; default derives conv_id:turn_idx")
    b.add_argument("--text-col", default="text")
    b.add_argument("--analyzer", default="composable")
    b.add_argument("--segments", type=int, default=1)
    b.add_argument("--no-positions", action="store_true")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="auto", choices=["auto", "wand", "exhaustive"])

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--output", required=True)

    a = sub.add_parser("append")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--doc-id-col", default=None)
    a.add_argument("--text-col", default="text")
    a.add_argument("--batch-id", type=int, default=None,
                   help="idempotency key: a re-run with the same id is a no-op")
    a.add_argument("--branch", default="main",
                   help="stage on an existing branch (write-audit-publish)")

    t = sub.add_parser("tag")
    t.add_argument("--index", required=True)
    t.add_argument("--name", required=True)
    t.add_argument("--snapshot-id", type=int, default=None)
    t.add_argument("--remove", action="store_true")
    t.add_argument("--replace", action="store_true")

    br = sub.add_parser(
        "branch",
        help="create/drop/fast-forward writable refs (write-audit-publish)",
    )
    br.add_argument("--index", required=True)
    br.add_argument("--create", default=None, metavar="NAME")
    br.add_argument("--drop", default=None, metavar="NAME")
    br.add_argument("--publish", default=None, metavar="NAME",
                    help="fast-forward main to this branch's head")
    br.add_argument("--snapshot-id", type=int, default=None)

    e = sub.add_parser("expire")
    e.add_argument("--index", required=True)
    e.add_argument("--keep-last", type=int, default=1)

    sn = sub.add_parser("snapshots")
    sn.add_argument("--index", required=True)

    ch = sub.add_parser("changelog")
    ch.add_argument("--index", required=True)
    ch.add_argument("--from-snapshot", type=int, required=True)
    ch.add_argument("--to-snapshot", type=int, default=None)

    dv = sub.add_parser(
        "doc-vectors",
        help="corpus-wide sparse TF-IDF vectors (top-n terms per doc) to parquet",
    )
    dv.add_argument("--index", required=True)
    dv.add_argument("--output", required=True, help="parquet output path")
    dv.add_argument("--n-terms", type=int, default=10)

    lt = sub.add_parser(
        "ltr-features",
        help="per (query, BM25-top-k candidate) feature vectors to parquet",
    )
    lt.add_argument("--index", required=True)
    lt.add_argument("--output", required=True, help="parquet output path")
    lt.add_argument(
        "--queries", required=True,
        help='JSON object {"query_id": "query text", ...} or a path to one',
    )
    lt.add_argument("--k", type=int, default=20)
    lt.add_argument(
        "--judgments", default=None,
        help="optional parquet of (query_id, doc_id, grade) label joins",
    )
    lt.add_argument(
        "--proximity", action="store_true",
        help="append min_pair_dist via candidate-restricted positional decode",
    )

    cl = sub.add_parser(
        "classify",
        help="hashed linear quality-classifier scores (and keep labels) "
        "to parquet",
    )
    cl.add_argument("--input", required=True, help="docs parquet with doc_id,text")
    cl.add_argument("--output", required=True, help="parquet output path")
    cl.add_argument("--threshold-milli", type=int, default=None,
                    help="keep rule: mean milli-weight > this (default 50)")
    cl.add_argument(
        "--weights", default=None,
        help="optional parquet of (feature_id, weight_milli) — a trained "
        "model's sparse weight vector; frozen formula weights if absent",
    )
    cl.add_argument("--keep-only", action="store_true",
                    help="write only rows whose keep label is true")

    se = sub.add_parser(
        "shard-export",
        help="deterministic global shuffle -> N balanced parquet shards "
        "(shard=K/ directories) + per-shard audit stats",
    )
    se.add_argument("--input", required=True, help="docs parquet with doc_id,text")
    se.add_argument("--output", required=True, help="shard root path")
    se.add_argument("--shards", type=int, default=64)
    se.add_argument("--salt", default="", help="reshuffle key; same salt => "
                    "byte-identical shards on re-export")

    cd = sub.add_parser(
        "conv-dedup",
        help="conversation-level dedup report (novel/exact_dup/near_dup) to parquet",
    )
    cd.add_argument("--input", required=True, help="transcripts parquet/table path")
    cd.add_argument("--output", required=True, help="parquet output path")
    cd.add_argument("--est-threshold", type=float, default=0.5,
                    help="signature-estimated Jaccard cut for near-dups")

    args = ap.parse_args()
    spark = _session(f"searchengine-{args.cmd}")

    if args.cmd == "build":
        from pyspark.sql import functions as F

        from searchengine_spark.index.artifact import build_artifact

        corpus = spark.read.parquet(args.input)
        id_col = args.doc_id_col
        if id_col is None:
            # BASELINE input_hint docID: conv_id:turn_idx (zero-padded stable)
            corpus = corpus.withColumn(
                "doc_id",
                F.concat_ws(
                    ":",
                    F.col("conv_id"),
                    F.lpad(F.col("turn_idx").cast("string"), 4, "0"),
                ),
            )
            id_col = "doc_id"
        idx = build_artifact(
            spark,
            corpus,
            args.output,
            doc_id_col=id_col,
            text_col=args.text_col,
            analyzer=args.analyzer,
            positional=not args.no_positions,
            n_segments=args.segments,
            source_desc=args.input,
        )
        print(json.dumps({
            "n_docs": idx.n_docs,
            "avgdl": idx.avgdl,
            "snapshot_id": idx.snapshot["snapshot_id"],
            "segments": len(idx.snapshot["segments"]),
            "postings": sum(s["n_postings"] for s in idx.snapshot["segments"]),
            "bytes": sum(s["bytes"] for s in idx.snapshot["segments"]),
        }))
    elif args.cmd == "query":
        from searchengine_spark.index.artifact import load_artifact

        idx = load_artifact(spark, args.index)
        rows = idx.search_bm25(args.q, args.k, mode=args.mode).collect()
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    elif args.cmd == "compact":
        from searchengine_spark.index.artifact import compact

        idx = compact(spark, args.index, args.output)
        print(json.dumps({
            "n_docs": idx.n_docs,
            "snapshot_id": idx.snapshot["snapshot_id"],
        }))
    elif args.cmd == "append":
        from pyspark.sql import functions as F

        from searchengine_spark.index.artifact import append_segment

        corpus = spark.read.parquet(args.input)
        if args.doc_id_col is None:
            corpus = corpus.withColumn(
                "doc_id",
                F.concat_ws(
                    ":",
                    F.col("conv_id"),
                    F.lpad(F.col("turn_idx").cast("string"), 4, "0"),
                ),
            )
        elif args.doc_id_col != "doc_id":
            corpus = corpus.withColumnRenamed(args.doc_id_col, "doc_id")
        if args.text_col != "text":
            corpus = corpus.withColumnRenamed(args.text_col, "text")
        idx = append_segment(
            spark, corpus.select("doc_id", "text"), args.index,
            source_desc=args.input, stream_batch_id=args.batch_id,
            branch=args.branch,
        )
        print(json.dumps({
            "n_docs": idx.n_docs,
            "snapshot_id": idx.snapshot["snapshot_id"],
            "segments": len(idx.snapshot["segments"]),
            "branch": args.branch,
        }))
    elif args.cmd == "branch":
        from searchengine_spark.index.artifact import (
            create_branch,
            drop_branch,
            fast_forward,
            list_branches,
        )

        chosen = [
            (k, v)
            for k, v in (("create", args.create), ("drop", args.drop),
                         ("publish", args.publish))
            if v is not None
        ]
        if len(chosen) != 1 or not chosen[0][1]:
            raise SystemExit(
                "pass exactly one of --create/--drop/--publish with a "
                "non-empty branch name"
            )
        action, name = chosen[0]
        if args.snapshot_id is not None and action != "create":
            raise SystemExit("--snapshot-id only applies to --create")
        if action == "create":
            sid = create_branch(args.index, name, args.snapshot_id)
            print(json.dumps({"created": name, "snapshot_id": sid}))
        elif action == "drop":
            sid = drop_branch(args.index, name)
            print(json.dumps({"dropped": name, "was_at": sid}))
        else:
            sid = fast_forward(args.index, "main", name)
            print(json.dumps({"published": name, "main_at": sid,
                              "branches": list_branches(args.index)}))
    elif args.cmd == "tag":
        from searchengine_spark.index.artifact import create_tag, remove_tag

        if args.remove:
            sid = remove_tag(args.index, args.name)
        else:
            sid = create_tag(
                args.index, args.name, args.snapshot_id, replace=args.replace
            )
        print(json.dumps({"tag": args.name, "snapshot_id": sid,
                          "removed": bool(args.remove)}))
    elif args.cmd == "expire":
        from searchengine_spark.index.artifact import expire_snapshots

        print(json.dumps(expire_snapshots(args.index, args.keep_last)))
    elif args.cmd == "snapshots":
        from searchengine_spark.index.artifact import (
            list_branches,
            list_refs,
            list_snapshots,
            read_snapshot,
        )

        names = list_snapshots(args.index)
        refs = list_refs(args.index)
        branches = list_branches(args.index)
        out = []
        for n in names:
            sid = int(n[len("snap-"):-len(".json")])
            snap = read_snapshot(args.index, sid)
            out.append({
                "snapshot_id": sid,
                "segments": sorted(
                    s["segment_id"] for s in snap["segments"]
                ),
                "n_docs": sum(s["n_docs"] for s in snap["segments"]),
                "tags": sorted(k for k, v in refs.items() if v == sid),
                "branches": sorted(
                    k for k, v in branches.items() if v == sid
                ),
            })
        print(json.dumps(out))
    elif args.cmd == "changelog":
        from searchengine_spark.index.artifact import docs_added_between

        added = docs_added_between(
            spark, args.index, args.from_snapshot, args.to_snapshot
        )
        print(json.dumps({"n_added": added.count()}))
    elif args.cmd == "doc-vectors":
        from searchengine_spark.index.artifact import load_artifact
        from searchengine_spark.query.morelike import doc_vectors

        idx = load_artifact(spark, args.index)
        vecs = doc_vectors(idx, n_terms=args.n_terms)
        vecs.write.mode("overwrite").parquet(args.output)
        print(json.dumps({
            "rows": spark.read.parquet(args.output).count(),
            "n_terms": args.n_terms,
        }))
    elif args.cmd == "ltr-features":
        import os

        from searchengine_spark.index.artifact import load_artifact
        from searchengine_spark.query.ltr import ltr_features

        spec = args.queries
        if os.path.exists(spec):
            with open(spec) as fh:
                spec = fh.read()
        queries = json.loads(spec)
        idx = load_artifact(spark, args.index)
        judgments = (
            spark.read.parquet(args.judgments) if args.judgments else None
        )
        feats = ltr_features(
            idx, queries, k=args.k, judgments=judgments,
            proximity=args.proximity,
        )
        feats.write.mode("overwrite").parquet(args.output)
        print(json.dumps({
            "rows": spark.read.parquet(args.output).count(),
            "queries": len(queries),
            "k": args.k,
        }))
    elif args.cmd == "classify":
        from searchengine_spark.textops import classifier as _clf

        docs = spark.read.parquet(args.input)
        thr = (
            args.threshold_milli
            if args.threshold_milli is not None
            else _clf.DEFAULT_THRESHOLD_MILLI
        )
        if args.weights:
            weights = spark.read.parquet(args.weights)
            scored = _clf.score_with_weight_table(
                docs, weights, threshold_milli=thr
            )
        else:
            scored = _clf.classifier_scores(docs, threshold_milli=thr)
        if args.keep_only:
            scored = scored.where("keep")
        scored.write.mode("overwrite").parquet(args.output)
        persisted = spark.read.parquet(args.output)
        n_total = persisted.count()
        n_keep = persisted.where("keep").count()
        print(json.dumps({
            "docs_scored": n_total,
            "docs_kept": n_keep,
            "threshold_milli": thr,
            "weights": args.weights or "formula",
        }))
    elif args.cmd == "shard-export":
        from searchengine_spark.textops import sharding as _shd

        docs = spark.read.parquet(args.input)
        _shd.export_shards(
            docs, args.output, n_shards=args.shards, salt=args.salt
        )
        stats = _shd.shard_stats(
            docs, n_shards=args.shards, salt=args.salt
        ).collect()
        # groupBy drops empty shards; the audit must surface them (an
        # empty shard=K/ directory is the worst case it exists to catch)
        by_shard = {int(r["shard"]): int(r["n_docs"]) for r in stats}
        n_docs = [by_shard.get(s, 0) for s in range(args.shards)]
        print(json.dumps({
            "shards": args.shards,
            "empty_shards": sum(1 for n in n_docs if n == 0),
            "docs": int(sum(n_docs)),
            "min_shard_docs": int(min(n_docs)) if n_docs else 0,
            "max_shard_docs": int(max(n_docs)) if n_docs else 0,
            "tokens": int(sum(r["n_tokens"] for r in stats)),
        }))
    elif args.cmd == "conv-dedup":
        from searchengine_spark.transcripts import conversation_dedup

        tr = spark.read.parquet(args.input)
        out = conversation_dedup(tr, est_threshold=args.est_threshold)
        out.write.mode("overwrite").parquet(args.output)
        persisted = spark.read.parquet(args.output)
        counts = {
            r["status"]: r["count"]
            for r in persisted.groupBy("status").count().collect()
        }
        print(json.dumps({
            "convs": persisted.count(),
            "by_status": counts,
            "est_threshold": args.est_threshold,
        }))
    spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()
