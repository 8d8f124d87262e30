#!/usr/bin/env python
"""North-metric evidence: top-k rank-identical BM25 match rate on the
reference query set (FIXTURES.md §2), measured for BOTH engine paths —
the logical DataFrame index and the compressed block artifact with
block-max WAND — against the independent pure-Python oracle engine.

Writes PARITY.json at the repo root:
    {"match_rate": 1.0, "queries": {...}, "paths": ["logical", "wand"], ...}
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ranked_match(got, want) -> bool:
    if len(got) != len(want):
        return False
    for (gd, gs), (wd, ws) in zip(got, want):
        if gd != wd or not math.isclose(gs, ws, rel_tol=0, abs_tol=1e-12):
            return False
    return True


def main() -> None:
    from searchengine_spark.fixtures import QUERY_SET, doc_key_col, transcripts_df
    from searchengine_spark.index import build_index
    from searchengine_spark.index.artifact import build_artifact
    from searchengine_spark.oracle import OracleIndex
    from searchengine_spark.session import get_spark

    spark = get_spark("parity-report")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = (
        transcripts_df(spark, "small")
        .withColumn("doc_id", doc_key_col())
        .select("doc_id", "text")
    )
    lidx = build_index(spark, corpus)
    art_dir = tempfile.mkdtemp(prefix="parity_art_")
    aidx = build_artifact(spark, corpus, art_dir, n_segments=3)
    oracle = OracleIndex(
        {r["doc_id"]: r["text"] for r in corpus.collect()}
    )

    results: dict[str, dict] = {}
    n_ok = 0
    for q in QUERY_SET:
        kind, text, k = q["kind"], q["query_text"], q["k"]
        name = f"q{q['query_id']}-{kind}"
        entry: dict = {"kind": kind, "query": text}
        if kind in ("keyword", "and", "or", "phrase"):
            want = getattr(
                oracle,
                {"keyword": "search_and", "and": "search_and",
                 "or": "search_or", "phrase": "search_phrase"}[kind],
            )(text)
            for label, idx in (("logical", lidx), ("artifact", aidx)):
                got = {
                    r["doc_id"]
                    for r in getattr(
                        idx,
                        {"keyword": "search_keyword", "and": "search_and",
                         "or": "search_or", "phrase": "search_phrase"}[kind],
                    )(text).collect()
                }
                entry[label] = got == want
            entry["n_hits"] = len(want)
        else:
            method = "search_bm25" if kind == "bm25" else "search_tfidf"
            want = getattr(oracle, method)(text, k)
            for label, idx in (("logical", lidx), ("artifact", aidx)):
                got = [
                    (r["doc_id"], r["score"])
                    for r in getattr(idx, method)(text, k).collect()
                ]
                entry[label] = ranked_match(got, want)
            entry["n_hits"] = len(want)
        entry["match"] = bool(entry["logical"] and entry["artifact"])
        n_ok += entry["match"]
        results[name] = entry

    shutil.rmtree(art_dir, ignore_errors=True)
    report = {
        "match_rate": round(n_ok / len(QUERY_SET), 4),
        "n_queries": len(QUERY_SET),
        "n_matched": n_ok,
        "corpus": "small (1000 convs, 5502 turns), composable analyzer",
        "paths": ["logical DataFrame index", "compressed artifact + block-max WAND (bm25)"],
        "criteria": "boolean/phrase: set-identical; ranked: rank-identical "
                    "docIDs with |score diff| <= 1e-12 at every rank",
        "queries": results,
    }
    with open(os.path.join(REPO, "PARITY.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("match_rate", "n_queries", "n_matched")}))
    spark.stop()


if __name__ == "__main__":
    main()
