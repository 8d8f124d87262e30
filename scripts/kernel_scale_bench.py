#!/usr/bin/env python
"""Before/after timing of the simhash + fingerprint pandas-UDF kernels at
>= 1M docs (the VERDICT r2 item: vectorize the last per-row-Python
kernels, "BENCH.md before/after on a >=1M-doc corpus").

The OLD per-row kernels live only here, re-registered as pandas UDFs, so
both variants run over the SAME Spark corpus in the same session — a true
A/B, not an extrapolation. Appends results to BENCH.md.

Usage: python scripts/kernel_scale_bench.py [--convs 200000]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _simhash_old_batch(texts: pd.Series) -> pd.Series:
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        if not text:
            continue
        tokens = text.lower().split()
        if not tokens:
            continue
        uniq, counts = np.unique(
            np.asarray(tokens, dtype=object), return_counts=True
        )
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in uniq
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        sim = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sim |= np.uint64(1) << np.uint64(b)
        out[row] = np.int64(sim)
    return pd.Series(out)


def _fingerprint_old_batch(texts: pd.Series) -> pd.Series:
    B, P, K = 257, (1 << 61) - 1, 8
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        if not text or len(text) < K:
            continue
        vals = np.frombuffer(
            text.encode("utf-8", "surrogatepass"), dtype=np.uint8
        )
        n = len(vals)
        if n < K:
            continue
        powers = [pow(B, K - 1 - i, P) for i in range(K)]
        acc = 0
        for k in range(K):
            acc = (acc * B + int(vals[k])) % P
        best = acc
        top = powers[0]
        for i in range(1, n - K + 1):
            acc = ((acc - int(vals[i - 1]) * top) * B + int(vals[i + K - 1])) % P
            if acc < best:
                best = acc
        out[row] = np.int64(best % (1 << 62))
    return pd.Series(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200000)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from searchengine_spark.fixtures import doc_key_col, transcripts_df
    from searchengine_spark.session import get_spark
    from searchengine_spark.textops.quality import (
        fingerprint_udf,
        simhash64_udf,
    )

    spark = get_spark("kernel-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = (
        transcripts_df(spark, n_convs=args.convs, partitions=128)
        .withColumn("doc_id", doc_key_col())
        .select("doc_id", "text")
        .persist()
    )
    n = corpus.count()
    old_sim = pandas_udf(_simhash_old_batch, LongType())
    old_fp = pandas_udf(_fingerprint_old_batch, LongType())

    def timed(col):
        t0 = time.perf_counter()
        # max: cheap non-overflowing aggregate that still forces the UDF
        # to run on every row
        corpus.select(F.max(col)).collect()
        return time.perf_counter() - t0

    res = {}
    # alternate order to cancel cache effects; two passes each, keep min
    for label, col in [
        ("simhash_new", simhash64_udf("text")),
        ("simhash_old", old_sim("text")),
        ("fingerprint_new", fingerprint_udf("text")),
        ("fingerprint_old", old_fp("text")),
    ]:
        res[label] = min(timed(col), timed(col))
        print(label, round(res[label], 2), flush=True)

    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## Kernel A/B at scale ({n:,} docs, local[32], "
            f"{time.strftime('%Y-%m-%d %H:%M', time.gmtime())} UTC)\n\n"
            f"Old per-row-Python kernels re-registered side-by-side with the "
            f"shipped batch-numpy kernels, same session, same corpus, min of "
            f"2 passes:\n\n"
            f"| kernel | per-row Python (old) | batch numpy (shipped) | "
            f"speedup |\n|---|---|---|---|\n"
            f"| simhash64 | {res['simhash_old']:.1f} s | "
            f"{res['simhash_new']:.1f} s | "
            f"{res['simhash_old'] / res['simhash_new']:.1f}x |\n"
            f"| fingerprint | {res['fingerprint_old']:.1f} s | "
            f"{res['fingerprint_new']:.1f} s | "
            f"{res['fingerprint_old'] / res['fingerprint_new']:.1f}x |\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
