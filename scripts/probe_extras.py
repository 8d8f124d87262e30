"""Standalone re-measurement of individual bench extras (VERDICT r4 item
3: `colloc_top20` and `simhash_pairs_h7` regressed r03->r04 while the
window got cleaner — establish medians so a single driver sample isn't
the standing record).

Runs each probe N times alternating, with bench.py's host calibration
recorded before and after. Prints one JSON line.

Usage: python scripts/probe_extras.py [--runs 3] [--cpus 32]
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import host_calibration  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    calib_start = host_calibration()

    from searchengine_spark import entry_queries as eq
    from searchengine_spark.session import get_spark
    from searchengine_spark.textops import quality as tq

    spark = get_spark("probe-extras", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    probes = {
        "colloc_top20": lambda: eq.QUERIES["colloc_top20"](
            spark, args.sf_dir
        ).collect(),
        "simhash_pairs_h7": lambda: tq.simhash_near_pairs(
            docs, max_hamming=7
        ).count(),
    }
    # one untimed warm pass (codegen, Python workers, parquet footers)
    for fn in probes.values():
        fn()
    times: dict[str, list[float]] = {k: [] for k in probes}
    for _ in range(args.runs):
        for name, fn in probes.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 2))
    out = {
        "runs": times,
        "medians": {
            k: round(statistics.median(v), 2) for k, v in times.items()
        },
        "calib_start": calib_start,
        "calib_end": host_calibration(),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
