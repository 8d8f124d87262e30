"""Replay the driver head-50 through the oracle harness at the driver's
scale factor (sf0.01), the same way the driver compares (sorted columns,
rounded floats, order-insensitive rows). VERDICT r4 item 4: a surprise
fail must not burn the round's only driver sample.

Usage: python scripts/replay_head50.py [sf_dir] [--limit N]
Writes one JSON line per entry to stdout and a summary at the end.
"""

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from searchengine_spark.entry_queries import _HEAD_R05  # noqa: E402
from searchengine_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("replay50", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_ok = 0
    fails = []
    for name in _HEAD_R05:
        t0 = time.monotonic()
        rec = {"name": name}
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
            rec["spark_rows"] = len(srows)
            rec["oracle_rows"] = len(drows)
            rec["schema_match"] = sorted(scols) == sorted(dcols)
            rec["hash_match"] = rec["schema_match"] and _normalize(
                srows, scols
            ) == _normalize(drows, dcols)
        except Exception as exc:  # noqa: BLE001 — record, keep replaying
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            rec["hash_match"] = False
        rec["sec"] = round(time.monotonic() - t0, 2)
        if rec["hash_match"]:
            n_ok += 1
        else:
            fails.append(name)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": f"{n_ok}/{len(_HEAD_R05)}", "fails": fails}))
    spark.stop()


if __name__ == "__main__":
    main()
