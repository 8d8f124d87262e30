"""Semantics tests for timeseries.asof_join / interval_join and the new
textops (repetition_signals, contamination_overlap) beyond what the
DuckDB-oracle contract checks: tie inclusivity, tolerance nulling,
half-open interval bounds, degenerate docs, and plan shape (no
BroadcastNestedLoop / cartesian in the interval join)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from searchengine_spark.timeseries import asof_join, interval_join
from searchengine_spark.textops.dedup import contamination_overlap
from searchengine_spark.textops.quality import repetition_signals


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts(10), 1.0),
            ("A", _ts(20), 2.0),
            ("A", _ts(30), 3.0),
            ("B", _ts(25), 9.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(5), 100),   # before any quote -> null
            ("A", _ts(20), 101),  # equal ts -> inclusive match (2.0)
            ("A", _ts(29), 102),  # latest prior is 20 (2.0)
            ("A", _ts(55), 103),  # latest is 30 (3.0)
            ("B", _ts(24), 104),  # before B's only quote -> null
            ("B", _ts(26), 105),  # matches 25 (9.0)
            ("C", _ts(50), 106),  # key with no right rows -> null
        ],
        "sym string, ts timestamp, qty int",
    )
    return trades, quotes


def test_asof_join_backward_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], right_cols=["px"])
    got = {r["qty"]: (r["ts_r"], r["px_r"]) for r in out.collect()}
    assert got[100] == (None, None)
    assert got[101] == (_ts(20), 2.0)
    assert got[102] == (_ts(20), 2.0)
    assert got[103] == (_ts(30), 3.0)
    assert got[104] == (None, None)
    assert got[105] == (_ts(25), 9.0)
    assert got[106] == (None, None)
    # all left rows and columns survive
    assert out.count() == trades.count()
    assert out.columns == ["sym", "ts", "qty", "ts_r", "px_r"]


def test_asof_join_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], right_cols=["px"], tolerance_s=10
    )
    got = {r["qty"]: r["px_r"] for r in out.collect()}
    # qty=103 matched ts=30 at lag 25s -> nulled by tolerance; 102 lag 9s kept
    assert got[103] is None
    assert got[102] == 2.0
    assert got[101] == 2.0


def test_asof_join_plan_has_no_join_node(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], right_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("NestedLoop", "CartesianProduct", "SortMergeJoin",
                "BroadcastHashJoin"):
        assert bad not in plan, plan


def test_interval_join_matches_naive_filter(spark):
    events = spark.createDataFrame(
        [(i, _ts(i % 60)) for i in range(200)], "eid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            (1, _ts(5), _ts(15)),    # [5, 15)
            (2, _ts(10), _ts(40)),   # overlaps interval 1
            (3, _ts(58), _ts(59)),
        ],
        "iv_id long, lo timestamp, hi timestamp",
    )
    got = interval_join(events, iv, "ts", "lo", "hi", bucket_s=7)
    naive = events.crossJoin(iv).where(
        (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))
    )
    key = lambda df: sorted((r["eid"], r["iv_id"]) for r in df.collect())
    assert key(got) == key(naive)
    # hi is exclusive: ts==15 joins only interval 2
    in1 = [r for r in got.collect() if r["iv_id"] == 1]
    assert all(r["ts"] < _ts(15) for r in in1)


def test_interval_join_plan_is_hash_join(spark):
    events = spark.createDataFrame([(1, _ts(6))], "eid long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, _ts(5), _ts(15))], "iv_id long, lo timestamp, hi timestamp"
    )
    plan = (
        interval_join(events, iv, "ts", "lo", "hi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def _tok(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )


def test_repetition_signals_handcrafted(spark):
    docs = _tok(
        spark,
        [
            (0, "a a a a"),          # top2=3/3, dup3=2/2
            (1, "a b c d e"),        # all grams unique -> 0 dup, top2=1/4
            (2, "x"),                # too short for any gram -> 0, 0
            (3, "a b a b a b"),      # 2grams: ab x3, ba x2 -> top 3/5
        ],
    )
    got = {r["doc_id"]: (r["top2_frac_r"], r["dup3_frac_r"])
           for r in repetition_signals(docs).collect()}
    assert got[0] == (1.0, 1.0)
    assert got[1] == (0.25, 0.0)
    assert got[2] == (0.0, 0.0)  # row present even with zero grams
    assert got[3] == (0.6, 1.0)  # 3grams: aba x2, bab x2 -> dup 4/4
    assert len(got) == 4


def test_contamination_overlap_handcrafted(spark):
    # shingle width is 3 (dedup.SHINGLE_N)
    train = _tok(
        spark,
        [
            (0, "q w e r t"),        # shares "q w e"+"w e r" with eval -> 2/3
            (1, "z z z z"),          # one distinct shingle, no overlap
        ],
    )
    ev = _tok(spark, [(100, "q w e r x")])
    got = {r["doc_id"]: (r["n_shingles"], r["n_hit"], r["overlap_r"])
           for r in contamination_overlap(train, ev).collect()}
    assert got[0] == (3, 2, round(2 / 3, 6))
    assert got[1] == (1, 0, 0.0)


def test_pack_conversations_reconstructs_and_bounds(spark):
    """Packing properties: (a) re-joining a conversation's chunks in
    chunk order reproduces the full turn-ordered rendering, (b) a chunk
    never starts mid-budget (its first turn's running prefix lies in
    [chunk*budget, (chunk+1)*budget)), (c) tool flags aggregate per chunk."""
    from searchengine_spark.transcripts import pack_conversations

    rows = []
    for c in range(3):
        for t in range(7):
            n_words = 3 + (t * 2 + c) % 5
            rows.append(
                (f"c{c}", t, "user" if t % 2 == 0 else "assistant",
                 " ".join(f"w{t}_{i}" for i in range(n_words)),
                 "search" if (c == 1 and t == 4) else "")
            )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = pack_conversations(df, budget=10).collect()

    by_conv = {}
    for r in sorted(out, key=lambda r: (r["conv_id"], r["chunk_id"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    for c in range(3):
        chunks = by_conv[f"c{c}"]
        joined = "\n".join(r["example"] for r in chunks)
        expect = "\n".join(
            f"{role}: {text}" for (_, _, role, text, _) in
            sorted((x for x in rows if x[0] == f"c{c}"), key=lambda x: x[1])
        )
        assert joined == expect
        prefix = 0
        for r in chunks:
            assert r["chunk_id"] * 10 <= prefix < (r["chunk_id"] + 1) * 10
            prefix += r["n_tokens"]
    assert any(r["has_tool"] for r in by_conv["c1"])
    assert not any(r["has_tool"] for r in by_conv["c0"])


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """Randomized differential vs pandas.merge_asof (an independent
    implementation of backward-inclusive as-of semantics): 600 left rows,
    400 right rows, 12 keys, unique right timestamps per key so the match
    is well-defined."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    keys = [f"k{i}" for i in range(12)]
    base = dt.datetime(2024, 1, 1)

    def frame(n, with_px):
        ks = rng.choice(keys, size=n)
        secs = rng.choice(np.arange(0, 50_000), size=n, replace=False)
        df = pd.DataFrame({
            "sym": ks,
            "ts": [base + dt.timedelta(seconds=int(s)) for s in secs],
        })
        if with_px:
            df["px"] = np.round(rng.standard_normal(n), 6)
        else:
            df["qty"] = np.arange(n)
        return df

    lpd, rpd = frame(600, False), frame(400, True)
    got = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        on=["sym"], right_cols=["px"],
    ).toPandas()
    exp = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="sym", direction="backward",
    )
    g = got.sort_values("qty").reset_index(drop=True)
    e = exp.sort_values("qty").reset_index(drop=True)
    assert list(g["qty"]) == list(e["qty"])
    pd.testing.assert_series_equal(
        g["px_r"], e["px"], check_names=False, check_dtype=False
    )


def test_asof_join_null_right_ts_and_null_keys_excluded(spark):
    """SQL-semantics parity: right rows with NULL ts or NULL key can never
    match (DuckDB ASOF equality/inequality predicates reject NULLs), while
    null-key LEFT rows survive unmatched (left-join semantics)."""
    quotes = spark.createDataFrame(
        [("A", None, 5.0), (None, _ts(1), 7.0), ("A", _ts(20), 2.0)],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", _ts(10), 100), ("A", _ts(25), 101), (None, _ts(30), 102)],
        "sym string, ts timestamp, qty int",
    )
    out = asof_join(trades, quotes, on=["sym"], right_cols=["px"])
    got = {r["qty"]: (r["ts_r"], r["px_r"]) for r in out.collect()}
    # trade at t=10 precedes the only real quote: NO phantom match from the
    # null-ts row's payload
    assert got[100] == (None, None)
    assert got[101] == (_ts(20), 2.0)
    # null-key trade returned, unmatched (the null-key quote is invisible)
    assert got[102] == (None, None)
    assert len(got) == 3


def test_contamination_overlap_duplicate_doc_rows(spark):
    """Duplicate doc_id rows (tolerated upstream) must not double-count
    shingles: per-(doc, shingle) accounting is distinct across rows."""
    train = _tok(spark, [(0, "q w e r t"), (0, "q w e r t")])
    ev = _tok(spark, [(100, "q w e r x")])
    got = {r["doc_id"]: (r["n_shingles"], r["n_hit"], r["overlap_r"])
           for r in contamination_overlap(train, ev).collect()}
    assert got[0] == (3, 2, round(2 / 3, 6))


def test_funnel_strict_ordering_and_greedy_chain(spark):
    import datetime as dt

    import pytest as _pytest

    from searchengine_spark.timeseries import funnel

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: full ordered chain
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: click BEFORE view -> stops at view
        (2, t(5), "click"), (2, t(6), "view"),
        # u3: same-timestamp view+click never chains (strict >)
        (3, t(1), "view"), (3, t(1), "click"),
        # u4: greedy-earliest still finds the valid chain: the first click
        # precedes the view, but a later one follows it
        (4, t(2), "click"), (4, t(3), "view"), (4, t(4), "click"),
        (4, t(5), "purchase"),
        # u5: purchase before click -> reaches click only
        (5, t(1), "view"), (5, t(2), "purchase"), (5, t(3), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.step_name: r.n_users for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 5, "click": 3, "purchase": 2}  # u1,u4 full; u5 to click
    with _pytest.raises(ValueError, match="at least one"):
        funnel(ev, [])


def test_retention_cohorts_hand_computed(spark):
    import datetime as dt

    from searchengine_spark.timeseries import retention_cohorts

    day = lambda d: dt.datetime(1970, 1, 1) + dt.timedelta(days=d)  # noqa: E731
    rows = [
        # u1: first in period 0, active periods 0,1,3
        (1, day(2)), (1, day(3)), (1, day(8)), (1, day(22)),
        # u2: first in period 1, active periods 1,2
        (2, day(9)), (2, day(15)),
        # u3: only period 0
        (3, day(0)),
        # u4: first period 0, next activity beyond max_periods -> clipped
        (4, day(1)), (4, day(200)),
    ]
    ev = spark.createDataFrame(
        [(u, t, "x") for u, t in rows], "user_id long, ts timestamp, event_type string"
    )
    out = {
        (r.cohort_period, r.period_offset): r.n_active
        for r in retention_cohorts(ev, period_days=7, max_periods=8).collect()
    }
    assert out == {
        (0, 0): 3,  # u1, u3, u4
        (0, 1): 1,  # u1
        (0, 3): 1,  # u1
        (1, 0): 1,  # u2
        (1, 1): 1,  # u2
    }
