"""Deterministic synthetic transcripts corpus + reference query set.

Implements FIXTURES.md: an Iceberg-shaped table of multi-turn conversation /
agent transcripts with columns ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)`` — exactly BASELINE.json's
input_hint. Everything is keyed off ``(seed, conv_idx, turn_idx)`` through a
counter-based RNG (numpy Philox via ``default_rng([seed, conv_idx])``), so
the corpus is identical regardless of partitioning or parallelism.

Sizes: tiny (20 convs) for exact assertions, small (1,000 convs) for oracle
rank-parity, bench (100k convs, ~550k turns) for the two-parallelism scaling
run. tiny/small generate driver-side; bench generates distributed via
``mapInPandas`` over ``spark.range`` (each task generates its conv range —
no data is shuffled in, matching how a real 10^12-turn table would be read,
not built).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

SEED = 42
SIZES = {"tiny": 20, "small": 1000, "bench": 100_000}

# Agent-transcript-flavored vocabulary; Zipf weights create hot terms
# ("function", "error", ...) that exercise the salted aggregation path.
CONTENT_WORDS = [
    "function", "error", "file", "test", "code", "run", "data", "query",
    "result", "line", "value", "call", "type", "list", "string", "table",
    "return", "change", "fix", "add", "build", "index", "search", "merge",
    "sort", "join", "hash", "key", "read", "write", "page", "block",
    "buffer", "cache", "thread", "pool", "segment", "document", "token",
    "term", "stem", "score", "rank", "filter", "scan", "shuffle", "spark",
    "python", "java", "rust", "partition", "cluster", "executor", "driver",
    "memory", "disk", "network", "timeout", "retry", "commit", "branch",
    "diff", "patch", "module", "import", "export", "class", "method",
    "object", "array", "vector", "matrix", "graph", "node", "edge",
    "weight", "batch", "stream", "window", "watermark", "checkpoint",
    "snapshot", "schema", "column", "row", "parquet", "iceberg", "json",
    "yaml", "config", "flag", "option", "argument", "parameter", "default",
    "compile", "parse", "analyze", "optimize", "plan", "stage", "task",
    "metric", "counter", "logger", "debug", "trace", "warning", "exception",
    "stack", "heap", "pointer", "reference", "clone", "copy", "move",
    "delete", "update", "insert", "select", "group", "aggregate", "count",
    "sum", "average", "minimum", "maximum", "median", "percentile",
    "histogram", "sample", "random", "seed", "generator", "iterator",
    "closure", "lambda", "callback", "promise", "future", "async", "await",
    "lock", "mutex", "atomic", "volatile", "barrier", "latch", "semaphore",
    "compress", "encode", "decode", "serialize", "deserialize", "marshal",
    "buffer-size", "page-size", "chunk", "span", "range", "offset",
    "length", "capacity", "resize", "grow", "shrink", "evict", "expire",
    "happy", "important", "concept", "computer", "science", "stemming",
    "elizabeth", "darcy", "bennet", "pride", "prejudice", "novel",
    "chapter", "volume", "letter", "london", "garden", "morning",
    "evening", "family", "sister", "brother", "mother", "father",
    "daughter", "pleasure", "fortune", "marriage", "acquaintance",
    "neighbourhood", "society", "manners", "character", "feelings",
]

# Stop words appear inline so the analyzer actually filters things.
FILLER_WORDS = [
    "the", "a", "an", "is", "are", "was", "to", "of", "in", "on", "and",
    "or", "it", "this", "that", "i", "you", "we", "with", "for", "have",
    "not", "at", "by", "from", "can", "will", "do", "how", "what", "now",
]

TOOLS = ["bash", "search", "editor", "browser", "python", ""]
ROLES = ["user", "assistant", "tool"]

# Rare markers pinned at known (conv stride, turn) slots — the reference's
# "qwertyuiop elizabeth" trick (Team2StressTest.java:57-58).
MARKERS = [
    ("zqmarkeralpha", 37, 1),
    ("zqmarkerbeta", 101, 2),
    ("zqmarkergamma", 251, 0),
]
# A fixed phrase planted verbatim to give phrase queries stable hits.
PLANTED_PHRASE = "merge sort algorithm"
PHRASE_STRIDE = 23

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_ZIPF_W = 1.0 / np.power(np.arange(1, len(CONTENT_WORDS) + 1), 1.07)
_ZIPF_P = _ZIPF_W / _ZIPF_W.sum()


def conv_id_str(conv_idx: int) -> str:
    return f"conv-{conv_idx:08d}"


def generate_conversation(conv_idx: int, seed: int = SEED) -> list[dict]:
    """All turns of one conversation, fully determined by (seed, conv_idx)."""
    rng = np.random.default_rng([seed, conv_idx])
    n_turns = int(3 + rng.integers(0, 6))  # 3..8
    rows = []
    for turn_idx in range(n_turns):
        role = ROLES[turn_idx % 3] if turn_idx else "user"
        n_tokens = int(5 + rng.integers(0, 36))
        content = rng.choice(len(CONTENT_WORDS), size=n_tokens, p=_ZIPF_P)
        words = []
        for wi in content:
            w = CONTENT_WORDS[int(wi)]
            r = rng.random()
            if r < 0.22:
                words.append(FILLER_WORDS[int(rng.integers(0, len(FILLER_WORDS)))])
            if r < 0.12:
                w = w.capitalize()
            words.append(w)
            r2 = rng.random()
            if r2 < 0.08:
                words[-1] += ","
            elif r2 < 0.12:
                words[-1] += "."
            elif r2 < 0.14:
                words[-1] += "!"
            elif r2 < 0.15:
                words[-1] += "?"
        for marker, stride, mturn in MARKERS:
            if conv_idx % stride == stride // 2 and turn_idx == mturn:
                words.append(marker)
        if conv_idx % PHRASE_STRIDE == 3 and turn_idx == 1:
            words.append(PLANTED_PHRASE)
        tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
        rows.append(
            {
                "conv_id": conv_id_str(conv_idx),
                "turn_idx": turn_idx,
                "role": role,
                "text": " ".join(words),
                "tool": tool,
                "ts": _EPOCH + timedelta(seconds=conv_idx * 3600 + turn_idx * 30),
            }
        )
    return rows


def transcripts_pandas(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    rows = []
    for c in range(n_convs):
        rows.extend(generate_conversation(c, seed))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def transcripts_df(spark, size: str = "tiny", seed: int = SEED,
                   n_convs: int | None = None, partitions: int | None = None):
    """Spark DataFrame of the synthetic transcripts corpus."""
    n = n_convs if n_convs is not None else SIZES[size]
    if n <= 2000:
        pdf = transcripts_pandas(n, seed)
        return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)

    def gen(batches):
        for pdf in batches:
            rows = []
            for conv_idx in pdf["id"]:
                rows.extend(generate_conversation(int(conv_idx), seed))
            out = pd.DataFrame(rows)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def doc_key_col():
    """docID = conv_id:turn_idx (global, stable, order-preserving because
    conv_id is zero-padded and turn_idx is zero-padded to 4)."""
    from pyspark.sql import functions as F

    return F.concat_ws(
        ":", F.col("conv_id"), F.lpad(F.col("turn_idx").cast("string"), 4, "0")
    )


def doc_key(conv_idx_or_id, turn_idx: int) -> str:
    cid = (
        conv_id_str(conv_idx_or_id)
        if isinstance(conv_idx_or_id, int)
        else conv_idx_or_id
    )
    return f"{cid}:{turn_idx:04d}"


def graph_edges_pandas(n_nodes: int = 200, avg_out: int = 4, seed: int = SEED) -> pd.DataFrame:
    """Deterministic synthetic link graph (the reference's id-graph.tsv
    role): each node links to ~avg_out pseudo-random others, preferential
    toward low ids (gives distinct PageRank mass like a real web graph).
    Node n_nodes-1 is left dangling (no out-links) to exercise the
    zero-column path (IcsSearchEngine.java:96-106)."""
    rows = []
    for src in range(n_nodes - 1):
        rng = np.random.default_rng([seed, 7919, src])
        k = 1 + int(rng.integers(0, 2 * avg_out))
        # preferential attachment: square the uniform to skew toward 0
        dsts = (rng.random(k) ** 2 * n_nodes).astype(int)
        for d in np.unique(dsts):
            if int(d) != src:
                rows.append({"src": src, "dst": int(d)})
    return pd.DataFrame(rows)


def graph_edges_df(spark, n_nodes: int = 200, avg_out: int = 4, seed: int = SEED):
    return spark.createDataFrame(
        graph_edges_pandas(n_nodes, avg_out, seed), schema="src long, dst long"
    )


# ---------------------------------------------------------------------------
# Reference query set (FIXTURES.md §2) — fixed, spans all query kinds.
# ---------------------------------------------------------------------------
QUERY_SET = [
    {"query_id": 1, "kind": "keyword", "query_text": "function", "k": None},
    {"query_id": 2, "kind": "keyword", "query_text": "Elizabeth!", "k": None},
    {"query_id": 3, "kind": "keyword", "query_text": "zqmarkeralpha", "k": None},
    {"query_id": 4, "kind": "and", "query_text": "error function", "k": None},
    {"query_id": 5, "kind": "and", "query_text": "spark shuffle partition", "k": None},
    {"query_id": 6, "kind": "and", "query_text": "the error", "k": None},
    {"query_id": 7, "kind": "or", "query_text": "zqmarkeralpha zqmarkerbeta", "k": None},
    {"query_id": 8, "kind": "or", "query_text": "elizabeth darcy", "k": None},
    {"query_id": 9, "kind": "phrase", "query_text": "merge sort algorithm", "k": None},
    {"query_id": 10, "kind": "phrase", "query_text": "Merge, Sort", "k": None},
    {"query_id": 11, "kind": "phrase", "query_text": "the merge sort", "k": None},
    {"query_id": 12, "kind": "bm25", "query_text": "spark shuffle error", "k": 10},
    {"query_id": 13, "kind": "bm25", "query_text": "elizabeth pride prejudice", "k": 20},
    {"query_id": 14, "kind": "bm25", "query_text": "function error timeout retry", "k": 10},
    {"query_id": 15, "kind": "bm25", "query_text": "important concept computer science", "k": 15},
    {"query_id": 16, "kind": "bm25", "query_text": "zqmarkerbeta function", "k": 10},
    {"query_id": 17, "kind": "tfidf", "query_text": "spark shuffle error", "k": 10},
    {"query_id": 18, "kind": "tfidf", "query_text": "elizabeth darcy garden", "k": 10},
    {"query_id": 19, "kind": "tfidf", "query_text": "stemming is an important concept", "k": 15},
    {"query_id": 20, "kind": "bm25", "query_text": "checkpoint snapshot resume", "k": 10},
]
