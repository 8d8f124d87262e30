"""Distributed BPE (byte-pair-encoding) merge learning.

Training-data pipelines budget in tokenizer tokens; learning the merge
table itself from the corpus (Sennrich et al. 2016) is the missing piece
between the whitespace/BPE-ish regex counters in ``quality.py`` and a
real subword budget. The algorithm: start from characters, repeatedly
merge the most frequent adjacent symbol pair.

Scale shape — the one decision that matters at 100 TB: BPE statistics
live on WORD TYPES weighted by frequency, not on the raw token stream.
The corpus-scale work is therefore ONE map-side-combinable aggregate
(word -> freq); every merge round after that operates on the
vocabulary-bounded type table (|V| rows, ~10^5-10^6 at web scale — tiny
next to 10^12 docs), so 50 rounds cost 50 small shuffles, not 50 corpus
passes. Encoding/counting then BROADCAST-joins the finished word ->
pieces map back to the stream: zero per-doc Python, zero corpus-side
iteration. (The per-round argmax ``.collect()`` is O(1) — the
driver-collect audit's bounded-collect rule.)

Merge semantics (pinned by differential tests against a pure-Python
reference, and replayed exactly by the DuckDB oracle's unrolled rounds):
all non-overlapping occurrences left-to-right in every word, which for a
pair (a, b) with a != b is simply "every occurrence" (overlap is
impossible), and for a self-pair (a, a) means occurrences starting at
EVEN offsets within each run of a's — the run-parity rule. Argmax ties
break deterministically on (count desc, a asc, b asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_N_MERGES = 10


def word_types(
    df: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """(word, freq) — the corpus-scale aggregate everything else rides on."""
    return (
        df.select(F.explode(F.col(tokens_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_seg(words: DataFrame) -> DataFrame:
    """(word, freq, seg: array<string>) — initial character segmentation."""
    return words.withColumn("seg", F.split(F.col("word"), ""))


def _pair_counts(seg_df: DataFrame) -> DataFrame:
    sym = seg_df.select(
        "word", "freq", F.posexplode("seg").alias("pos", "sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    return (
        sym.withColumn("nxt", F.lead("sym").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_round(seg_df: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) to every word's segmentation (the window
    formulation the DuckDB oracle mirrors CTE-for-CTE)."""
    sym = seg_df.select(
        "word", "freq", F.posexplode("seg").alias("pos", "sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    lead_sym = sym.withColumn("nxt", F.lead("sym").over(w))
    is_a = F.col("sym") == F.lit(a)
    grp = F.when(
        is_a,
        F.col("pos")
        - F.row_number().over(Window.partitionBy("word", is_a).orderBy("pos")),
    )
    offs = lead_sym.withColumn("grp", grp).withColumn(
        "run_off",
        F.when(
            F.col("grp").isNotNull(),
            F.row_number().over(Window.partitionBy("word", "grp").orderBy("pos"))
            - 1,
        ),
    )
    start = (
        (F.col("sym") == F.lit(a))
        & (F.col("nxt") == F.lit(b))
        & (F.lit(a != b) | (F.col("run_off") % 2 == 0))
    ).cast("int")
    marked = offs.withColumn("start", start)
    emit = marked.withColumn("consumed", F.lag("start").over(w)).where(
        F.coalesce(F.col("consumed"), F.lit(0)) == 0
    )
    out_sym = F.when(F.col("start") == 1, F.lit(a + b)).otherwise(F.col("sym"))
    return (
        emit.select("word", "freq", F.col("pos"), out_sym.alias("out_sym"))
        .groupBy("word", "freq")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("out_sym")))
                ),
                lambda s: s["out_sym"],
            ).alias("seg")
        )
    )


def bpe_train(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_merges: int = DEFAULT_N_MERGES,
    driver_max_words: int = 200_000,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, final segmentation frame). ``merges`` is
    [(a, b, count)] in rank order; the frame is (word, freq,
    seg: array<string>) with all merges applied — the word -> pieces map
    :func:`bpe_token_counts` broadcasts. Stops early if pairs run out.

    Adaptive execution (same pattern as connected_components' driver
    union-find fast path): the corpus-scale work — the word-type
    aggregate — is always distributed, but when the resulting type table
    has at most ``driver_max_words`` rows it is collected and the merge
    loop runs in pure python (identical semantics, pinned by the
    differential test), avoiding ~6 fixed-overhead Spark jobs per round.
    Real web vocabularies (10^5-10^6 types) sit near the threshold;
    ``driver_max_words=0`` forces the distributed loop.
    """
    wt = word_types(df, tokens_col)
    if driver_max_words > 0:
        head = wt.limit(driver_max_words + 1).collect()
        if len(head) <= driver_max_words:
            merges, segs = _py_bpe_train(
                {r["word"]: int(r["freq"]) for r in head}, n_merges
            )
            seg_df = df.sparkSession.createDataFrame(
                [(r["word"], int(r["freq"]), segs[r["word"]]) for r in head],
                "word string, freq long, seg array<string>",
            )
            return merges, seg_df
    seg = _char_seg(wt).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(seg)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        # localCheckpoint per round: iterative-loop lineage rule (CLAUDE.md)
        seg = _merge_round(seg, a, b).localCheckpoint(eager=True)
    return merges, seg


def _py_bpe_train(
    word_freqs: dict[str, int], n_merges: int
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    """Driver-side merge loop over a collected word-type table — exactly
    the distributed loop's semantics (greedy left-to-right merges, argmax
    tiebreak (cnt DESC, a, b); equivalence pinned by
    tests/test_textops.py::test_bpe_driver_and_distributed_paths_agree).
    Incremental pair-count maintenance: only words containing the merged
    pair are re-counted each round."""
    from collections import Counter

    segs = {w: list(w) for w in word_freqs}
    counts: Counter = Counter()
    by_pair: dict[tuple[str, str], set[str]] = {}

    def account(word: str, sign: int) -> None:
        s, f = segs[word], word_freqs[word]
        for pair in zip(s, s[1:]):
            counts[pair] += sign * f
            if sign > 0:
                by_pair.setdefault(pair, set()).add(word)

    for w in segs:
        account(w, +1)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        live = [(c, p) for p, c in counts.items() if c > 0]
        if not live:
            break
        # deterministic argmax: highest count, then smallest (a, b)
        cnt, (a, b) = min(live, key=lambda x: (-x[0], x[1]))
        merges.append((a, b, cnt))
        for w in list(by_pair.get((a, b), ())):
            account(w, -1)
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
            account(w, +1)
    return merges, segs


def bpe_token_counts(
    df: DataFrame,
    seg_df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc subword token counts under a trained segmentation:
    (id, n_words, n_bpe_pieces). The word -> piece-count map is
    vocabulary-sized and broadcast; unseen words (scoring a different
    corpus than the training one) fall back to character count."""
    pieces = F.broadcast(
        seg_df.select("word", F.size("seg").alias("__n_pieces"))
    )
    return (
        df.select(F.col(id_col), F.explode(F.col(tokens_col)).alias("word"))
        .join(pieces, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.coalesce(F.col("__n_pieces"), F.length("word")))
            .cast("long")
            .alias("n_bpe_pieces"),
        )
    )
