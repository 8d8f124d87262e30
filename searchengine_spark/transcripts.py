"""Transcript-to-training-example assembly.

The input shape is the engine's native transcripts table
(conv_id, turn_idx, role, text, tool, ts — FIXTURES.md): multi-turn
conversations that a training pipeline must render into flat text
examples under a token budget. ``pack_conversations`` does the whole
assembly distributed:

- per-turn whitespace token counts (JVM expression, no UDF),
- a running per-conversation total (one window over (conv_id, turn_idx)),
- chunking at ``floor(tokens_before / budget)`` — deterministic,
  order-stable, and SQL-replayable (a greedy reset would need recursion;
  this prefix-sum formulation packs within ~1 turn of greedy and is a
  single expression),
- one groupBy((conv_id, chunk)) assembling "role: text" lines in turn
  order via sort_array over collected (turn_idx, line) structs.

Plan shape: ONE shuffle on conv_id (window + groupBy share the hash
partitioning — AQE reuses the exchange), per-group sorts only, no global
sort until the caller's final orderBy. Conversations are independent, so
the operator scales with the number of conversations regardless of
corpus size; a single conversation longer than executor memory is the
only skew hazard (bound turn counts upstream if that can happen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Java-\s whitespace (matches the analyzer's separator class)
_WS_RE = "[ \\t\\n\\x0b\\f\\r]+"


def pack_conversations(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Pack each conversation's turns into examples of ~``budget``
    whitespace tokens. Returns one row per (conversation, chunk):
    ``(conv_id, chunk_id, n_turns, n_tokens, has_tool, example)`` where
    ``example`` is the newline-joined "role: text" rendering in turn order.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ntok = F.size(
        F.filter(F.split(F.col(text_col), _WS_RE), lambda x: x != "")
    ).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    line = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    turns = df.select(
        F.col(conv_col),
        F.col(order_col),
        ntok.alias("_ntok"),
        line.alias("_line"),
        (F.col(tool_col) != "").alias("_tool"),
    ).withColumn(
        "chunk_id",
        F.floor((F.sum("_ntok").over(w) - F.col("_ntok")) / F.lit(budget)).cast(
            "long"
        ),
    )
    return (
        turns.groupBy(conv_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("_ntok").cast("long").alias("n_tokens"),
            F.max("_tool").alias("has_tool"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(order_col, "_line"))
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("example"),
        )
    )


def conversation_search(
    index,
    query: str,
    top_k: int | None = 10,
    decimals: int = 4,
) -> DataFrame:
    """Conversation-level retrieval: BM25-score every turn, then aggregate
    turn scores to conversations (MaxP passage aggregation — a
    conversation ranks by its best turn, the standard passage-to-document
    scheme). Returns ``(conv_id, score_r, best_turn, n_hit_turns,
    sum_score_r)`` for the top ``top_k`` conversations.

    docIDs follow the engine's transcript key ``conv_id:turn_idx``
    (fixtures.doc_key_col; conv_id contains no ':'), so conv extraction is
    a string split, not a corpus join.

    Engine-independence: turn scores are rounded to ``decimals`` BEFORE
    aggregation; ``best_turn`` is the lowest turn_idx among max-scoring
    turns (a single lexicographic struct-max, deterministic under any
    partitioning); ``sum_score_r`` sums decimal-scaled INTEGER units
    (integer addition is associative-exact, so the sum is bit-stable
    regardless of combine order — a float sum would not be).

    Plan: the stock BM25 plan (one doc_id shuffle) + one conv_id
    groupBy whose every aggregate is combinable, then TakeOrdered.
    """
    scale = 10**decimals
    scored = index.search_bm25(query, None)
    per_turn = scored.select(
        F.substring_index("doc_id", ":", 1).alias("conv_id"),
        F.substring_index("doc_id", ":", -1).cast("int").alias("turn_idx"),
        F.round("score", decimals).alias("score_r"),
    )
    agg = per_turn.groupBy("conv_id").agg(
        F.max(
            F.struct(
                F.col("score_r"), (-F.col("turn_idx")).alias("_negturn")
            )
        ).alias("_best"),
        F.count(F.lit(1)).cast("long").alias("n_hit_turns"),
        F.sum(F.round(F.col("score_r") * scale).cast("long")).alias("_sumi"),
    )
    out = agg.select(
        "conv_id",
        F.col("_best.score_r").alias("score_r"),
        (-F.col("_best._negturn")).cast("int").alias("best_turn"),
        "n_hit_turns",
        (F.col("_sumi") / F.lit(float(scale))).alias("sum_score_r"),
    )
    if top_k is None:
        return out
    return out.orderBy(F.desc("score_r"), F.asc("conv_id")).limit(top_k)


def search_with_context(
    index,
    transcripts: DataFrame,
    query: str,
    top_k: int = 5,
    window: int = 2,
    decimals: int = 4,
) -> DataFrame:
    """Turn-level BM25 top-k, each hit hydrated with the ±``window``
    surrounding turns of its conversation — the "show the exchange, not
    the isolated turn" retrieval a transcript UI or a RAG assembler needs.
    Returns ``(doc_id, score_r, n_ctx_turns, context)`` where ``context``
    is the newline-joined ``[turn_idx] role: text`` rendering in turn
    order (the hit line included).

    The top-k cut is rounded-score + doc_id (engine-independent, the
    snippets pattern). Context fetch is ONE corpus pass: the k-row hit
    frame is broadcast, the transcripts scan hash-joins it on conv_id
    with an |Δturn| <= window residual — no corpus-wide shuffle; only the
    O(k·(2·window+1)) surviving rows reach the final tiny groupBy. At
    10^12 turns with a conv_id-sorted/bucketed table the same join prunes
    to the touched row groups.
    """
    hits = (
        index.search_bm25(query, None)
        .select("doc_id", F.round("score", decimals).alias("score_r"))
        .orderBy(F.desc("score_r"), F.asc("doc_id"))
        .limit(top_k)
        .select(
            "doc_id",
            "score_r",
            F.substring_index("doc_id", ":", 1).alias("conv_id"),
            F.substring_index("doc_id", ":", -1).cast("int").alias("hit_turn"),
        )
    )
    line = F.concat(
        F.lit("["),
        F.col("turn_idx").cast("string"),
        F.lit("] "),
        F.col("role"),
        F.lit(": "),
        F.col("text"),
    )
    turns = transcripts.select(
        "conv_id", F.col("turn_idx").alias("ctx_turn"), line.alias("_line")
    )
    ctx = turns.join(F.broadcast(hits), "conv_id").where(
        F.abs(F.col("ctx_turn") - F.col("hit_turn")) <= window
    )
    return (
        ctx.groupBy("doc_id", "score_r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ctx_turns"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ctx_turn", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("context"),
        )
        .orderBy(F.desc("score_r"), F.asc("doc_id"))
    )


TOOL_START = "<start>"


def tool_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Tool-call transition mining over agent transcripts: for every
    conversation, the sequence of tool invocations in turn order (non-tool
    turns skipped) yields (previous tool → tool) bigrams, with
    ``TOOL_START`` marking each conversation's first call. Returns
    ``(src_tool, dst_tool, n, n_convs)`` — the corpus-wide transition
    matrix an agent-behavior analysis starts from (entry-tool mix, loops,
    dead tools).

    Plan: the ``tool != ''`` filter pushes into the scan; ONE conv_id
    shuffle drives the lag window; the transition count is a combinable
    groupBy over at most |tools|²+|tools| keys.
    """
    calls = df.where(F.col(tool_col) != "").select(
        F.col(conv_col).alias("_conv"),
        F.col(order_col).alias("_ord"),
        F.col(tool_col).alias("dst_tool"),
    )
    w = Window.partitionBy("_conv").orderBy("_ord")
    pairs = calls.withColumn(
        "src_tool", F.coalesce(F.lag("dst_tool").over(w), F.lit(TOOL_START))
    )
    return pairs.groupBy("src_tool", "dst_tool").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct(F.col("_conv")).alias("n_convs"),
    )


def tool_loops(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    min_run: int = 2,
) -> DataFrame:
    """Agent-trace loop detection: maximal runs of CONSECUTIVE calls to
    the same tool within a conversation (the period-1 stuck-agent
    signature — retry storms, tools called in a loop without progress).
    Non-tool turns are skipped, so "consecutive" means adjacent in the
    conversation's tool-call sequence. Returns ``(conv_id, tool,
    start_turn, run_len)`` for every run with ``run_len >= min_run``.

    Classic gaps-and-islands, fully declarative: a lag window marks run
    starts, a running sum over the same window numbers the islands, one
    combinable groupBy((conv, run)) measures them. Plan: the
    ``tool != ''`` filter pushes into the scan; ONE conv_id shuffle
    serves both windows and the groupBy (same partitioning — AQE reuses
    the exchange); output is bounded by the number of tool calls.
    Conversations are independent — the operator scales with conversation
    count; a single pathological conversation is the only skew unit.
    """
    if min_run < 1:
        raise ValueError(f"min_run must be >= 1, got {min_run}")
    calls = df.where(F.col(tool_col) != "").select(
        F.col(conv_col).alias("_conv"),
        F.col(order_col).alias("_ord"),
        F.col(tool_col).alias("tool"),
    )
    w = Window.partitionBy("_conv").orderBy("_ord")
    marked = calls.withColumn(
        "_new",
        F.when(
            F.lag("tool").over(w).isNull()
            | (F.lag("tool").over(w) != F.col("tool")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn(
        "_run",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy("_conv", "_run")
        .agg(
            F.min("tool").alias("tool"),  # constant within a run
            F.min("_ord").cast("long").alias("start_turn"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .where(F.col("run_len") >= min_run)
        .select(
            F.col("_conv").alias(conv_col),
            "tool",
            "start_turn",
            "run_len",
        )
    )


def tool_failure_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    text_col: str = "text",
    error_pattern: str = "error",
) -> DataFrame:
    """Tool-failure analytics over agent transcripts: per tool, how often
    it runs, how often its output text matches the failure pattern
    (case-insensitive substring), and how often a failure is immediately
    RETRIED (the next tool call in the same conversation is the same
    tool) — the reliability slice an agent-behavior review starts from.

    Returns ``(tool, n_calls, n_fail, n_retry, fail_rate_r)`` with the
    rate rounded to 4dp (n_calls >= 1 by construction, so the division
    is ANSI-safe).

    Plan: ``tool != ''`` pushes into the scan; ONE conv_id shuffle for
    the lead window; one combinable groupBy over |tools| keys. All JVM
    expressions — no UDF.
    """
    calls = df.where(F.col(tool_col) != "").select(
        F.col(conv_col).alias("_conv"),
        F.col(order_col).alias("_ord"),
        F.col(tool_col).alias("tool"),
        F.lower(F.col(text_col))
        .contains(error_pattern.lower())
        .alias("_fail"),
    )
    w = Window.partitionBy("_conv").orderBy("_ord")
    seq = calls.withColumn("_next_tool", F.lead("tool").over(w))
    return (
        seq.groupBy("tool")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_calls"),
            F.sum(F.col("_fail").cast("long")).alias("n_fail"),
            F.sum(
                (F.col("_fail") & (F.col("_next_tool") == F.col("tool")))
                .cast("long")
            ).alias("n_retry"),
        )
        .select(
            "tool",
            "n_calls",
            "n_fail",
            "n_retry",
            F.round(F.col("n_fail") / F.col("n_calls"), 4).alias(
                "fail_rate_r"
            ),
        )
    )


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation profile over the native transcripts table: turn
    counts by role, tool-call counts, distinct tools, wall-clock duration
    and whitespace token volume — the corpus-curation summary a training
    pipeline slices before sampling (drop single-turn convs, cap tool-call
    storms, length-balance the mix).

    ONE combinable groupBy(conv_id) aggregate — every term is an
    associative count/sum/min/max, so map-side partial aggregation does
    the heavy lifting and the shuffle carries one row per conversation.
    Duration is max(ts)−min(ts) in epoch seconds (a difference, so the
    session-timezone offset in the timestamp→long cast cancels).
    """
    ntok = F.when(
        F.col(text_col) != "", F.size(F.split(F.col(text_col), " "))
    ).otherwise(F.lit(0))
    return df.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col(role_col) == "assistant").cast("long")).alias(
            "n_assistant"
        ),
        F.sum((F.col(tool_col) != "").cast("long")).alias("n_tool_calls"),
        F.count_distinct(
            F.when(F.col(tool_col) != "", F.col(tool_col))
        ).alias("n_distinct_tools"),
        (F.max(F.col(ts_col)).cast("long") - F.min(F.col(ts_col)).cast("long"))
        .alias("duration_s"),
        F.sum(ntok).cast("long").alias("n_tokens"),
    )


def conversation_clause_search(
    df: DataFrame,
    clauses: list,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    analyzer: str = "composable",
) -> DataFrame:
    """Cross-role conversation retrieval (the ES ``has_child`` join
    pattern over the turn hierarchy): return the conversations where, for
    EVERY ``(role, query)`` clause, some turn of that role contains ALL
    of the query's analyzed terms — e.g. "the user asked about an error
    AND the assistant ran a merge".

    Returns ``(conv_id, hits_0, hits_1, ...)`` — one matching-turn count
    per clause, conversations ordered by conv_id. A clause whose query
    analyzes to no terms (stop words only) raises; an unknown role simply
    matches no turns, so the conversation set is empty.

    Plan shape: ONE corpus pass (the vectorized analyze projection +
    per-clause boolean flags, all JVM expressions over the token array)
    into ONE combinable groupBy(conv_id) whose terms are conditional
    sums; the filter "every clause hit at least once" is a HAVING over
    those sums. No join at all — the parent-child relation rides the
    conv_id aggregation key, which is how a 10^12-turn table wants it
    (Spark's groupBy replaces the index-time block-join Lucene needs).
    """
    from .analysis.analyzer import get_analyzer, make_analyze_udf

    if not clauses:
        raise ValueError("clauses must be non-empty")
    an = get_analyzer(analyzer)
    analyzed = []
    for role, query in clauses:
        terms = an(query)
        if not terms:
            raise ValueError(f"clause query analyzes to no terms: {query!r}")
        analyzed.append((role, sorted(set(terms))))
    toks = make_analyze_udf(analyzer)(F.col(text_col))
    flags = [
        (
            (F.col(role_col) == role)
            & (F.size(F.array_intersect(toks, F.lit(terms))) == len(terms))
        )
        .cast("long")
        .alias(f"hit_{i}")
        for i, (role, terms) in enumerate(analyzed)
    ]
    per_turn = df.select(F.col(conv_col).alias("conv_id"), *flags)
    agg = per_turn.groupBy("conv_id").agg(
        *[F.sum(f"hit_{i}").alias(f"hits_{i}") for i in range(len(analyzed))]
    )
    keep = None
    for i in range(len(analyzed)):
        c = F.col(f"hits_{i}") > 0
        keep = c if keep is None else (keep & c)
    return agg.where(keep).orderBy("conv_id")


def conversation_dedup(
    df: DataFrame,
    est_threshold: float = 0.5,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-level dedup for transcript logs: the same conversation
    re-logged under a different conv_id (retries, pipeline replays, export
    overlaps) is the transcript-corpus analogue of document duplication.
    Returns one row per conversation::

        (conv_id, status in {'exact_dup', 'near_dup', 'novel'},
         dup_of = smallest matching partner conv_id, NULL for novel)

    Exact identity is the sha256 of the canonical rendering — "role: text"
    lines joined by newline IN TURN ORDER — so turn permutations of the
    same multiset do NOT collide. Near-duplication (a turn dropped or
    edited) reuses the document-dedup machinery at conversation granularity:
    trigram shingles of the canonical text -> MinHash signatures -> banded
    LSH candidates -> signature-estimated Jaccard >= ``est_threshold``
    (``textops.dedup`` constants, so the DuckDB twin replays bit-for-bit).

    One-pass drop rule (same as :func:`textops.dedup.incremental_dedup`):
    a conversation is a dup if it matches any SMALLER-id conversation,
    even one that is itself a dup — deterministic and SQL-replayable
    without recursion; use :func:`textops.dedup.dedup_pipeline` over the
    canonical frame when full transitive components are needed.

    Scale shape: one conv_id shuffle (assembly), one sha window, one
    MinHash groupBy, band-key equi-joins — candidate-then-verify, no
    all-pairs stage. Hot-bucket skew (boilerplate conversations) is
    bounded upstream by the exact stage exactly as in the document
    pipeline.
    """
    from .analysis.stopwords import STOP_WORDS
    from .textops.dedup import band_keys, estimated_jaccard, minhash_signatures

    line = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    convs = df.groupBy(conv_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(order_col).alias("i"), line.alias("l"))
                    )
                ),
                lambda e: e["l"],
            ),
        ).alias("canon")
    )
    # expression twin of punctuation_tokenize (analyzer parity, no stem)
    stop_arr = F.lit(sorted(STOP_WORDS))
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("canon"), "[,.;?!]", " ")),
            "[ \t\n\x0b\f\r]+",
        ),
        lambda x: (x != "") & ~F.array_contains(stop_arr, x),
    )
    # the per-conv signature frame feeds the exact window, both sides of
    # the candidate join, and the final spine — persist so assembly and
    # the 16-hash MinHash aggregate run once (conv-count-sized rows only)
    sigd = convs.select(
        F.col(conv_col),
        F.sha2(F.col("canon"), 256).alias("conv_sha"),
        toks.alias("tokens"),
    ).persist()

    exact = (
        sigd.select(
            conv_col,
            F.min(conv_col).over(Window.partitionBy("conv_sha")).alias("__exact_of"),
        )
        .where(F.col("__exact_of") < F.col(conv_col))
    )

    sigs = minhash_signatures(
        sigd.select(conv_col, "tokens"), "tokens", conv_col
    ).persist()
    bands = band_keys(sigs, conv_col)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"b.{conv_col}") < F.col(f"a.{conv_col}")),
        )
        .select(
            F.col(f"a.{conv_col}").alias(conv_col),
            F.col(f"b.{conv_col}").alias("__partner"),
        )
        .distinct()
    )
    near = (
        cand.join(
            sigs.select(F.col(conv_col), F.col("sig").alias("__sig_l")), conv_col
        )
        .join(
            sigs.select(
                F.col(conv_col).alias("__partner"), F.col("sig").alias("__sig_r")
            ),
            "__partner",
        )
        .where(estimated_jaccard(F.col("__sig_l"), F.col("__sig_r")) >= est_threshold)
        .groupBy(conv_col)
        .agg(F.min("__partner").alias("__near_of"))
    )
    return (
        sigd.select(conv_col)
        .join(exact, conv_col, "left")
        .join(near, conv_col, "left")
        .select(
            conv_col,
            F.when(F.col("__exact_of").isNotNull(), F.lit("exact_dup"))
            .when(F.col("__near_of").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            F.coalesce("__exact_of", "__near_of").alias("dup_of"),
        )
    )
