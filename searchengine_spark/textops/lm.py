"""Corpus-trained n-gram language-model scoring (CCNet-style quality
signal): train bigram counts on a reference corpus, score every document
by its average bigram log-probability / perplexity.

Large-scale pipelines (CCNet, Gopher, RefinedWeb) filter on LM perplexity
because repetitive boilerplate and gibberish both sit far from the corpus
distribution — low-probability tails — while ordinary prose scores near
the corpus mean. The reference engine has no LM stage; this is part of
the training-data-pipeline surface the brief adds.

Model: add-k-smoothed bigram MLE over the corpus's own token stream,

    P(w2 | w1) = (c(w1, w2) + k) / (c(w1, ·) + k·V)

with ``c(w1, ·)`` the count of bigram INSTANCES starting with ``w1`` (so
numerator and denominator come from the same table — no last-token edge
case) and ``V`` the distinct-unigram vocabulary size. No BOS/EOS padding;
documents with fewer than two tokens get ``n_bigrams = 0`` and NULL
scores. Everything is deterministic and SQL-expressible, so the DuckDB
oracle replays training AND scoring exactly.

Scale shape: training is one explode + two combinable aggregates (bigram
counts, then first-token totals — both shrink to vocabulary size, V and
~V² bounded, with map-side partial aggregation doing the heavy lifting);
scoring joins each doc's bigram instances to the counts table (hash
equi-join on the (w1, w2) key; the model side is vocabulary-sized, often
broadcastable) and aggregates per doc. Train once, score any number of
corpora against the same model frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LM_K = 0.1  # add-k smoothing mass (shared with the oracle SQL)


def _bigram_instances(df: DataFrame, tokens_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent-token pair instance."""
    toks = F.col(tokens_col)
    # F.get is 0-based and NULL-safe out of bounds (element_at throws under
    # ANSI mode, and it probes i+2 for the final element before slice cuts)
    pairs = F.slice(
        F.transform(
            toks,
            lambda x, i: F.struct(x.alias("w1"), F.get(toks, i + 1).alias("w2")),
        ),
        1,
        F.greatest(F.size(toks) - 1, F.lit(0)),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, "bg.w1", "bg.w2"
    )


def bigram_lm(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> tuple[DataFrame, int]:
    """Train the model: returns (counts frame, vocabulary size).

    The counts frame has one row per distinct (w1, w2) with ``c12`` (pair
    instances) and ``c1`` (instances of any bigram starting with w1);
    ``V`` is the distinct token count over the whole stream. Two shuffles,
    both fully map-side-combinable; output is vocabulary-bounded.
    """
    bg = _bigram_instances(df, tokens_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(F.col(tokens_col)).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    return c12.join(c1, "w1"), int(vocab)


def lm_score(
    df: DataFrame,
    model: DataFrame,
    vocab_size: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: float = LM_K,
) -> DataFrame:
    """Score docs against a trained model: (id, n_bigrams, avg_logp,
    perplexity), 6dp-rounded (cross-engine float determinism). Bigrams
    unseen in training fall back to the smoothed floor k / (k·V) — i.e.
    c12 = c1 = 0 — so scoring any corpus against any model is total."""
    bg = _bigram_instances(df, tokens_col, id_col)
    kv = float(k) * float(vocab_size)
    # join the pair count on (w1, w2) and the FIRST-TOKEN total on w1
    # separately: a bigram with a seen w1 but unseen (w1, w2) must keep
    # c1(w1) in the denominator — joining the model only on (w1, w2) would
    # zero BOTH counts and overestimate unseen continuations of frequent
    # contexts (per-w1 conditionals would no longer sum to 1)
    c1_tbl = model.select("w1", "c1").distinct()
    scored = (
        bg.join(model.select("w1", "w2", "c12"), ["w1", "w2"], "left")
        .join(c1_tbl, "w1", "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(kv))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg("logp").alias("avg"),
    )
    return df.select(id_col).distinct().join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.round(F.col("avg"), 6).alias("avg_logp"),
        F.round(F.exp(-F.col("avg")), 6).alias("perplexity"),
    )


def lm_perplexity(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: float = LM_K,
) -> DataFrame:
    """Self-trained convenience form: train on ``df``, score ``df``.

    NOTE: joining the model on its own training corpus means every bigram
    is seen (c12 >= 1); unseen-bigram fallback only matters when scoring a
    different corpus via :func:`lm_score`.
    """
    model, vocab = bigram_lm(df, tokens_col, id_col)
    return lm_score(df, model, vocab, tokens_col, id_col, k)


def suggest_next_terms(
    model: DataFrame, prev_term: str, prefix: str = "", k: int = 10
) -> DataFrame:
    """Search-box next-term completion off the TRAINED bigram counts
    frame (``bigram_lm``'s first return — train once over the corpus,
    suggest per keystroke): the top-``k`` continuations ``w2`` of
    ``prev_term`` by pair count, optionally restricted to a typed prefix
    of the next token. Returns ``(term, n)`` ordered by (n desc, term
    asc) — a deterministic total order.

    The model frame is vocabulary-bounded and (w1, w2)-keyed, so the
    ``w1`` equality and the ``StartsWith`` both push into its scan; a
    suggestion costs a filter + TakeOrdered over one term's
    continuation set, never a corpus pass.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    out = model.where(F.col("w1") == prev_term)
    if prefix:
        out = out.where(F.col("w2").startswith(prefix))
    return (
        out.select(F.col("w2").alias("term"), F.col("c12").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )
