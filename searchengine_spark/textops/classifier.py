"""FastText-style hashed bag-of-ngrams linear text classifier — the
quality-filtering staple of CCNet / RedPajama / FineWeb-class pipelines
(Joulin et al. 2016 "Bag of Tricks for Efficient Text Classification").

Architecture: unigram + word-bigram features are mapped into a fixed
feature space with the hashing trick, each document is scored by the sum
/ mean of its features' weights, and a keep/drop label is a threshold on
the mean. Two scoring paths:

- ``classifier_scores`` — weights derived per feature id by a frozen
  affine-mod formula. A ZERO-SHUFFLE JVM projection (one ``aggregate``
  fold over the gram array per doc): Catalyst pipelines it straight into
  the scan, nothing moves on the exchange — the shape you want in front
  of a 10^12-doc corpus filter. This sandbox has no labels to train real
  weights from, so the formula is an explicit deterministic stand-in;
  the hashing / pooling / thresholding plumbing is the real surface and
  is what the DuckDB oracle replays.
- ``score_with_weight_table`` — the production path for a real trained
  model: a small ``(feature_id, weight_milli)`` frame is broadcast and
  the gram stream joins it (explode -> broadcast hash join -> one doc-id
  aggregate; the weight table is O(feature dim), always broadcastable).
  Missing features score 0, exactly like an absent row of a sparse
  weight vector.

All scores are INTEGER milli-weights: integer sums are exact and
order-free in both Spark and DuckDB (see CLAUDE.md — integer-scaled
intermediate scores are the cross-engine-safe kind), so the graded
output never sits on a float rounding boundary. The keep rule
``w_sum * 1000 > threshold_milli * n_grams`` is the exact-rational form
of ``mean weight > threshold_milli / 1000``.

Reference parity note: the reference engine (shaheming/searchEngine) has
no classifier; this operator is part of the LLM-training-data surface the
brief mandates beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_ngrams
from .hashing import md5_prefix48
from .quality import _raw_tokens

# feature space + frozen stand-in weight constants (shared verbatim with
# the DuckDB oracle twin — entry_queries._quality_classifier_sql)
FEATURE_DIM = 1 << 18
W_A = 1103515245
W_B = 12345
W_P = (1 << 31) - 1
W_RANGE = 2001  # milli-weights span [-1000, 1000]
DEFAULT_THRESHOLD_MILLI = 50  # keep docs with mean weight > 0.05


def doc_grams(tokens_col):
    """Unigram + word-bigram feature stream (instances, duplicates kept) —
    fastText's default n=2 word-ngram features. ``tokens_col`` must be a
    BOUND tokens column (project ``_raw_tokens`` behind a select boundary
    first): ``word_ngrams`` slices inside an F.transform lambda, and a
    captured tokenization EXPRESSION would re-run the whole
    lower/regexp/split per element — O(n_tokens²) per doc (CLAUDE.md).
    Stop words are KEPT: function words are load-bearing classifier
    features, unlike index terms."""
    return F.concat(tokens_col, word_ngrams(tokens_col, 2))


def feature_id(gram_col):
    """Hashing trick: 48-bit md5 prefix of the gram, mod FEATURE_DIM.
    Same construction as the MinHash shingle ids (dedup.py) so the
    cross-engine hash arithmetic exists in one shape only."""
    return md5_prefix48(gram_col) % F.lit(FEATURE_DIM)


def formula_weight_milli(fid_col):
    """Frozen deterministic stand-in weight for a feature id, an integer
    in [-1000, 1000]: ((A*fid + B) mod P) mod 2001 - 1000. fid < 2^18 and
    A < 2^31 keep every intermediate far inside int64."""
    return ((F.lit(W_A) * fid_col + F.lit(W_B)) % F.lit(W_P)) % F.lit(
        W_RANGE
    ) - F.lit(1000)


def classifier_keep_col(tokens_col, threshold_milli: int = DEFAULT_THRESHOLD_MILLI):
    """``classifier_scores``' keep label as ONE inline boolean expression
    over a BOUND tokens column (same contract as ``doc_grams``): feature
    instances exist (empty docs can't be vouched for) and the exact
    integer mean milli-weight clears the threshold. Lets pipelines (the
    curation funnel) carry the classifier verdict as a per-doc flag
    without a join against the score frame."""
    grams = doc_grams(tokens_col)
    w_sum = F.aggregate(
        grams,
        F.lit(0).cast("long"),
        lambda acc, g: acc + formula_weight_milli(feature_id(g)),
    )
    n = F.size(grams).cast("long")
    return (n > 0) & ((w_sum * F.lit(1000)) > (F.lit(int(threshold_milli)) * n))


def classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_milli: int = DEFAULT_THRESHOLD_MILLI,
) -> DataFrame:
    """Per-doc classifier sums with formula weights — zero-shuffle
    projection. Returns (id, n_grams, w_sum_milli, keep): n_grams counts
    feature instances, w_sum_milli their exact integer weight sum, keep
    the thresholded label (empty docs are dropped, like a filter that
    cannot vouch for them)."""
    toked = df.select(
        F.col(id_col), _raw_tokens(F.col(text_col)).alias("_toks")
    )
    grams = doc_grams(F.col("_toks"))
    w_sum = F.aggregate(
        grams,
        F.lit(0).cast("long"),
        lambda acc, g: acc + formula_weight_milli(feature_id(g)),
    )
    n = F.size(grams).cast("long")
    return toked.select(
        F.col(id_col),
        n.alias("n_grams"),
        w_sum.alias("w_sum_milli"),
        (
            (w_sum * F.lit(1000)) > (F.lit(int(threshold_milli)) * n)
        ).alias("keep"),
    ).where(F.col("n_grams") > 0)


def score_with_weight_table(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_milli: int = DEFAULT_THRESHOLD_MILLI,
) -> DataFrame:
    """Production scoring path: ``weights`` is a (feature_id, weight_milli)
    frame — a real trained model's sparse weight vector. The gram stream
    explodes, BROADCAST-joins the weight table (O(feature dim) rows, never
    a shuffle of the corpus side), and one doc-keyed aggregate pools the
    sums. Features absent from the table weigh 0."""
    grams = (
        df.select(F.col(id_col), _raw_tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(doc_grams(F.col("_toks"))).alias("gram"))
        .select(F.col(id_col), feature_id(F.col("gram")).alias("fid"))
    )
    joined = grams.join(
        F.broadcast(weights.select("feature_id", "weight_milli")),
        grams["fid"] == F.col("feature_id"),
        "left",
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("weight_milli"), F.lit(0)))
        .cast("long")
        .alias("w_sum_milli"),
    )
    return agg.select(
        F.col(id_col),
        "n_grams",
        "w_sum_milli",
        (
            (F.col("w_sum_milli") * F.lit(1000))
            > (F.lit(int(threshold_milli)) * F.col("n_grams"))
        ).alias("keep"),
    )


def formula_weight_table(spark) -> DataFrame:
    """The formula weights materialized as a (feature_id, weight_milli)
    frame — lets tests pin that the broadcast-join path and the
    zero-shuffle formula path score identically."""
    return spark.range(FEATURE_DIM).select(
        F.col("id").alias("feature_id"),
        formula_weight_milli(F.col("id")).alias("weight_milli"),
    )
