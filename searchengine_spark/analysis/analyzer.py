"""Analyzer chain = tokenize ∘ stem, plus the Spark-facing vectorized UDFs.

Parity source: ``analysis/ComposableAnalyzer.java:21-24`` — tokens from the
tokenizer are each stemmed. The canonical chain (used by the reference's
ranked search unconditionally, ``InvertedIndexManager.java:579-585``) is
PunctuationTokenizer + PorterStemmer.

Spark side: one Arrow-vectorized pandas UDF ``analyze_udf`` mapping
``pd.Series[str] -> pd.Series[list[str]]``. Stemming is memoized per
executor via ``porter.stem``'s lru_cache (vocabulary ≪ token count), and
each batch stems only its unique tokens.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .porter import stem
from .tokenizers import naive_tokenize, punctuation_tokenize

Analyzer = Callable[[str], "list[str]"]


def analyze(text: str) -> list[str]:
    """Canonical chain: punctuation tokenizer -> Porter stem per token."""
    return [stem(t) for t in punctuation_tokenize(text)]


def naive_analyze(text: str) -> list[str]:
    return naive_tokenize(text)


_ANALYZERS: dict[str, Analyzer] = {
    "composable": analyze,
    "naive": naive_analyze,
    "punctuation": punctuation_tokenize,
}


def get_analyzer(name: str) -> Analyzer:
    try:
        return _ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; one of {sorted(_ANALYZERS)}") from None


def make_analyze_udf(analyzer: str = "composable"):
    """Build the Arrow-vectorized analyze UDF (text -> array<string>)."""
    fn = get_analyzer(analyzer)

    if analyzer == "composable":
        # stem only unique tokens per batch: tokenize, then one dict pass
        def _batch(texts: pd.Series) -> pd.Series:
            token_lists = [punctuation_tokenize(t) if t is not None else [] for t in texts]
            vocab = {t for toks in token_lists for t in toks}
            stemmed = {t: stem(t) for t in vocab}
            return pd.Series([[stemmed[t] for t in toks] for toks in token_lists])

    else:

        def _batch(texts: pd.Series) -> pd.Series:
            return pd.Series([fn(t) if t is not None else [] for t in texts])

    return pandas_udf(_batch, ArrayType(StringType()))
