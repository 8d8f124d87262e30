"""Tokenizers — behavioral parity with the reference analysis layer.

Parity sources:
- ``analysis/PunctuationTokenizer.java:20-53``: ONLY the five marks
  ``, . ; ? !`` are separators (``'``, ``-``, ``"`` etc. stay inside tokens);
  whitespace per Java ``\\s`` = ``[ \\t\\n\\x0b\\f\\r]``; lowercase; drop
  empties; drop stop words. Golden: ``"I am Happy Today!" -> [happy, today]``.
- ``analysis/NaiveAnalyzer.java:13-16``: lowercase + whitespace split only
  (keeps stop words; debugging analyzer).
"""

from __future__ import annotations

import re

from .stopwords import STOP_WORDS

# Java's \s (non-unicode mode) — deliberately NOT python's str.split() set.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
_PUNCT_TABLE = str.maketrans({c: " " for c in ",.;?!"})


def punctuation_tokenize(text: str) -> list[str]:
    """Five-punctuation + whitespace tokenizer with stop-word removal."""
    tokens = _WS_RE.split(text.translate(_PUNCT_TABLE).lower())
    return [t for t in tokens if t and t not in STOP_WORDS]


def naive_tokenize(text: str) -> list[str]:
    """Lowercase + whitespace split; keeps stop words and empties-at-edges
    exactly like Java ``split("\\s+")`` (a leading separator yields a leading
    empty string in Java; trailing ones are dropped)."""
    toks = _WS_RE.split(text.lower())
    # Java String.split drops trailing empties but keeps a leading one;
    # the reference NaiveAnalyzer is debug-only, we normalize to non-empty.
    return [t for t in toks if t]
