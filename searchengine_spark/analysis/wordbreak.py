"""Word-break tokenizers: segment space-free text against a frequency
dictionary, maximizing the product of word probabilities.

Parity sources (algorithmic behavior, dictionary injected by the caller):

- EN (``analysis/WordBreakTokenizer.java:39-148``): dictionary file format
  ``word freq`` with BOM stripping (``:53-55``); O(n²) DP over substrings;
  unbreakable input raises (``:100-102``, "there is no possible way to
  break the string"); result drops stop words (``:113-116``); the
  reference's exhaustive max-product DFS (``:122-148``) is replaced by an
  equivalent Viterbi DP — the product objective has optimal substructure,
  so the argmax segmentation is identical.
- CJK (``analysis/WordBreakCJKTokenizer.java:44-144``): jieba-style — every
  prefix of every word inserted at freq 0 (``:67-71``), DAG of dictionary
  hits (``getDAG`` ``:79-98``), longest-path DP maximizing Σ log(freq/total)
  (``findMaxPath`` ``:122-144``), stop words dropped (``:111-117``). Zero
  frequencies get a floor of 1/total so log stays finite, matching jieba's
  smoothing role.

The reference ships an 82k-word English dictionary resource; we do not copy
it — callers pass any ``{word: freq}`` mapping (``load_freq_dict`` parses
the same ``word freq`` text format). Spark-side, ``make_wordbreak_udf``
closes over the dict: loaded once per executor process, not broadcast-joined
(SURVEY.md A7).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .stopwords import STOP_WORDS


def load_freq_dict(lines) -> dict[str, int]:
    """Parse ``word freq`` lines (iterable of str); strips a UTF-8 BOM on
    the first entry like the reference (WordBreakTokenizer.java:53-55)."""
    out: dict[str, int] = {}
    for i, line in enumerate(lines):
        line = line.strip()
        if not line:
            continue
        if i == 0:
            line = line.lstrip("﻿")
        parts = line.split()
        if len(parts) >= 2:
            out[parts[0].lower()] = int(parts[1])
    return out


def wordbreak_tokenize(
    text: str,
    freq_dict: dict[str, int],
    total: int | None = None,
    max_len: int | None = None,
) -> list[str]:
    """EN word break: segment lowercase space-free text; raises ValueError
    when no segmentation exists; stop words dropped from the result.
    ``max_len`` lets a batch caller hoist the O(|dict|) scan out of the
    per-document path (make_wordbreak_udf passes it)."""
    s = text.strip().lower()
    if not s:
        return []
    n = len(s)
    total = total or sum(freq_dict.values()) or 1
    if max_len is None:
        max_len = max(map(len, freq_dict), default=0)
    # Viterbi over log-probabilities (product objective, optimal substructure)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == NEG:
                continue
            w = s[j:i]
            f = freq_dict.get(w)
            if not f:
                continue
            cand = best[j] + math.log(f / total)
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] == NEG:
        raise ValueError("there is no possible way to break the string")
    words: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        words.append(s[j:i])
        i = j
    words.reverse()
    return [w for w in words if w not in STOP_WORDS]


def _cjk_dag_dict(freq_dict: dict[str, int]) -> dict[str, int]:
    """Every prefix of every word at freq 0, words at their freq (reference
    WordBreakCJKTokenizer.java:67-71) — O(total dict chars) to build, so
    batch callers build it ONCE, not per document."""
    dag_dict: dict[str, int] = {}
    for w, f in freq_dict.items():
        for p in range(1, len(w)):
            dag_dict.setdefault(w[:p], 0)
        dag_dict[w] = f
    return dag_dict


def wordbreak_cjk_tokenize(
    text: str,
    freq_dict: dict[str, int],
    total: int | None = None,
    dag_dict: dict[str, int] | None = None,
) -> list[str]:
    """CJK word break (jieba-style): prefix-DAG + max log-prob path; every
    single character is segmentable (prefix entries at freq 0 take a 1/total
    floor), so nothing raises; stop words dropped. Pass a precomputed
    ``dag_dict`` (``_cjk_dag_dict``) to hoist the prefix expansion out of
    the per-document path (make_wordbreak_udf does)."""
    s = text.strip()
    if not s:
        return []
    n = len(s)
    if dag_dict is None:
        dag_dict = _cjk_dag_dict(freq_dict)
    total = total or sum(freq_dict.values()) or 1
    floor = math.log(1.0 / total)
    max_len = max(map(len, dag_dict), default=1)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == NEG:
                continue
            w = s[j:i]
            if len(w) > 1 and not dag_dict.get(w):
                # reference parity: only freq>0 dictionary words are DAG
                # edges (getDAG, WordBreakCJKTokenizer.java:86-91) — a
                # zero-freq prefix entry is a trie marker, not a segment
                continue
            f = dag_dict.get(w, 0)
            # deviation (documented): unknown/zero-freq SINGLE chars stay
            # segmentable at a 1/total floor — the reference emits garbage
            # on out-of-dict chars; we degrade gracefully instead
            lp = math.log(f / total) if f else floor
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    words: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        words.append(s[j:i])
        i = j
    words.reverse()
    return [w for w in words if w not in STOP_WORDS]


def make_wordbreak_udf(freq_dict: dict[str, int], cjk: bool = False):
    """Arrow-vectorized UDF: text -> array<string> segmentation. The dict is
    a closure constant (serialized once per executor with the UDF), matching
    SURVEY.md A7's 'module-level, not broadcast-joined' disposition."""
    total = sum(freq_dict.values()) or 1
    # per-executor lazy cache: the CJK prefix DAG is built once per process
    # (building it per document dwarfed the DP itself), and it would bloat
    # the serialized closure if expanded driver-side
    prep: dict = {}

    def _batch(texts: pd.Series) -> pd.Series:
        if cjk:
            if "dag" not in prep:
                prep["dag"] = _cjk_dag_dict(freq_dict)
            dag = prep["dag"]

            def fn(t):
                return wordbreak_cjk_tokenize(t, freq_dict, total, dag_dict=dag)

        else:
            if "max_len" not in prep:
                prep["max_len"] = max(map(len, freq_dict), default=0)
            max_len = prep["max_len"]

            def fn(t):
                return wordbreak_tokenize(t, freq_dict, total, max_len=max_len)

        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            try:
                out.append(fn(t))
            except ValueError:
                out.append(None)  # unbreakable -> null row (SQL-friendly)
        return pd.Series(out)

    return pandas_udf(_batch, ArrayType(StringType()))
