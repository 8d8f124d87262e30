"""HTML/markup stripping for web-scraped training corpora.

A web-scale training pipeline's first text pass strips markup before
quality scoring, dedup, or tokenization sees the text (the C4/CommonCrawl
cleaning stage). Like :mod:`.pii`, the operator is built to sit at the
very front of a 100 TB pass: a ZERO-SHUFFLE projection — sequential JVM
``regexp_replace`` calls plus ``regexp_count`` probes, all inside
whole-stage codegen, pipelined straight off the parquet scan. No UDF, no
Python, no exchange.

The reference engine has no markup stage (it indexes pre-cleaned text);
this module is part of the training-data-pipeline surface the brief adds
on top of the reference's operator set.

Pattern notes
-------------
Patterns stay in the Java-regex ∩ RE2 subset — inline ``(?is)`` flags,
non-greedy ``.*?``, character classes — no lookahead, no backreferences —
so the DuckDB oracle replays the exact same patterns and the cleaned text
is hash-compared byte-for-byte (as md5) across engines. ``\\s`` is
avoided (Java and RE2 disagree on vertical tab); the explicit whitespace
class matches the analyzer's separator set.

Step order matters and is part of the contract:

1. ``<script>``/``<style>`` blocks go first (their CONTENT must vanish,
   not just the tags), then comments, then remaining tags — each count is
   taken on the text as left by the previous step, so a tag inside a
   removed script block is never double-counted.
2. Entities unescape AFTER tag removal (so ``&lt;b&gt;`` cannot become a
   live ``<b>`` that step 4 would then eat) with ``&amp;`` LAST, so
   double-escaped text un-escapes exactly one level (``&amp;lt;`` →
   ``&lt;``, not ``<``).
3. Whitespace runs collapse to one space and the result is trimmed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit Java-\s-equivalent class (see module docstring)
_WS_RUN = "[ \\t\\n\\x0b\\f\\r]+"

# Ordered (name, pattern, replacement): each is counted and replaced on the
# text as left by the previous step. Java-regex ∩ RE2 subset only.
MARKUP_STEPS: tuple[tuple[str, str, str], ...] = (
    ("script", r"(?is)<script[^>]*>.*?</script>", " "),
    ("style", r"(?is)<style[^>]*>.*?</style>", " "),
    ("comment", r"(?s)<!--.*?-->", " "),
    ("tag", r"(?s)</?[a-zA-Z!][^>]*>", " "),
)

# Literal entity unescapes, applied in order AFTER tag removal; ``&amp;``
# deliberately last (module docstring, step 2).
ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _strip_steps(text_col: Column) -> tuple[Column, list[Column]]:
    """Return (cleaned text, [per-step count columns])."""
    cur = text_col
    counts: list[Column] = []
    for name, pat, repl in MARKUP_STEPS:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    for ent, repl in ENTITY_STEPS:
        cur = F.replace(cur, F.lit(ent), F.lit(repl))
    cur = F.trim(F.regexp_replace(cur, _WS_RUN, " "))
    return cur, counts


def strip_markup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Strip HTML/markup from ``text_col``.

    Returns ``id_col``, per-step removal counts (``n_script``, ``n_style``,
    ``n_comment``, ``n_tag``), and the cleaned, whitespace-normalized text
    as ``clean``. Pure projection: keeps the input's partitioning,
    shuffles nothing.
    """
    clean, counts = _strip_steps(F.col(text_col))
    return df.select(F.col(id_col), *counts, clean.alias("clean"))


def markup_summary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Like :func:`strip_markup` but returns ``clean_md5`` instead of the
    cleaned text — the cross-engine hash-comparable form used by the
    driver-contract registry (md5 is identical in Spark and DuckDB)."""
    clean, counts = _strip_steps(F.col(text_col))
    return df.select(F.col(id_col), *counts, F.md5(clean).alias("clean_md5"))
