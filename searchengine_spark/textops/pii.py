"""PII scrubbing: redact emails / IPv4 addresses / phone numbers from a
text column, reporting per-document match counts.

A large-scale training-data pipeline scrubs PII before anything else
touches the text, so the operator is built to sit at the very front of a
100 TB pass: it is a ZERO-SHUFFLE projection — three sequential JVM
``regexp_replace`` calls plus ``regexp_count`` probes, all inside
whole-stage codegen, pipelined straight off the parquet scan. No UDF, no
Python, no exchange.

The reference engine has no PII stage (it indexes a trusted corpus); this
module is part of the training-data-pipeline surface the brief adds on
top of the reference's operator set.

Pattern notes
-------------
The three regexes deliberately stay inside the common subset of Java
regex (Spark) and RE2 (DuckDB) — character classes, bounded repetition,
``\\b`` / ``\\d`` — no lookahead, no backreferences — so the DuckDB
oracle replays the exact same patterns and the scrubbed text is
hash-compared byte-for-byte (as md5) across engines.

Counts are taken SEQUENTIALLY on the progressively-scrubbed text
(emails first, then IPv4, then phones), so each count is exactly "the
number of replacements that pattern performed", and an email's digits
can never double-count as a phone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: each pattern is counted and replaced on the text as left by the
# previous one. Keep to the Java-regex ∩ RE2 subset (see module docstring).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def _scrub_steps(text_col: Column) -> tuple[Column, list[Column]]:
    """Return (fully scrubbed text, [per-pattern count columns])."""
    cur = text_col
    counts: list[Column] = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return cur, counts


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact PII from ``text_col``.

    Returns ``id_col``, per-pattern match counts (``n_email``, ``n_ipv4``,
    ``n_phone``), and the scrubbed text as ``scrubbed``. Pure projection:
    keeps the input's partitioning, shuffles nothing.
    """
    scrubbed, counts = _scrub_steps(F.col(text_col))
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def pii_summary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Like :func:`pii_scrub` but returns ``scrubbed_md5`` instead of the
    scrubbed text — the cross-engine hash-comparable form used by the
    driver-contract registry (md5 is identical in Spark and DuckDB)."""
    scrubbed, counts = _scrub_steps(F.col(text_col))
    return df.select(
        F.col(id_col), *counts, F.md5(scrubbed).alias("scrubbed_md5")
    )
