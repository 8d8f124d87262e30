"""Property-based tests (hypothesis): codec roundtrips over arbitrary
inputs — including segment-scale ordinal bases — and analyzer invariants.
No Spark session needed; these run in milliseconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.analysis.analyzer import analyze
from searchengine_spark.analysis.porter import stem
from searchengine_spark.analysis.stopwords import STOP_WORDS
from searchengine_spark.analysis.tokenizers import punctuation_tokenize
from searchengine_spark.codec import varbyte
from searchengine_spark.index.blocks import pack_term_run, unpack_block

sorted_ints = st.lists(
    st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200
).map(sorted)


@given(sorted_ints)
@settings(max_examples=200)
def test_delta_varbyte_roundtrip(vals):
    assert list(varbyte.decode(varbyte.encode(vals))) == vals


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200)
def test_plain_varbyte_roundtrip(vals):
    assert list(varbyte.decode_plain(varbyte.encode_plain(vals))) == vals


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=100_000), max_size=20).map(
            sorted
        ),
        max_size=40,
    )
)
@settings(max_examples=100)
def test_position_lists_roundtrip(lists):
    back = varbyte.decode_position_lists(varbyte.encode_position_lists(lists))
    assert [list(x) for x in back] == lists


@given(
    base=st.integers(min_value=0, max_value=1 << 55),
    gaps=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
    tfs_max=st.integers(min_value=1, max_value=500),
    block_size=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=50)
def test_block_pack_roundtrip(base, gaps, tfs_max, block_size):
    ords = base + np.cumsum(np.asarray(gaps, dtype=np.int64))
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, tfs_max + 1, size=len(ords))
    dls = rng.integers(1, 1000, size=len(ords))
    rows = pack_term_run("t", ords, tfs, dls, None, block_size=block_size)
    got_o, got_t, got_d = [], [], []
    for r in rows:
        assert r["n"] <= block_size
        assert r["max_tf"] >= 1 and r["min_dl"] >= 1
        u = unpack_block(r)
        got_o.extend(u["ords"]); got_t.extend(u["tfs"]); got_d.extend(u["dls"])
    assert got_o == list(ords) and got_t == list(tfs) and got_d == list(dls)


@given(st.text(max_size=300))
@settings(max_examples=300)
def test_tokenizer_total(text):
    """Never raises; never emits empties, separators, uppercase or stop
    words (the analyze chain additionally never raises on any input)."""
    toks = punctuation_tokenize(text)
    for t in toks:
        assert t and t == t.lower()
        assert not any(c in t for c in ",.;?! \t\n\x0b\f\r")
        assert t not in STOP_WORDS
    analyze(text)  # stemming is total too


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), max_size=30))
@settings(max_examples=300)
def test_stemmer_total_and_short_guard(word):
    out = stem(word)
    assert isinstance(out, str)
    if len(word) <= 2:
        assert out == word  # k > k0+1 guard (PorterStemmer.java:429)


# ---------------------------------------------------------------------------
# session-4 operators: pure-python twins of the JVM expressions, so the
# properties run hypothesis-fast without a SparkSession
# ---------------------------------------------------------------------------

_PII_RULES = None


def _pii_py(text: str) -> str:
    """Python twin of pii._scrub_steps' sequential replacement."""
    global _PII_RULES
    import re

    from searchengine_spark.textops.pii import PII_PATTERNS

    if _PII_RULES is None:
        _PII_RULES = [(re.compile(p), r) for _, p, r in PII_PATTERNS]
    for pat, repl in _PII_RULES:
        text = pat.sub(repl, text)
    return text


@given(st.text(alphabet="abc0123456789.@-+ <EMAIL>", max_size=60))
@settings(max_examples=200, deadline=None)
def test_pii_scrub_is_idempotent(text):
    """Scrubbing twice == scrubbing once: replacement tokens must never
    create new matches for any pattern."""
    once = _pii_py(text)
    assert _pii_py(once) == once


@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=15),
)
@settings(max_examples=300, deadline=None)
def test_chunk_rule_covers_every_token_exactly(n, max_tokens, overlap):
    """chunking.chunk_starts (the module's OWN start rule, shared with the
    Spark expression) covers every token index, steps uniformly, and
    rejects invalid overlap."""
    from searchengine_spark.textops.chunking import chunk_starts

    if overlap >= max_tokens:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            chunk_starts(n, max_tokens, overlap)
        return
    starts = chunk_starts(n, max_tokens, overlap)
    step = max_tokens - overlap
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + max_tokens, n)))
    assert covered == set(range(n))
    assert all(b - a == step for a, b in zip(starts, starts[1:]))
    assert (n == 0) == (starts == [])
