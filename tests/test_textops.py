"""Text-ops unit tests: SimHash blocking recall, dedup pipeline, media
features. (Most textops are additionally DuckDB-oracled via
tests/test_entry_contract.py; these tests pin properties the oracle can't
express — e.g. blocking recall vs. exact all-pairs ground truth.)"""

from __future__ import annotations

import itertools

import pytest

from searchengine_spark.textops import quality as q


@pytest.fixture(scope="module")
def noisy_docs(spark):
    """Near-duplicate clusters: a base sentence plus variants with 1-6 word
    substitutions — enough perturbation to land pairs across the whole
    hamming 0..20 range."""
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls on the quiet green hill near the old stone bridge"
    ).split()
    rows = []
    rid = 0
    for c in range(8):
        words = [f"c{c}w{i}" if i % 7 == c % 7 else w for i, w in enumerate(base)]
        for v in range(5):
            wv = list(words)
            for j in range(v):  # v substitutions => growing hamming distance
                wv[(3 * j + c) % len(wv)] = f"c{c}v{v}x{j}"
            rows.append((rid, " ".join(wv)))
            rid += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("radius", [3, 7, 11])
def test_simhash_blocking_recall_complete(spark, noisy_docs, radius):
    """Pigeonhole contract: blocked pairs == exact all-pairs at the
    requested radius (the round-1 bug was silent under-recall when the
    radius exceeded what 16-bit chunks guarantee)."""
    sims = {
        r["doc_id"]: r["simhash"] for r in q.simhash(noisy_docs).collect()
    }
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(sims), 2)
        if bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1") <= radius
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q.simhash_near_pairs(noisy_docs, max_hamming=radius).collect()
    }
    assert got == exact
    assert exact, "fixture produced no pairs at this radius — test is vacuous"


def test_simhash_unblockable_radius_raises(spark, noisy_docs):
    with pytest.raises(ValueError, match="not blockable"):
        q.simhash_near_pairs(noisy_docs, max_hamming=32)


def test_simhash_chunk_bounds_cover_64_bits():
    for h in [0, 3, 7, 15, 31]:
        bounds = q.simhash_chunk_bounds(h)
        assert len(bounds) == h + 1
        covered = sorted(
            bit for shift, width in bounds for bit in range(shift, shift + width)
        )
        assert covered == list(range(64)), f"radius {h} leaves bits uncovered"
