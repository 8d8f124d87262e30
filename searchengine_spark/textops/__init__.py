from .dedup import (
    exact_dedup,
    exact_dedup_summary,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    word_shingles,
)
from .quality import (
    doc_fingerprint,
    lang_guess,
    simhash,
    simhash_near_pairs,
    text_quality,
    token_count_bpe,
)
from .similarity import brute_force_topk, ivf_topk, lsh_topk

__all__ = [
    "exact_dedup",
    "exact_dedup_summary",
    "minhash_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "word_shingles",
    "text_quality",
    "token_count_bpe",
    "lang_guess",
    "simhash",
    "simhash_near_pairs",
    "doc_fingerprint",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
]
