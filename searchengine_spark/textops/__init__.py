from .dedup import (
    connected_components,
    dedup_pipeline,
    exact_dedup,
    exact_dedup_summary,
    jaccard_for_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    word_shingles,
)
from .pii import pii_scrub, pii_summary
from .quality import (
    doc_fingerprint,
    lang_guess,
    quality_filter,
    simhash,
    simhash_near_pairs,
    text_quality,
    token_count_bpe,
)
from .sampling import stratified_sample, training_mix
from .similarity import (
    brute_force_topk,
    build_lsh_index,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
    lsh_topk_indexed,
)

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
    "connected_components",
    "dedup_pipeline",
    "jaccard_for_pairs",
    "quality_filter",
    "build_lsh_index",
    "lsh_topk_indexed",
    "embedding_near_dup_pairs",
    "pii_scrub",
    "pii_summary",
    "stratified_sample",
    "training_mix",
]
