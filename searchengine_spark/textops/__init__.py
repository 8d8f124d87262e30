from .dedup import (
    band_keys,
    connected_components,
    dedup_pipeline,
    exact_dedup,
    exact_dedup_summary,
    incremental_dedup,
    jaccard_for_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    signature_store,
    word_shingles,
)
from .boilerplate import (
    boilerplate_summary,
    line_frequencies,
    strip_boilerplate,
)
from .bpe import bpe_token_counts, bpe_train, word_types
from .classifier import (
    classifier_scores,
    formula_weight_table,
    score_with_weight_table,
)
from .sharding import (
    export_shards,
    read_shard,
    shard_assignments,
    shard_stats,
)
from .chunking import chunk_documents
from .lm import bigram_lm, lm_perplexity, lm_score
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
from .curation import curate_sources, perplexity_buckets, source_stats
from .dsir import dsir_select, dsir_weights, hashed_gram_features
from .sampling import stratified_sample, training_mix
from .evalmetrics import ngram_counts, ngram_overlap_eval
from .sketches import kmv_distinct
from .skipgram import ppmi_weights, skipgram_counts, skipgram_pairs
from .similarity import (
    brute_force_topk,
    build_lsh_index,
    embedding_near_dup_pairs,
    hard_negatives,
    int8_topk,
    ivf_topk,
    lsh_topk,
    lsh_topk_indexed,
    pq_encode,
    pq_topk,
    pq_train,
    quantize_embeddings,
    training_triplets,
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
    "hard_negatives",
    "int8_topk",
    "pq_encode",
    "pq_topk",
    "pq_train",
    "quantize_embeddings",
    "training_triplets",
    "embedding_near_dup_pairs",
    "pii_scrub",
    "pii_summary",
    "stratified_sample",
    "training_mix",
    "band_keys",
    "signature_store",
    "incremental_dedup",
    "bigram_lm",
    "lm_score",
    "lm_perplexity",
    "bpe_train",
    "bpe_token_counts",
    "word_types",
    "chunk_documents",
    "curate_sources",
    "perplexity_buckets",
    "source_stats",
    "dsir_select",
    "dsir_weights",
    "hashed_gram_features",
    "kmv_distinct",
    "ppmi_weights",
    "skipgram_counts",
    "skipgram_pairs",
    "ngram_counts",
    "ngram_overlap_eval",
    "boilerplate_summary",
    "line_frequencies",
    "strip_boilerplate",
]
