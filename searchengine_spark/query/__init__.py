from .boolean import search_and, search_keyword, search_or
from .fuzzy import (
    correct_query_terms,
    fuzzy_terms,
    prefix_terms,
    search_bm25_corrected,
    search_fuzzy,
    search_prefix,
)
from .ltr import ltr_features
from .morelike import doc_vectors, facet_counts, mlt_terms, more_like_this
from .phrase import search_phrase
from .collapse import collapse_results, search_bm25_collapse
from .snippets import search_snippets
from .ranked import bm25_idf, search_bm25, search_tfidf, tfidf_idf

__all__ = [
    "search_keyword",
    "fuzzy_terms",
    "search_fuzzy",
    "collapse_results",
    "search_bm25_collapse",
    "search_snippets",
    "prefix_terms",
    "search_prefix",
    "correct_query_terms",
    "search_bm25_corrected",
    "more_like_this",
    "mlt_terms",
    "doc_vectors",
    "ltr_features",
    "facet_counts",
    "search_and",
    "search_or",
    "search_phrase",
    "search_bm25",
    "search_tfidf",
    "bm25_idf",
    "tfidf_idf",
]
