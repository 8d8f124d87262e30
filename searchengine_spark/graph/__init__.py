from .pagerank import (
    combined_rank,
    compute_pagerank,
    personalized_pagerank,
    read_edge_tsv,
)

__all__ = [
    "compute_pagerank",
    "personalized_pagerank",
    "combined_rank",
    "read_edge_tsv",
]
