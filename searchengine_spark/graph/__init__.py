from .hits import compute_hits
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
    "compute_hits",
    "read_edge_tsv",
]
