from .bfs import bfs_distances
from .hits import compute_hits
from .kcore import kcore_nodes
from .labelprop import label_propagation
from .linkpred import link_prediction
from .pagerank import (
    combined_rank,
    compute_pagerank,
    personalized_pagerank,
    read_edge_tsv,
)
from .triangles import node_triangle_counts, triangle_count, triangles
from .walks import random_walks

__all__ = [
    "bfs_distances",
    "compute_pagerank",
    "personalized_pagerank",
    "combined_rank",
    "compute_hits",
    "read_edge_tsv",
    "kcore_nodes",
    "label_propagation",
    "link_prediction",
    "node_triangle_counts",
    "triangle_count",
    "triangles",
    "random_walks",
]
