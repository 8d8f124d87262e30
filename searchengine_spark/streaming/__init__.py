from .incremental import start_incremental_index
from .windows import windowed_event_counts, windowed_term_counts

__all__ = [
    "start_incremental_index",
    "windowed_event_counts",
    "windowed_term_counts",
]
