from .incremental import init_dedup_store, start_incremental_index
from .stateful import conversation_sessions
from .windows import windowed_event_counts, windowed_term_counts

__all__ = [
    "start_incremental_index",
    "init_dedup_store",
    "conversation_sessions",
    "windowed_event_counts",
    "windowed_term_counts",
]
