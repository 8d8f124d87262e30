from .incremental import start_incremental_index
from .stateful import conversation_sessions
from .windows import windowed_event_counts, windowed_term_counts

__all__ = [
    "start_incremental_index",
    "conversation_sessions",
    "windowed_event_counts",
    "windowed_term_counts",
]
