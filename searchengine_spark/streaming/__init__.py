from .incremental import start_incremental_index

__all__ = ["start_incremental_index"]
