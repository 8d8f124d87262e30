from .engine import Index, build_index, build_postings, make_term_positions_udf

__all__ = ["Index", "build_index", "build_postings", "make_term_positions_udf"]
