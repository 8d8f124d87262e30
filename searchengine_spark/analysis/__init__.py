from .analyzer import analyze, get_analyzer, make_analyze_udf, naive_analyze
from .porter import stem
from .stopwords import STOP_WORDS, STOP_WORDS_EN, STOP_WORDS_JP
from .tokenizers import naive_tokenize, punctuation_tokenize

__all__ = [
    "analyze",
    "naive_analyze",
    "get_analyzer",
    "make_analyze_udf",
    "stem",
    "STOP_WORDS",
    "STOP_WORDS_EN",
    "STOP_WORDS_JP",
    "punctuation_tokenize",
    "naive_tokenize",
]
