"""searchengine_spark — a PySpark-native inverted-index + BM25 analytics engine.

A from-scratch Spark DataFrame engine with the query and data-processing
capabilities of the reference full-text engine (shaheming/searchEngine,
UCI CS221 "Peterman Search Engine"): analyzer chain (punctuation tokenizer +
stop words + Porter stemmer), positional inverted index build with salted
term aggregation, delta+varbyte block compression with block-max metadata,
boolean / phrase / TF-IDF / BM25 queries, PageRank, plus large-scale
training-data pipeline operators (dedup, similarity search, text quality).

Design stance (SURVEY.md §7.0):
- docID is the global string key ``conv_id:turn_idx`` (or any caller-supplied
  string key); there is no segment-local re-basing.
- Postings are a DataFrame ``(term, doc_id, tf, positions)``; the persisted
  index artifact packs them into docID-ordered compressed blocks.
- All per-document text work runs in Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
