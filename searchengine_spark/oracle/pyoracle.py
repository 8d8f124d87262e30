"""Single-node pure-Python oracle engine.

Plays the role the reference's ``FullScanSearcher`` plays in its own test
suite (``search/FullScanSearcher.java:27-40``): an independent, trivially
auditable implementation of the exact same query semantics, used to verify
the Spark engine's results rank-identically. Same analyzer chain, same
formulas (see ``query/ranked.py`` for the provenance of each).
"""

from __future__ import annotations

import math
from collections import Counter

from ..analysis import get_analyzer
from ..query.ranked import bm25_idf, tfidf_idf


class OracleIndex:
    def __init__(self, docs: dict[str, str], analyzer: str = "composable",
                 k1: float = 1.2, b: float = 0.75):
        """docs: {doc_id: text}."""
        self.analyzer = get_analyzer(analyzer)
        self.k1, self.b = k1, b
        self.n_docs = len(docs)
        self.docs = docs
        self.positions: dict[str, dict[str, list[int]]] = {}  # term -> doc -> pos
        self.dl: dict[str, int] = {}
        for doc_id, text in docs.items():
            tokens = self.analyzer(text)
            self.dl[doc_id] = len(tokens)
            for i, t in enumerate(tokens):
                self.positions.setdefault(t, {}).setdefault(doc_id, []).append(i)
        total = sum(self.dl.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0

    def _analyze_query(self, query) -> list[str]:
        if not isinstance(query, str):
            query = " ".join(query)
        return self.analyzer(query)

    def df(self, term: str) -> int:
        return len(self.positions.get(term, {}))

    def search_and(self, keywords) -> set[str]:
        terms = set(self._analyze_query(keywords))
        if not terms:
            return set()
        sets = [set(self.positions.get(t, {})) for t in terms]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out

    def search_or(self, keywords) -> set[str]:
        terms = set(self._analyze_query(keywords))
        out: set[str] = set()
        for t in terms:
            out |= set(self.positions.get(t, {}))
        return out

    def search_phrase(self, phrase) -> set[str]:
        terms = self._analyze_query(phrase)
        if not terms:
            return set()
        candidates = self.search_and(terms)
        if len(terms) == 1:
            return candidates
        out = set()
        for doc_id in candidates:
            first = self.positions[terms[0]][doc_id]
            rest = [set(self.positions[t][doc_id]) for t in terms[1:]]
            if any(all(p + j + 1 in s for j, s in enumerate(rest)) for p in first):
                out.add(doc_id)
        return out

    def _ranked(self, query, k, score_doc) -> list[tuple[str, float]]:
        terms = self._analyze_query(query)
        qtf = Counter(terms)
        matched: set[str] = set()
        for t in qtf:
            matched |= set(self.positions.get(t, {}))
        scores = [(doc_id, score_doc(doc_id, qtf)) for doc_id in matched]
        scores = [(d, s) for d, s in scores if s is not None]
        scores.sort(key=lambda p: (-p[1], p[0]))
        return scores[:k] if k is not None else scores

    def search_bm25(self, query, k: int | None = None) -> list[tuple[str, float]]:
        k1, b = self.k1, self.b
        avgdl = self.avgdl or 1.0

        def score(doc_id, qtf):
            s = 0.0
            for t, count in sorted(qtf.items()):
                postings = self.positions.get(t, {})
                if not postings or doc_id not in postings:
                    continue
                tf = len(postings[doc_id])
                idf = bm25_idf(self.n_docs, len(postings))
                dl = self.dl[doc_id]
                s += count * idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            return s

        return self._ranked(query, k, score)

    def search_tfidf(self, query, k: int | None = None) -> list[tuple[str, float]]:
        def score(doc_id, qtf):
            dot = 0.0
            len2 = 0.0
            for t, count in sorted(qtf.items()):
                postings = self.positions.get(t, {})
                if not postings or doc_id not in postings:
                    continue
                idf = tfidf_idf(self.n_docs, len(postings))
                tfidf = len(postings[doc_id]) * idf
                dot += tfidf * idf * count
                len2 += tfidf * tfidf
            if len2 <= 0.0:
                return None
            return dot / math.sqrt(len2)

        return self._ranked(query, k, score)

    def full_scan_search(self, keyword: str) -> set[str]:
        """Reference FullScanSearcher: analyze(doc) ⊇ analyze(keyword)."""
        q = set(self._analyze_query(keyword))
        out = set()
        for doc_id, text in self.docs.items():
            if q <= set(self.analyzer(text)):
                out.add(doc_id)
        return out
