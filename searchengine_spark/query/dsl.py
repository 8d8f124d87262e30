"""Elasticsearch-style query DSL compiler.

One JSON-shaped dict in, one ranked DataFrame out — the migration surface
for users arriving from an ES-like engine: the DSL tree compiles onto the
engine's existing operators (every leaf keeps its oracled semantics), so
a query written as data works unchanged against the logical or artifact
backend. Supported nodes:

  {"match":   {"query": "free text"}}                      # BM25
  {"bool":    {"must": [...], "should": [...],
               "must_not": [...], "filter": [...],
               "minimum_should_match": int}}               # scored boolean
  {"boosting": {"positive": <match>, "negative": <match>,
                "negative_boost": 0.4}}                    # soft demotion
  {"function_score": {"query": <node>,
                      "gauss" | "exp" | "linear": {
                         "field": col, "origin": x,
                         "scale": s, "offset": o, "decay": d}}}

Filter-context nodes (inside ``bool.filter``, evaluated over the
``meta`` frame, never scored):

  {"term":  {"<col>": value}}
  {"range": {"<col>": {"gt"/"gte"/"lt"/"lte": bound, ...}}}
  {"bool":  {"must"/"filter": [...], "should": [...], "must_not": [...]}}

Compilation strategy (scale notes): filters compile to ONE predicate over
the metadata frame — a single pushdown-friendly ``where`` producing the
``allowed`` doc set, which every scorer semi-joins into the postings
BEFORE its per-doc shuffle (restriction semantics; collection stats stay
corpus-global). Scoring clauses map 1:1 onto ``search_bm25`` /
``search_bm25_boolean`` / ``search_bm25_boosting`` / ``decay_columns`` —
no new scoring math lives here, which is what keeps the DSL oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranked import (
    decay_columns,
    search_bm25,
    search_bm25_boolean,
    search_bm25_boosting,
)

_RANGE_OPS = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__", "lte": "__le__"}


class DslError(ValueError):
    pass


def _one_key(node: dict, ctx: str) -> tuple[str, object]:
    if not isinstance(node, dict) or len(node) != 1:
        raise DslError(f"{ctx}: expected a single-key dict, got {node!r}")
    return next(iter(node.items()))


def _match_text(node, ctx: str) -> str:
    kind, body = _one_key(node, ctx)
    if kind != "match" or "query" not in body:
        raise DslError(f"{ctx}: expected {{'match': {{'query': ...}}}}, got {node!r}")
    return body["query"]


def compile_filter(node: dict):
    """Filter-context node -> boolean Column over the metadata frame."""
    kind, body = _one_key(node, "filter")
    if kind == "term":
        col, val = _one_key(body, "term")
        return F.col(col) == F.lit(val)
    if kind == "range":
        col, bounds = _one_key(body, "range")
        if not bounds or not set(bounds) <= set(_RANGE_OPS):
            raise DslError(f"range bounds must be gt/gte/lt/lte, got {bounds!r}")
        pred = None
        for op in sorted(bounds):
            c = getattr(F.col(col), _RANGE_OPS[op])(F.lit(bounds[op]))
            pred = c if pred is None else pred & c
        return pred
    if kind == "bool":
        parts = []
        for clause in ("must", "filter"):
            for sub in body.get(clause, []):
                parts.append(compile_filter(sub))
        should = [compile_filter(s) for s in body.get("should", [])]
        if should:
            acc = should[0]
            for s in should[1:]:
                acc = acc | s
            parts.append(acc)
        for sub in body.get("must_not", []):
            parts.append(~compile_filter(sub))
        if not parts:
            raise DslError("empty bool filter")
        acc = parts[0]
        for p in parts[1:]:
            acc = acc & p
        return acc
    raise DslError(f"unknown filter node {kind!r}")


def search_dsl(
    index,
    dsl: dict,
    meta: DataFrame | None = None,
    k: int | None = None,
) -> DataFrame:
    """Execute a DSL tree; returns ``(doc_id, score)`` in the engine's
    deterministic order (score desc, doc_id asc), ``k`` truncates.
    ``meta`` (a frame with ``doc_id`` + the filter/decay columns) is
    required whenever the tree uses ``bool.filter`` or
    ``function_score``."""
    return _compile(index, dsl, meta, k)


def _need_meta(meta, what: str) -> DataFrame:
    if meta is None:
        raise DslError(f"{what} requires a meta frame")
    return meta


def _compile(index, node, meta, k) -> DataFrame:
    kind, body = _one_key(node, "query")
    if kind == "match":
        return search_bm25(index, _match_text(node, "match"), k)
    if kind == "bool":
        unknown = set(body) - {
            "must", "should", "must_not", "filter", "minimum_should_match"
        }
        if unknown:
            raise DslError(f"unknown bool clauses {sorted(unknown)}")
        allowed = None
        filters = body.get("filter", [])
        if filters:
            m = _need_meta(meta, "bool.filter")
            pred = None
            for f_node in filters:
                c = compile_filter(f_node)
                pred = c if pred is None else pred & c
            allowed = m.where(pred)
        return search_bm25_boolean(
            index,
            must=[_match_text(n, "bool.must") for n in body.get("must", [])],
            should=[_match_text(n, "bool.should") for n in body.get("should", [])],
            must_not=[
                _match_text(n, "bool.must_not") for n in body.get("must_not", [])
            ],
            k=k,
            min_should_match=body.get("minimum_should_match"),
            allowed=allowed,
        )
    if kind == "boosting":
        for req in ("positive", "negative"):
            if req not in body:
                raise DslError(f"boosting missing {req!r}")
        return search_bm25_boosting(
            index,
            _match_text(body["positive"], "boosting.positive"),
            _match_text(body["negative"], "boosting.negative"),
            negative_boost=float(body.get("negative_boost", 0.5)),
            k=k,
        )
    if kind == "function_score":
        fs_kinds = [kk for kk in ("gauss", "exp", "linear") if kk in body]
        if "query" not in body or len(fs_kinds) != 1:
            raise DslError(
                "function_score needs 'query' and exactly one of gauss/exp/linear"
            )
        fk = fs_kinds[0]
        spec = body[fk]
        for req in ("field", "origin", "scale"):
            if req not in spec:
                raise DslError(f"function_score.{fk} missing {req!r}")
        inner = _compile(index, body["query"], meta, None)
        m = _need_meta(meta, "function_score").select(
            "doc_id", F.col(spec["field"]).cast("double").alias("_x")
        )
        _, mult = decay_columns(
            F.col("_x"),
            float(spec["origin"]),
            float(spec["scale"]),
            float(spec.get("offset", 0.0)),
            float(spec.get("decay", 0.5)),
            fk,
        )
        out = inner.join(m, "doc_id").select(
            "doc_id", (F.col("score") * mult).alias("score")
        ).orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k is not None else out
    raise DslError(f"unknown query node {kind!r}")
