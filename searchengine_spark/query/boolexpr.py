"""Boolean query expressions: AND / OR / NOT with parentheses.

Reference scope: the Java engine exposes only FLAT AND and OR keyword
lists (``InvertedIndexManager.java:476-546``). Real query workloads
compose those with negation and grouping — "error AND NOT (timeout OR
retry)" — so this module adds a tiny boolean query language evaluated
over the same postings surface, the natural extension of Q2/Q3.

Grammar (operators must be UPPERCASE — the Lucene QueryParser
convention; lowercase "and"/"or"/"not" are ordinary terms, which the
stop-word analyzer then typically drops, so a natural-language query
like "the of and" parses as plain terms instead of a syntax error)::

    expr  := or
    or    := and ( OR and )*
    and   := unary ( (AND)? unary )*      -- adjacency is implicit AND
    unary := NOT unary | '(' expr ')' | TERM

Adjacent atoms with no operator conjoin ("error timeout" == "error AND
timeout"), matching the reference's flat keyword-list AND and Lucene's
default operator behavior; "a NOT b" therefore reads as "a AND NOT b".

Each TERM leaf runs through the index's analyzer chain. A leaf that
analyzes to several tokens is an implicit AND of them; a leaf that
analyzes away entirely (a stop word) DROPS out of its parent clause —
AND(drop, x) = x, OR(drop, x) = x, NOT(drop) = drop — the same
disposition the flat reference operators give analyzed-away keywords.

Evaluation is ONE postings scan + ONE doc_id shuffle regardless of tree
size or nesting depth: fetch postings for the distinct leaf terms,
collect each matching doc's distinct term set, and compile the tree to a
JVM boolean ``Column`` over ``array_contains(terms, leaf)`` — no
per-clause join, no driver-side set algebra, nothing leaves the JVM.

Docs containing NO leaf term never enter the aggregated frame, so this
plan is complete only for GROUNDED expressions — ones that evaluate to
false under the all-leaves-false assignment (a doc with no query term
cannot match). Ungrounded (pure-negative-satisfiable) expressions such
as "NOT error" or "a OR NOT b" additionally match every zero-term doc,
which requires a corpus scan; they raise unless the caller passes
``universe`` (a frame of all live doc_ids), in which case the zero-term
docs are unioned in via one anti-join. The groundedness test is exact:
evaluate the tree once, driver-side, with every leaf false.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEYWORDS = {"AND", "OR", "NOT"}  # exact-case, like Lucene's QueryParser

# terms: any run of non-space, non-paren characters (the analyzer decides
# what survives); parens are their own tokens
_LEX = re.compile(r"\(|\)|[^()\s]+")


class BoolQuerySyntaxError(ValueError):
    pass


def parse(query: str):
    """Parse into an AST of ('term', str) / ('and', [..]) / ('or', [..]) /
    ('not', child) tuples."""
    toks = _LEX.findall(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = peek()
        pos += 1
        return t

    def is_kw(tok, kw):
        return tok == kw

    def parse_or():
        kids = [parse_and()]
        while is_kw(peek(), "OR"):
            take()
            kids.append(parse_and())
        return kids[0] if len(kids) == 1 else ("or", kids)

    def parse_and():
        kids = [parse_unary()]
        while True:
            tok = peek()
            if is_kw(tok, "AND"):
                take()
                kids.append(parse_unary())
            elif tok is not None and tok != ")" and not is_kw(tok, "OR"):
                # implicit AND between adjacent atoms ("a b" == "a AND b")
                kids.append(parse_unary())
            else:
                break
        return kids[0] if len(kids) == 1 else ("and", kids)

    def parse_unary():
        tok = peek()
        if tok is None:
            raise BoolQuerySyntaxError(f"unexpected end of query: {query!r}")
        if is_kw(tok, "NOT"):
            take()
            return ("not", parse_unary())
        if tok == "(":
            take()
            inner = parse_or()
            if take() != ")":
                raise BoolQuerySyntaxError(f"missing ')' in {query!r}")
            return inner
        if tok == ")" or tok in _KEYWORDS:
            raise BoolQuerySyntaxError(f"unexpected {tok!r} in {query!r}")
        take()
        return ("term", tok)

    tree = parse_or()
    if pos != len(toks):
        raise BoolQuerySyntaxError(f"trailing tokens after {toks[pos - 1]!r}")
    return tree


def fold(tree, term_fn, and_fn, or_fn, not_fn):
    """Structural fold — shared by the Column compiler, the SQL-oracle
    twin, and the driver-side groundedness check."""
    kind = tree[0]
    if kind == "term":
        return term_fn(tree[1])
    if kind == "not":
        return not_fn(fold(tree[1], term_fn, and_fn, or_fn, not_fn))
    kids = [fold(c, term_fn, and_fn, or_fn, not_fn) for c in tree[1]]
    return and_fn(kids) if kind == "and" else or_fn(kids)


def analyze_tree(tree, analyze):
    """Replace each raw leaf with its analyzed token(s): multi-token leaves
    become an implicit AND, analyzed-away leaves drop (None) with
    AND/OR/NOT absorption as in the module docstring. Returns None when
    the whole tree drops."""
    kind = tree[0]
    if kind == "term":
        toks = analyze(tree[1])
        if not toks:
            return None
        uniq = sorted(set(toks))
        if len(uniq) == 1:
            return ("term", uniq[0])
        return ("and", [("term", t) for t in uniq])
    if kind == "not":
        kid = analyze_tree(tree[1], analyze)
        return None if kid is None else ("not", kid)
    kids = [analyze_tree(c, analyze) for c in tree[1]]
    kids = [c for c in kids if c is not None]
    if not kids:
        return None
    return kids[0] if len(kids) == 1 else (kind, kids)


def leaf_terms(tree) -> list[str]:
    out: set[str] = set()
    fold(tree, out.add, lambda _: None, lambda _: None, lambda _: None)
    return sorted(out)


def is_grounded(tree) -> bool:
    """True iff a doc containing none of the leaf terms cannot match."""
    return not fold(
        tree, lambda _t: False, all, any, lambda x: not x
    )


def search_boolean(index, query: str, universe: DataFrame | None = None) -> DataFrame:
    """Evaluate a boolean query string against the index -> doc_id frame.

    ``universe``: frame containing every live doc_id, required only for
    ungrounded (pure-negative-satisfiable) expressions; tombstoned docs
    are filtered from it with the index's own filter.
    """
    tree = analyze_tree(parse(query), index.analyze_query)
    if tree is None:
        return index.spark.createDataFrame([], "doc_id string")
    terms = leaf_terms(tree)
    post = index.postings_for_terms(terms, positional=False)
    per_doc = post.groupBy("doc_id").agg(F.collect_set("term").alias("_ts"))
    col = fold(
        tree,
        lambda t: F.array_contains(F.col("_ts"), t),
        lambda ks: reduce(lambda a, b: a & b, ks),
        lambda ks: reduce(lambda a, b: a | b, ks),
        lambda k: ~k,
    )
    matched = per_doc.where(col).select("doc_id")
    if is_grounded(tree):
        return matched
    if universe is None:
        raise ValueError(
            "pure-negative-satisfiable boolean query needs universe= "
            f"(a frame of all live doc_ids): {query!r}"
        )
    # every zero-query-term doc matches an ungrounded expression; add them
    # with one anti-join against the docs that do carry query terms
    extra = index.filter_deleted(universe.select("doc_id")).join(
        per_doc.select("doc_id"), "doc_id", "left_anti"
    )
    return matched.unionByName(extra)
