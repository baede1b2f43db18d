"""Boolean query expressions: AND / OR / NOT trees over the inverted
index.

The reference engine answers only flat conjunctions — the query UI
splits on commas and intersects posting sets (``DocumentsIndexer.kt:
58-67``). Real fulltext workloads need the full boolean algebra
(``a AND (b OR c) AND NOT d``), so this module adds it as an engine
extension with the same one-scan shape as ``search.conjunctive_match``:

* parse the query into a tiny AST (recursive descent; ``AND`` binds
  tighter than ``OR``, ``NOT`` is unary, parentheses group, adjacency
  is implicit AND — the convention of Lucene/Tantivy query parsers);
* ONE postings scan with ``term IN (all leaf terms)`` — never one scan
  per leaf — aggregated to a per-doc set of matched leaves (map-side
  combined; the set is bounded by |query|, not by doc length);
* the boolean expression itself compiles to a pure JVM ``Column`` over
  ``array_contains`` — whole-stage codegen, no Python;
* NOT needs a universe: a doc matching NO leaf term still satisfies
  e.g. ``NOT rare``. The evaluator checks the expression under the
  all-false assignment. If unsatisfiable that way (every disjunct has a
  positive conjunct — the common case), docs outside the match set can
  be skipped and the plan stays proportional to the match set. Only a
  query that a leaf-less doc could satisfy pays the catalog-wide
  left-join — and that cost is inherent to its semantics, not to the
  plan (the result itself is O(corpus)).

Scale notes: the postings scan carries an IN-filter over ≤|query| terms
(storage-pruned like every other term lookup); the aggregation key is
doc_id — uniform; the expression evaluation adds no shuffle. At 100 TB
the only wide operation is the one groupBy(doc_id), the same exchange a
plain AND query pays.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_text


# ------------------------------------------------------------------ AST

@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class And:
    children: tuple["Node", ...]


@dataclass(frozen=True)
class Or:
    children: tuple["Node", ...]


Node = Term | Not | And | Or

_KEYWORDS = {"and", "or", "not"}


def _lex(query: str) -> list[str]:
    out: list[str] = []
    word = ""
    for ch in query:
        if ch in "()":
            if word:
                out.append(word)
                word = ""
            out.append(ch)
        elif ch.isspace():
            if word:
                out.append(word)
                word = ""
        else:
            word += ch
    if word:
        out.append(word)
    return out


def parse_query(query: str) -> Node:
    """Boolean query string → AST.

    Grammar (standard fulltext-parser precedence)::

        or_expr  := and_expr (OR and_expr)*
        and_expr := unary (AND? unary)*        -- adjacency = AND
        unary    := NOT unary | '(' or_expr ')' | WORD

    A WORD is run through the engine tokenizer; a word that tokenizes to
    several terms (``foo.bar``) becomes their conjunction, matching how
    the same text was indexed. A word that tokenizes to nothing is a
    parse error (there is no sensible neutral element for both AND and
    OR).
    """
    toks = _lex(query)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def is_kw(t: str | None, kw: str) -> bool:
        return t is not None and t.lower() == kw

    def parse_or() -> Node:
        parts = [parse_and()]
        while is_kw(peek(), "or"):
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and() -> Node:
        parts = [parse_unary()]
        while True:
            t = peek()
            if is_kw(t, "and"):
                take()
                parts.append(parse_unary())
            elif t is not None and t != ")" and not is_kw(t, "or"):
                parts.append(parse_unary())
            else:
                break
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_unary() -> Node:
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of query: {query!r}")
        if is_kw(t, "not"):
            take()
            return Not(parse_unary())
        if t == "(":
            take()
            inner = parse_or()
            if peek() != ")":
                raise ValueError(f"unbalanced parentheses in query: {query!r}")
            take()
            return inner
        if t == ")":
            raise ValueError(f"unexpected ')' in query: {query!r}")
        word = take()
        if word.lower() in _KEYWORDS:
            raise ValueError(f"dangling operator {word!r} in query: {query!r}")
        terms = tokenize_text(word)
        if not terms:
            raise ValueError(f"word {word!r} tokenizes to nothing")
        if len(terms) == 1:
            return Term(terms[0])
        return And(tuple(Term(t) for t in terms))

    if not toks:
        raise ValueError("empty query")
    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in query: {query!r}")
    return node


# ------------------------------------------------------------ analysis

def leaf_terms(node: Node) -> list[str]:
    """Distinct leaf terms, first-appearance order."""
    seen: dict[str, None] = {}

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            seen.setdefault(n.term, None)
        elif isinstance(n, Not):
            walk(n.child)
        else:
            for c in n.children:
                walk(c)

    walk(node)
    return list(seen)


def satisfiable_all_false(node: Node) -> bool:
    """Does the expression hold for a doc matching NO leaf term?

    True ⇒ the result includes leaf-less docs and evaluation needs the
    catalog as universe; False ⇒ the match set alone is complete.
    """
    if isinstance(node, Term):
        return False
    if isinstance(node, Not):
        return not satisfiable_all_false(node.child)
    if isinstance(node, And):
        return all(satisfiable_all_false(c) for c in node.children)
    return any(satisfiable_all_false(c) for c in node.children)


def _to_column(node: Node, terms_col: Column) -> Column:
    if isinstance(node, Term):
        return F.array_contains(terms_col, node.term)
    if isinstance(node, Not):
        return ~_to_column(node.child, terms_col)
    cols = [_to_column(c, terms_col) for c in node.children]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if isinstance(node, And) else (out | c)
    return out


# ----------------------------------------------------------- evaluation

def boolean_match(
    postings: DataFrame,
    query: str | Node,
    catalog: DataFrame | None = None,
) -> DataFrame:
    """Docs satisfying a boolean query → (doc_id).

    ``catalog`` (doc_id universe) is required only when the query can be
    satisfied by a doc containing none of its terms (e.g. a top-level
    NOT) — checked structurally, so the common positive query never
    touches the catalog.
    """
    node = parse_query(query) if isinstance(query, str) else query
    leaves = leaf_terms(node)
    spark = postings.sparkSession
    matched = (
        postings.filter(F.col("term").isin(leaves))
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("_ts"))
    )
    if not satisfiable_all_false(node):
        return matched.filter(_to_column(node, F.col("_ts"))).select("doc_id")
    if catalog is None:
        raise ValueError(
            "query can match documents containing none of its terms "
            "(e.g. a top-level NOT); pass the catalog as the universe"
        )
    universe = catalog.select("doc_id").join(matched, "doc_id", "left")
    ts = F.coalesce(F.col("_ts"), F.array().cast("array<string>"))
    return universe.filter(_to_column(node, ts)).select("doc_id")


def boolean_bm25_topk(
    postings: DataFrame,
    catalog: DataFrame,
    stats: DataFrame,
    query: str | Node,
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Boolean filter + BM25 ranking: the match set is cut by the full
    boolean expression, the score sums over the POSITIVE leaves only
    (a NOT contributes filtering, never score — the Lucene convention).
    One broadcast semi-join narrows the scorer to the boolean matches.
    """
    from text_indexer_spark.operators.search import bm25_scores

    node = parse_query(query) if isinstance(query, str) else query
    pos_terms = [t for t in leaf_terms(node) if _term_used_positively(node, t)]
    ids = boolean_match(postings, node, catalog)
    scored = bm25_scores(
        postings, catalog, stats, pos_terms, conjunctive=False
    ).join(F.broadcast(ids), "doc_id", "semi")
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _term_used_positively(node: Node, term: str, neg: bool = False) -> bool:
    if isinstance(node, Term):
        return node.term == term and not neg
    if isinstance(node, Not):
        return _term_used_positively(node.child, term, not neg)
    return any(_term_used_positively(c, term, neg) for c in node.children)


# ---------------------------------------------- committed-index serving

def boolean_match_index(posting_lists: DataFrame, query: str | Node) -> DataFrame:
    """Boolean query served from the COMPRESSED committed index →
    (doc_id).

    Shards are disjoint doc-id ranges, so the expression evaluates
    shard-locally and exactly: per shard, decode each leaf term's id
    list once, take the union as the local universe, evaluate the tree
    as vectorized boolean masks over it (searchsorted membership —
    no Python per doc), emit the ids where the mask holds.

    Restricted to queries UNSATISFIABLE under the all-false assignment
    (every disjunct carries a positive conjunct): only then is the leaf
    union a complete universe. A query a leaf-less doc could satisfy
    (top-level NOT) inherently needs the catalog — use
    ``boolean_match`` with the catalog for those.
    """
    import numpy as np
    import pandas as pd

    node = parse_query(query) if isinstance(query, str) else query
    if satisfiable_all_false(node):
        raise ValueError(
            "query can match documents containing none of its terms; "
            "serve it with boolean_match(postings, query, catalog) — "
            "the leaf union is not a complete universe for it"
        )
    leaves = leaf_terms(node)
    spark = posting_lists.sparkSession
    matched = posting_lists.filter(F.col("term").isin(leaves))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        from text_indexer_spark.operators.codec import decode_posting_list

        per_term: dict[str, np.ndarray] = {}
        for _, r in g.iterrows():
            ids, _, _ = decode_posting_list(r)
            per_term[r["term"]] = ids
        if not per_term:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        universe = np.unique(np.concatenate(list(per_term.values())))

        def mask_of(n: Node) -> np.ndarray:
            if isinstance(n, Term):
                ids = per_term.get(n.term)
                m = np.zeros(universe.size, dtype=bool)
                if ids is not None and ids.size:
                    m[np.searchsorted(universe, ids)] = True
                return m
            if isinstance(n, Not):
                return ~mask_of(n.child)
            masks = [mask_of(c) for c in n.children]
            out = masks[0]
            for m in masks[1:]:
                out = (out & m) if isinstance(n, And) else (out | m)
            return out

        return pd.DataFrame({"doc_id": universe[mask_of(node)]})

    def per_partition(batches):
        parts = [b for b in batches if not b.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        for _, g in pdf.groupby("shard_id", sort=False):
            out = kernel(g)
            if len(out):
                yield out

    return matched.mapInPandas(per_partition, "doc_id long")


# ---------------------------------------------------------- SQL oracle

def to_oracle_sql(node: Node, flags: dict[str, str]) -> str:
    """The expression over boolean flag columns (``flags``: term → SQL
    column/expression) — used to derive the DuckDB oracle from the SAME
    AST the Spark path evaluates."""
    if isinstance(node, Term):
        return flags[node.term]
    if isinstance(node, Not):
        return f"(NOT {to_oracle_sql(node.child, flags)})"
    op = " AND " if isinstance(node, And) else " OR "
    return "(" + op.join(to_oracle_sql(c, flags) for c in node.children) + ")"
