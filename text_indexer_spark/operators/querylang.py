"""Unified query DSL: boolean algebra + quoted phrases + prefix /
wildcard leaves, one parser, one evaluator.

The reference exposes a single query surface — a text box whose input
is split into tokens and intersected (``DocumentsIndexer.kt:58-67``,
``ui/Indexer.kt``). A user switching to this engine gets the full query
language a fulltext engine is expected to have, composed as ONE
grammar (Lucene-style)::

    query  := or_expr
    or     := and (OR and)*
    and    := unary (AND? unary)*          -- adjacency = AND
    unary  := NOT unary | '(' or ')' | leaf
    leaf   := "quoted phrase"              -- consecutive tokens
            | "a b c"~N                    -- unordered NEAR/N (slop)
            | word*                        -- prefix (trailing * only)
            | wo*rd / wo?rd                -- wildcard (fnmatch-style)
            | word~ / word~1               -- fuzzy (edit distance <= 1)
            | word                         -- exact term

Leaves run through the SAME tokenizer as indexing, so ``"Hash-Table"``
matches exactly what indexing ``Hash-Table`` produced.

Two evaluators, identical semantics (differential-tested):

* :func:`match_query` — over the postings / documents DataFrames (the
  oracle-friendly relational path): ONE postings scan covers every
  exact-term leaf; each prefix/wildcard leaf is one storage-pruned
  scan; each phrase leaf delegates to ``phrase.phrase_match``. Leaf
  flags left-join onto the match universe and the tree compiles to a
  pure JVM boolean ``Column`` — whole-stage codegen, no Python.
* :func:`match_query_index` — over the COMPRESSED committed index
  (positional build required only when the query has phrase leaves):
  per shard, decode each needed list once, evaluate the tree as
  vectorized numpy masks over the shard-local leaf-union universe.
  Shards are disjoint doc-id ranges so the union of shard results is
  exact and global.

NOT needs a universe: a doc matching NO leaf still satisfies e.g.
``NOT rare``. Like ``operators/boolean.py``, the evaluator checks the
tree under the all-false assignment; only queries a leaf-less doc could
satisfy pay the catalog-wide universe (and the index path refuses them
— that result is inherently O(corpus)).

Scale notes: the index-path scan filter is ``term IN (exact ∪ phrase
terms) OR startswith/LIKE`` — parquet row groups prune on the term
column either way; per-shard work is bounded by the matched lists, and
the only wide operation in the DataFrame path is the one groupBy
(doc_id) every conjunctive query pays.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.operators.boolean import And, Node, Not, Or, Term
from text_indexer_spark.tokenizer import tokenize_text

_KEYWORDS = {"and", "or", "not"}

# trailing fuzzy operator: word~ or word~N (N one digit); the stem must
# be non-empty and contain no further '~'
_FUZZY_SUFFIX = re.compile(r"([^~\s]+)~(\d?)")


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]


@dataclass(frozen=True)
class Near:
    """``"a b c"~N``: all terms within some N-token span (unordered
    NEAR/N — the span must fit every term, max−min < N)."""

    terms: tuple[str, ...]
    window: int


@dataclass(frozen=True)
class Prefix:
    prefix: str


@dataclass(frozen=True)
class Wildcard:
    pattern: str  # fnmatch-style: * and ?


@dataclass(frozen=True)
class Fuzzy:
    """``term~`` / ``term~1`` / ``term~2``: terms within edit distance
    ``edits`` (SymSpell deletion-neighborhood candidates + levenshtein
    verify — see ``operators/fuzzy.py``). Like Prefix/Wildcard it
    filters but does not score (Lucene convention for multi-term
    expansions)."""

    term: str
    edits: int = 1


QNode = Node | Phrase | Near | Prefix | Wildcard | Fuzzy


# -------------------------------------------------------------- parser

def _lex(query: str) -> list[tuple[str, str]]:
    """→ [(kind, text)]: kind ∈ {'word', 'phrase', 'punct'}."""
    out: list[tuple[str, str]] = []
    word = ""
    i, n = 0, len(query)

    def flush() -> None:
        nonlocal word
        if word:
            out.append(("word", word))
            word = ""

    while i < n:
        ch = query[i]
        if ch == '"':
            flush()
            j = query.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote in query: {query!r}")
            out.append(("phrase", query[i + 1:j]))
            i = j + 1
        elif ch in "()":
            flush()
            out.append(("punct", ch))
            i += 1
        elif ch.isspace():
            flush()
            i += 1
        else:
            word += ch
            i += 1
    flush()
    return out


def _word_leaf(word: str) -> QNode:
    """Classify a bare word: exact term(s), prefix, wildcard, or fuzzy
    (trailing ``~`` or ``~1`` — Lucene fuzzy syntax; a ``~`` anywhere
    else stays a literal term character)."""
    m = _FUZZY_SUFFIX.fullmatch(word)
    if m is not None:
        stem, edits = m.group(1).lower(), m.group(2)
        if "*" in stem or "?" in stem:
            raise ValueError(f"fuzzy {word!r} cannot also be a wildcard")
        if tokenize_text(stem) != [stem]:
            raise ValueError(
                f"fuzzy {word!r} must be a single indexable token stem"
            )
        if edits in ("", "1"):
            return Fuzzy(stem)
        if edits == "2":
            return Fuzzy(stem, edits=2)
        if edits == "0":
            return Term(stem)
        raise ValueError(
            f"fuzzy {word!r}: only edit distance <= 2 is supported"
        )
    if "*" in word or "?" in word:
        if (
            word.endswith("*")
            and "*" not in word[:-1]
            and "?" not in word
            and word[:-1]
        ):
            stem = word[:-1].lower()
            toks = tokenize_text(stem)
            if toks != [stem]:
                raise ValueError(
                    f"prefix {word!r} must be a single indexable token stem"
                )
            return Prefix(stem)
        pat = word.lower()
        stripped = pat.replace("*", "").replace("?", "")
        if not stripped:
            raise ValueError(f"wildcard {word!r} has no literal characters")
        if tokenize_text(stripped) != [stripped]:
            # a literal delimiter character can never occur inside an
            # indexed term — the pattern would silently match nothing
            raise ValueError(
                f"wildcard {word!r} contains token-delimiter characters"
            )
        return Wildcard(pat)
    terms = tokenize_text(word)
    if not terms:
        raise ValueError(f"word {word!r} tokenizes to nothing")
    if len(terms) == 1:
        return Term(terms[0])
    # a word like foo.bar indexes as consecutive tokens — match it as
    # the phrase it became, not a bag-of-words AND
    return Phrase(tuple(terms))


def parse_dsl(query: str) -> QNode:
    """Query string → AST (grammar in the module docstring)."""
    toks = _lex(query)
    pos = 0

    def peek() -> tuple[str, str] | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> tuple[str, str]:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def is_kw(t: tuple[str, str] | None, kw: str) -> bool:
        return t is not None and t[0] == "word" and t[1].lower() == kw

    def parse_or() -> QNode:
        parts = [parse_and()]
        while is_kw(peek(), "or"):
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and() -> QNode:
        parts = [parse_unary()]
        while True:
            t = peek()
            if is_kw(t, "and"):
                take()
                parts.append(parse_unary())
            elif t is not None and t != ("punct", ")") and not is_kw(t, "or"):
                parts.append(parse_unary())
            else:
                break
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_unary() -> QNode:
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of query: {query!r}")
        if is_kw(t, "not"):
            take()
            return Not(parse_unary())
        if t == ("punct", "("):
            take()
            inner = parse_or()
            if peek() != ("punct", ")"):
                raise ValueError(f"unbalanced parentheses in query: {query!r}")
            take()
            return inner
        if t == ("punct", ")"):
            raise ValueError(f"unexpected ')' in query: {query!r}")
        kind, text = take()
        if kind == "phrase":
            terms = tokenize_text(text)
            if not terms:
                raise ValueError(f"phrase {text!r} tokenizes to nothing")
            # optional slop suffix: "a b"~N  → unordered NEAR/N
            nxt = peek()
            if (
                nxt is not None
                and nxt[0] == "word"
                and nxt[1].startswith("~")
                and nxt[1][1:].isdigit()
            ):
                take()
                window = int(nxt[1][1:])
                if window < 1:
                    raise ValueError(f"slop must be >= 1 in {text!r}~{window}")
                if len(terms) == 1:
                    return Term(terms[0])
                return Near(tuple(terms), window)
            if len(terms) == 1:
                return Term(terms[0])
            return Phrase(tuple(terms))
        if text.lower() in _KEYWORDS:
            raise ValueError(f"dangling operator {text!r} in query: {query!r}")
        return _word_leaf(text)

    if not toks:
        raise ValueError("empty query")
    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in query: {query!r}")
    return node


# ------------------------------------------------------------ analysis

def leaves_of(node: QNode) -> list[QNode]:
    """Distinct leaf nodes, first-appearance order."""
    seen: dict[QNode, None] = {}

    def walk(n: QNode) -> None:
        if isinstance(n, (Term, Phrase, Near, Prefix, Wildcard, Fuzzy)):
            seen.setdefault(n, None)
        elif isinstance(n, Not):
            walk(n.child)
        else:
            for c in n.children:
                walk(c)

    walk(node)
    return list(seen)


def satisfiable_all_false(node: QNode) -> bool:
    """Does the tree hold for a doc matching NO leaf?"""
    if isinstance(node, (Term, Phrase, Near, Prefix, Wildcard, Fuzzy)):
        return False
    if isinstance(node, Not):
        return not satisfiable_all_false(node.child)
    if isinstance(node, And):
        return all(satisfiable_all_false(c) for c in node.children)
    return any(satisfiable_all_false(c) for c in node.children)


def positive_score_terms(node: QNode) -> list[str]:
    """Exact terms usable for ranking: every term of a Term or Phrase
    leaf used in a positive (non-negated) context — the Lucene
    convention (NOT filters, never scores; prefix/wildcard expansions
    don't score without per-term expansion)."""
    out: dict[str, None] = {}

    def walk(n: QNode, neg: bool) -> None:
        if isinstance(n, Term):
            if not neg:
                out.setdefault(n.term, None)
        elif isinstance(n, (Phrase, Near)):
            if not neg:
                for t in n.terms:
                    out.setdefault(t, None)
        elif isinstance(n, Not):
            walk(n.child, not neg)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c, neg)

    walk(node, False)
    return list(out)


def wildcard_regex(pattern: str) -> str:
    """``*``/``?`` glob → anchored regex. ONE string, three identical
    renderings: Python ``re`` (shard kernel), Spark ``rlike`` (Java
    regex) and DuckDB ``regexp_matches`` (RE2) agree on this subset
    (backslash-escaped ASCII literals, ``.`` and ``.*``)."""
    import re as _re

    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(_re.escape(ch))
    return "^" + "".join(parts) + "$"


def _literal_prefix(pattern: str) -> str:
    """Longest literal prefix before the first wildcard — a pushable
    ``startswith`` range predicate for the scan (same trick as
    ``search.wildcard_match``)."""
    out = ""
    for ch in pattern:
        if ch in ("*", "?"):
            break
        out += ch
    return out


# --------------------------------------------------- DataFrame evaluator

def match_query(
    postings: DataFrame,
    query: str | QNode,
    docs: DataFrame | None = None,
    catalog: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Docs satisfying the DSL query → (doc_id), relational path.

    ``docs`` (the documents table) is required only for phrase leaves;
    ``catalog`` (doc_id universe) only when the query can be satisfied
    by a doc matching no leaf (top-level NOT).
    """
    from text_indexer_spark.operators.phrase import (
        phrase_match,
        proximity_match,
    )

    node = parse_dsl(query) if isinstance(query, str) else query
    leaves = leaves_of(node)
    exact = [n.term for n in leaves if isinstance(n, Term)]

    # one scan covers every exact-term leaf
    matched = (
        postings.filter(F.col("term").isin(exact))
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("_ts"))
        if exact
        else None
    )

    flag_frames: dict[QNode, DataFrame] = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            continue
        if isinstance(leaf, Phrase):
            if docs is None:
                raise ValueError("phrase leaves need the documents table")
            ids = phrase_match(docs, list(leaf.terms), text_col=text_col)
        elif isinstance(leaf, Near):
            if docs is None:
                raise ValueError("proximity leaves need the documents table")
            ids = proximity_match(
                docs, list(leaf.terms), window=leaf.window, text_col=text_col
            )
        elif isinstance(leaf, Prefix):
            ids = (
                postings.filter(F.col("term").startswith(leaf.prefix))
                .select("doc_id")
                .distinct()
            )
        elif isinstance(leaf, Fuzzy):
            from text_indexer_spark.operators.fuzzy import (
                fuzzy_candidate_cond,
            )

            ids = (
                postings.filter(
                    fuzzy_candidate_cond(F.col("term"), leaf.term, leaf.edits)
                )
                .select("doc_id")
                .distinct()
            )
        else:  # Wildcard
            m = postings
            lit = _literal_prefix(leaf.pattern)
            if lit:
                m = m.filter(F.col("term").startswith(lit))
            ids = (
                m.filter(F.col("term").rlike(wildcard_regex(leaf.pattern)))
                .select("doc_id")
                .distinct()
            )
        flag_frames[leaf] = ids.withColumn(f"_f{i}", F.lit(True))

    if satisfiable_all_false(node):
        if catalog is None:
            raise ValueError(
                "query can match documents containing none of its terms "
                "(e.g. a top-level NOT); pass the catalog as the universe"
            )
        base = catalog.select("doc_id")
    else:
        parts = []
        if matched is not None:
            parts.append(matched.select("doc_id"))
        parts += [f.select("doc_id") for f in flag_frames.values()]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        base = base.distinct()

    joined = base
    if matched is not None:
        joined = joined.join(matched, "doc_id", "left")
    for f in flag_frames.values():
        joined = joined.join(f, "doc_id", "left")

    ts = (
        F.coalesce(F.col("_ts"), F.array().cast("array<string>"))
        if matched is not None
        else F.array().cast("array<string>")
    )

    def col_of(n: QNode) -> Column:
        if isinstance(n, Term):
            return F.array_contains(ts, n.term)
        if isinstance(n, (Phrase, Near, Prefix, Wildcard, Fuzzy)):
            i = leaves.index(n)
            return F.coalesce(F.col(f"_f{i}"), F.lit(False))
        if isinstance(n, Not):
            return ~col_of(n.child)
        cols = [col_of(c) for c in n.children]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if isinstance(n, And) else (out | c)
        return out

    return joined.filter(col_of(node)).select("doc_id")


# ------------------------------------------------ committed-index path

def _prepare_index_query(posting_lists: DataFrame, node: QNode):
    """Shared front end of the index-serving paths: validates the tree,
    derives the single pushdown-friendly scan filter covering every
    leaf, and returns (leaves, scan-filtered lists, phrase-term set)."""
    if satisfiable_all_false(node):
        raise ValueError(
            "query can match documents containing none of its terms; "
            "serve it with match_query(postings, query, catalog=...) — "
            "the leaf union is not a complete universe for it"
        )
    leaves = leaves_of(node)
    phrases = [n for n in leaves if isinstance(n, (Phrase, Near))]
    if phrases and "positions_varbyte" not in posting_lists.columns:
        raise ValueError(
            "phrase/proximity leaves need a positional index; rebuild "
            "with build_index(..., with_positions=True)"
        )
    exact = sorted(
        {n.term for n in leaves if isinstance(n, Term)}
        | {t for p in phrases for t in p.terms}
    )
    conds = []
    if exact:
        conds.append(F.col("term").isin(exact))
    for n in leaves:
        if isinstance(n, Prefix):
            conds.append(F.col("term").startswith(n.prefix))
        elif isinstance(n, Wildcard):
            lit = _literal_prefix(n.pattern)
            c = F.col("term").rlike(wildcard_regex(n.pattern))
            conds.append(
                (F.col("term").startswith(lit) & c) if lit else c
            )
        elif isinstance(n, Fuzzy):
            from text_indexer_spark.operators.fuzzy import (
                fuzzy_candidate_cond,
            )

            conds.append(
                fuzzy_candidate_cond(F.col("term"), n.term, n.edits)
            )
    scan_cond = conds[0]
    for c in conds[1:]:
        scan_cond = scan_cond | c
    need_pos = {t for p in phrases for t in p.terms}
    # column pruning at the scan: a phrase-free query must not read the
    # positional payload (the fattest column of a positional index)
    cols = [
        "shard_id", "term", "df", "doc_ids_delta_varbyte", "tfs_varbyte",
        "weights_f64",
    ]
    if need_pos:
        cols.append("positions_varbyte")
    cols.append("block_id_off")
    return leaves, posting_lists.filter(scan_cond).select(cols), need_pos


def _index_kernel(node: QNode, leaves, need_pos, score_terms, k, round_to):
    """Per-shard evaluator: decode each needed list once, boolean masks
    over the shard-local leaf-union universe; with ``score_terms`` also
    sum the STORED per-posting BM25 weights over the match set and emit
    a tie-inclusive local top-k (global cut = orderBy().limit(k))."""
    import re

    import numpy as np
    import pandas as pd

    empty_cols = (
        {"doc_id": pd.Series(dtype="int64")}
        if score_terms is None
        else {"doc_id": pd.Series(dtype="int64"),
              "score": pd.Series(dtype="float64")}
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        from text_indexer_spark.operators.codec import (
            decode_positions,
            decode_posting_list,
        )
        from text_indexer_spark.operators.phrase import (
            phrase_ids_from_decoded,
            proximity_ids_from_decoded,
        )

        ids_by_term: dict[str, np.ndarray] = {}
        w_by_term: dict[str, np.ndarray] = {}
        pos_by_term: dict[str, tuple] = {}
        for _, r in g.iterrows():
            ids, tfs, w = decode_posting_list(r)
            ids_by_term[r["term"]] = ids
            w_by_term[r["term"]] = w
            if r["term"] in need_pos:
                pos, offs = decode_positions(r["positions_varbyte"], tfs)
                pos_by_term[r["term"]] = (ids, tfs, pos, offs)

        def leaf_ids(n: QNode) -> np.ndarray:
            if isinstance(n, Term):
                return ids_by_term.get(n.term, np.empty(0, dtype=np.int64))
            if isinstance(n, Phrase):
                return phrase_ids_from_decoded(pos_by_term, list(n.terms))
            if isinstance(n, Near):
                return proximity_ids_from_decoded(
                    pos_by_term, list(n.terms), n.window
                )
            if isinstance(n, Prefix):
                parts = [
                    v for t, v in ids_by_term.items()
                    if t.startswith(n.prefix)
                ]
            elif isinstance(n, Fuzzy):
                from text_indexer_spark.operators.fuzzy import within_edits

                parts = [
                    v for t, v in ids_by_term.items()
                    if within_edits(t, n.term, n.edits)
                ]
            else:  # Wildcard
                rx = re.compile(wildcard_regex(n.pattern))
                parts = [
                    v for t, v in ids_by_term.items() if rx.match(t)
                ]
            if not parts:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate(parts))

        sets = {n: leaf_ids(n) for n in leaves}
        nonempty = [v for v in sets.values() if v.size]
        if not nonempty:
            return pd.DataFrame(empty_cols)
        universe = np.unique(np.concatenate(nonempty))

        def mask_of(n: QNode) -> np.ndarray:
            if isinstance(n, (Term, Phrase, Near, Prefix, Wildcard, Fuzzy)):
                m = np.zeros(universe.size, dtype=bool)
                ids = sets[n]
                if ids.size:
                    m[np.searchsorted(universe, ids)] = True
                return m
            if isinstance(n, Not):
                return ~mask_of(n.child)
            masks = [mask_of(c) for c in n.children]
            out = masks[0]
            for m in masks[1:]:
                out = (out & m) if isinstance(n, And) else (out | m)
            return out

        matched = universe[mask_of(node)]
        if score_terms is None:
            return pd.DataFrame({"doc_id": matched.astype("int64")})
        if matched.size == 0:
            return pd.DataFrame(empty_cols)
        from text_indexer_spark.operators.wand import _local_topk

        scores = np.zeros(matched.size, dtype=np.float64)
        hit = np.zeros(matched.size, dtype=bool)
        for t in score_terms:
            ids = ids_by_term.get(t)
            if ids is None or ids.size == 0:
                continue
            pos_in = np.searchsorted(matched, ids)
            clip = np.minimum(pos_in, matched.size - 1)
            valid = matched[clip] == ids
            np.add.at(scores, pos_in[valid], w_by_term[t][valid])
            hit[pos_in[valid]] = True
        # a doc matched only by non-scoring leaves has no BM25 score —
        # the relational path (and the oracle) exclude it the same way
        if not hit.all():
            matched, scores = matched[hit], scores[hit]
        if matched.size == 0:
            return pd.DataFrame(empty_cols)
        return _local_topk(matched.astype("int64"), scores, k, round_to)

    return kernel


def match_query_index(posting_lists: DataFrame, query: str | QNode) -> DataFrame:
    """The same DSL served from the COMPRESSED committed index →
    (doc_id). Phrase leaves require a positional build
    (``build_index(..., with_positions=True)``)."""
    import pandas as pd

    node = parse_dsl(query) if isinstance(query, str) else query
    leaves, matched, need_pos = _prepare_index_query(posting_lists, node)
    kernel = _index_kernel(node, leaves, need_pos, None, None, None)

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


def dsl_bm25_topk_index(
    posting_lists: DataFrame,
    query: str | QNode,
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Ranked DSL search ENTIRELY from the committed index: the tree
    filters, the positively-used exact terms score by summing the
    STORED per-posting BM25 weights (exact — the build wrote the full
    BM25 value per posting), tie-inclusive per-shard top-k, global
    ``orderBy().limit(k)`` = TakeOrderedAndProject. One scan, zero
    shuffles before the final top-k — the same serving shape as WAND."""
    import pandas as pd

    node = parse_dsl(query) if isinstance(query, str) else query
    score_terms = positive_score_terms(node)
    if not score_terms:
        raise ValueError("query has no positively-used exact terms to rank by")
    leaves, matched, need_pos = _prepare_index_query(posting_lists, node)
    kernel = _index_kernel(node, leaves, need_pos, score_terms, k, round_to)

    def per_partition(batches):
        parts = [b for b in batches if not b.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        for _, g in pdf.groupby("shard_id", sort=False):
            out = kernel(g)
            if len(out):
                yield out

    ranked = matched.mapInPandas(per_partition, "doc_id long, score double")
    return ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ------------------------------------------------------------- ranking

def dsl_bm25_topk(
    postings: DataFrame,
    catalog: DataFrame,
    stats: DataFrame,
    query: str | QNode,
    docs: DataFrame | None = None,
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """DSL filter + BM25 ranking: the full tree cuts the candidate set;
    the score sums over the positively-used exact terms (phrase terms
    included — a phrase both filters AND scores its words, the standard
    engine behaviour; NOT and wildcard legs filter only)."""
    from text_indexer_spark.operators.search import bm25_scores

    node = parse_dsl(query) if isinstance(query, str) else query
    score_terms = positive_score_terms(node)
    if not score_terms:
        raise ValueError("query has no positively-used exact terms to rank by")
    ids = match_query(postings, node, docs=docs)
    scored = bm25_scores(
        postings, catalog, stats, score_terms, conjunctive=False
    ).join(F.broadcast(ids), "doc_id", "semi")
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ---------------------------------------------------------- SQL oracle

def to_oracle_sql(node: QNode, flags: dict[QNode, str]) -> str:
    """Tree → SQL over per-leaf boolean expressions."""
    if isinstance(node, (Term, Phrase, Near, Prefix, Wildcard, Fuzzy)):
        return flags[node]
    if isinstance(node, Not):
        return f"(NOT {to_oracle_sql(node.child, flags)})"
    op = " AND " if isinstance(node, And) else " OR "
    return "(" + op.join(to_oracle_sql(c, flags) for c in node.children) + ")"
