"""Fuzzy term matching — edit-distance ≤ 2 query expansion over the
vocabulary, SymSpell-style.

The reference matches tokens exactly (`Index.kt:11-13`); real search
engines also serve typo-tolerant lookups. The naive plan — score
``levenshtein(term, q)`` against every vocabulary term — is a full
vocabulary scan per query with an O(|term|·|q|) kernel per row. The
scale path used here is the *deletion neighborhood* (SymSpell): two
strings are within edit distance d **only if** their delete-≤d
neighborhoods intersect (substitution = same-position delete on both
sides, insert/delete = delete on one side; induction extends it to
d=2). The depth-1 neighborhood of a term has |term|+1 entries (depth-2
O(|term|²), guarded by a length prefilter) and is generated inside the scan projection
(codegen `transform` over `sequence` — no Python), so candidate
generation is a set-overlap test against the (tiny, literal) query
neighborhood — a pushdown-friendly filter, not a join, and never a
cartesian. Survivors are verified with the built-in ``levenshtein`` to
kill the pigeonhole false positives (e.g. "ab" vs "ba").

For multi-term queries, ``fuzzy_conjunctive_match`` generalizes the
reference's conjunctive AND (`DocumentsIndexer.kt:65`): each query
token must fuzzy-match at least one distinct term of the doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column, tokenize_text


def delete1_neighborhood(term: str) -> list[str]:
    """Driver-side delete-1 neighborhood of a query term: the term plus
    every string obtained by deleting one character. |term|+1 entries —
    tiny, rendered as a literal array into the plan."""
    return [term] + [term[:i] + term[i + 1 :] for i in range(len(term))]


def deletes_neighborhood(term: str, max_edits: int) -> list[str]:
    """Driver-side delete-≤d neighborhood (term + every string reachable
    by deleting up to ``max_edits`` characters). Sorted + deduped;
    O(|term|^d) entries — for a query term and d ≤ 2 that's tiny."""
    out = {term}
    frontier = {term}
    for _ in range(max_edits):
        frontier = {
            s[:i] + s[i + 1 :] for s in frontier for i in range(len(s))
        }
        out |= frontier
    return sorted(out)


def _deletes_column(term: Column) -> Column:
    """``term -> array<string>`` delete-1 neighborhood as a codegen
    expression (term itself + one-char deletions)."""
    return F.concat(
        F.array(term),
        F.transform(
            F.sequence(F.lit(1), F.length(term)),
            lambda i: F.concat(
                F.substring(term, F.lit(1), i - 1),
                term.substr(i + 1, F.length(term)),
            ),
        ),
    )


def _deletes_upto2_column(term: Column) -> Column:
    """``term -> array<string>`` delete-≤2 neighborhood as a codegen
    expression: deletes-of-deletes (each depth-1 entry, itself included,
    expanded once more). Duplicates are harmless for ``arrays_overlap``.
    O(|term|²) entries — generated scan-locally only for rows that pass
    the cheap length prefilter in :func:`fuzzy_candidate_cond`."""
    return F.flatten(F.transform(_deletes_column(term), _deletes_column))


def within_one_edit(a: str, b: str) -> bool:
    """Pure-Python ``levenshtein(a, b) <= 1`` in O(len) — used by the
    committed-index DSL kernel where candidates are already decoded
    shard-locally (no DP table needed for radius 1)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if la == lb:
        return a[i + 1 :] == b[i + 1 :]  # one substitution
    return a[i:] == b[i + 1 :]  # one insertion in the longer string


def within_edits(a: str, b: str, max_edits: int) -> bool:
    """Pure-Python ``levenshtein(a, b) <= max_edits`` via a banded DP
    (band width 2·d+1, early exit when the band's minimum exceeds d) —
    O(d·len), used by shard-local kernels where candidates are already
    decoded. Exact for any d; d=1 short-circuits to the O(len) scan."""
    if max_edits <= 1:
        return within_one_edit(a, b) if max_edits == 1 else a == b
    la, lb = len(a), len(b)
    if abs(la - lb) > max_edits:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        j_lo = max(1, i - max_edits)
        j_hi = min(lb, i + max_edits)
        cur = [max_edits + 1] * (lb + 1)
        cur[0] = i
        if j_lo > 1:
            cur[j_lo - 1] = max_edits + 1
        for j in range(j_lo, j_hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[j_lo : j_hi + 1]) > max_edits:
            return False
        prev = cur
    return prev[lb] <= max_edits


def fuzzy_candidate_cond(
    term: Column, query_term: str, max_edits: int = 1
) -> Column:
    """Boolean Column: ``term`` is within edit distance ``max_edits``
    (1 or 2) of ``query_term`` — cheap length prefilter, then
    deletion-neighborhood overlap (scan-local codegen candidate cut:
    the SymSpell pigeonhole — lev(a,b) ≤ d ⟹ deletes≤d(a) ∩
    deletes≤d(b) ≠ ∅), then exact ``levenshtein`` verification. Shared
    by :func:`fuzzy_terms` and the query-DSL ``term~`` / ``term~2``
    leaves. The length guard runs FIRST so the O(|term|^d) neighborhood
    array is only materialized for plausible rows."""
    if max_edits not in (1, 2):
        raise ValueError("fuzzy matching supports max_edits in (1, 2)")
    q = query_term.lower()
    qn = F.lit(deletes_neighborhood(q, max_edits)) if q else F.lit([""])
    deletes = (
        _deletes_column(term) if max_edits == 1 else _deletes_upto2_column(term)
    )
    len_ok = (
        F.abs(F.length(term) - F.lit(len(q))) <= max_edits
    )
    return (
        len_ok
        & F.arrays_overlap(deletes, qn)
        & (F.levenshtein(term, F.lit(q)) <= max_edits)
    )


def vocabulary(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(term, df)`` — distinct terms with document frequency. One
    explode + hash agg (map-side combined); this is the same vocabulary
    the index build materializes in stage B, exposed standalone."""
    toks = corpus.select(
        F.col(id_col), F.explode(tokenize_column(text_col)).alias("term")
    ).dropDuplicates([id_col, "term"])
    return toks.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def fuzzy_terms(
    vocab: DataFrame, query_term: str, max_edits: int = 1
) -> DataFrame:
    """Vocabulary terms within edit distance ``max_edits`` (1 or 2 —
    SymSpell delete-d neighborhoods) of ``query_term``: ``(term, dist)``.

    Plan: scan-local candidate filter (length guard, then
    ``arrays_overlap`` between the term's codegen'd neighborhood and
    the literal query neighborhood), then exact ``levenshtein``
    verification. Zero shuffles, zero joins; at 100 TB the vocabulary
    is bucketed by term and the overlap filter runs inside the scan.
    """
    q = query_term.lower()
    cand = vocab.filter(
        fuzzy_candidate_cond(F.col("term"), q, max_edits=max_edits)
    )
    return cand.select(
        "term",
        F.levenshtein(F.col("term"), F.lit(q)).cast("int").alias("dist"),
    )


def fuzzy_conjunctive_match(
    corpus: DataFrame,
    query: str,
    max_edits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs where EVERY query token fuzzy-matches some term of the doc
    (typo-tolerant generalization of the reference's conjunctive AND):
    ``(doc_id)``.

    Plan: one corpus scan explodes distinct (doc, term) pairs; each
    query token contributes a scan-local candidate predicate
    (neighborhood overlap + levenshtein ≤ 1, OR-ed across tokens to
    keep a single scan); matched pairs reduce to per-doc distinct
    query-token counts (the only shuffle, over the sparse hit set) and
    docs covering all |Q| tokens survive — same agg-as-intersection
    shape as ``search.conjunctive_match``.
    """
    tokens = sorted(set(tokenize_text(query)))
    if not tokens:
        return corpus.select(F.col(id_col)).limit(0)
    pairs = corpus.select(
        F.col(id_col), F.explode(tokenize_column(text_col)).alias("term")
    ).dropDuplicates([id_col, "term"])
    # one entry per query token a term matches (a term CAN satisfy
    # several query tokens — e.g. "cat" is within distance 1 of both
    # "cap" and "bat" — so emit all of them, not just the first)
    matched = F.array_compact(
        F.array(
            *[
                F.when(
                    fuzzy_candidate_cond(F.col("term"), tok, max_edits),
                    F.lit(i),
                )
                for i, tok in enumerate(tokens)
            ]
        )
    )
    hits = pairs.select(id_col, F.explode(matched).alias("qidx"))
    return (
        hits.groupBy(id_col)
        .agg(F.countDistinct("qidx").alias("_n"))
        .filter(F.col("_n") == len(tokens))
        .select(id_col)
    )
