"""Fuzzy term matching — edit-distance-1 query expansion over the
vocabulary, SymSpell-style.

The reference matches tokens exactly (`Index.kt:11-13`); real search
engines also serve typo-tolerant lookups. The naive plan — score
``levenshtein(term, q)`` against every vocabulary term — is a full
vocabulary scan per query with an O(|term|·|q|) kernel per row. The
scale path used here is the *deletion neighborhood* (SymSpell): for
edit distance ≤ 1, two strings are within distance 1 **only if** their
delete-1 neighborhoods intersect (substitution = same-position delete
on both sides, insert/delete = delete on one side). The neighborhood of
a term has |term|+1 entries and is generated inside the scan projection
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


def fuzzy_candidate_cond(term: Column, query_term: str) -> Column:
    """Boolean Column: ``term`` is within edit distance 1 of
    ``query_term`` — deletion-neighborhood overlap (scan-local codegen
    candidate cut) AND exact ``levenshtein`` verification. Shared by
    :func:`fuzzy_terms` and the query-DSL ``term~`` leaf."""
    q = query_term.lower()
    qn = F.lit(delete1_neighborhood(q)) if q else F.lit([""])
    return F.arrays_overlap(_deletes_column(term), qn) & (
        F.levenshtein(term, F.lit(q)) <= 1
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
    """Vocabulary terms within edit distance ``max_edits`` (only 1 is
    supported — the deletion-neighborhood pigeonhole is depth-1) of
    ``query_term``: ``(term, dist)``.

    Plan: scan-local candidate filter (``arrays_overlap`` between the
    term's codegen'd neighborhood and the literal query neighborhood),
    then exact ``levenshtein`` verification. Zero shuffles, zero joins;
    at 100 TB the vocabulary is bucketed by term and the overlap filter
    runs inside the scan.
    """
    if max_edits != 1:
        raise ValueError(
            "deletion-neighborhood expansion supports max_edits=1; "
            "chain expansions for larger radii"
        )
    q = query_term.lower()
    qn = F.lit(delete1_neighborhood(q)) if q else F.lit([""])
    cand = vocab.filter(
        F.arrays_overlap(_deletes_column(F.col("term")), qn)
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("dist") <= max_edits)
        .select("term", F.col("dist").cast("int").alias("dist"))
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
    deletes = _deletes_column(F.col("term"))
    # one entry per query token a term matches (a term CAN satisfy
    # several query tokens — e.g. "cat" is within distance 1 of both
    # "cap" and "bat" — so emit all of them, not just the first)
    matched = F.array_compact(
        F.array(
            *[
                F.when(
                    F.arrays_overlap(deletes, F.lit(delete1_neighborhood(tok)))
                    & (F.levenshtein(F.col("term"), F.lit(tok)) <= max_edits),
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
