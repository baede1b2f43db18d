"""Corpus-wide line-level deduplication — remove boilerplate lines that
repeat across documents.

The standard web-corpus hygiene step (C4 drops any line seen ≥3 times in
the corpus; CCNet dedups paragraphs by hash across shards): navigation
chrome, cookie banners, licence headers and timestamps repeat across
millions of pages, and within-document repetition stats
(``textstats.repetition_stats``) cannot see them.  No reference analogue
— the reference indexes a static corpus (``DocumentsIndexer.kt``) — but
this is a first-class operator of a 100 TB training-data pipeline built
on this engine.

Semantics (deterministic at any parallelism): a line is *shared* when it
occurs in at least ``min_docs`` DISTINCT documents; shared lines are
removed from EVERY document (the C4 rule — "keep the first occurrence"
is scan-order-dependent and has no stable meaning on a distributed
corpus).  Documents are reassembled in original line order; documents
left without a single surviving non-blank line are dropped.  Blank lines
never count as shared (they are structure, not content) and survive
exactly when their document does.

Scale shape (the part that matters at 100 TB):

* THREE line-grain shuffles and nothing doc-grain ever moves twice: the
  count aggregation is two-phase (map-side partial ``count distinct``
  approximated by a per-partition ``(line, doc_id)`` dedup before the
  exchange), the removal is a ``left_anti`` join on the line key, and
  the reassembly groups by ``doc_id``.  Line-grain is the inherent
  price: the operator's unit of identity IS the line.
* The shared-line set is the heavy-hitter tail of the distribution —
  small relative to the corpus (boilerplate is few distinct strings
  repeated often), but the anti-join deliberately does NOT assume it is
  broadcastable: at 100 TB the distinct shared-line set of the web is
  tens of GB.  AQE's skew-join handling splits the hot lines (the very
  lines this operator exists to kill) across tasks.
* Reassembly sorts each document's surviving lines by line number
  INSIDE the row (``sort_array`` over ``struct(line_no, line)`` after
  ``collect_list``) — order restored without a sort exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lines(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, line_no, line)`` — 1-based line numbers, raw line text
    (no trimming: line identity is exact, matching C4's rule applied to
    already-normalized text)."""
    return corpus.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("_ln0", "line"),
    ).select(
        id_col, (F.col("_ln0") + 1).alias("line_no"), "line"
    )


def _is_content(line: Column) -> Column:
    return F.trim(line) != ""


def line_counts(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(line, n_docs)`` for every non-blank line: the number of
    DISTINCT documents containing it.  The per-(line, doc) dedup before
    the count keeps the exchange at one row per (line, document) —
    within-doc repeats never shuffle twice.  Counts over disjoint
    document sets are ADDITIVE (sum-mergeable) — the property the
    streaming maintenance (``streaming/linecount_stream.py``) builds
    on."""
    return (
        _lines(corpus, id_col, text_col)
        .filter(_is_content(F.col("line")))
        .select("line", id_col)
        .dropDuplicates(["line", id_col])
        .groupBy("line")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def shared_lines(
    corpus: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(line, n_docs)`` for every non-blank line occurring in at least
    ``min_docs`` distinct documents."""
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    return line_counts(corpus, id_col, text_col).filter(
        F.col("n_docs") >= min_docs
    )


def line_dedup_stats(
    corpus: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: ``(doc_id, n_lines, n_shared_lines,
    shared_line_frac)`` over non-blank lines — the audit view (how much
    of each doc is corpus-wide boilerplate) that precedes the
    destructive pass, exactly like ``quality_scores`` precedes
    ``filter_by_quality``."""
    shared = shared_lines(corpus, min_docs, id_col, text_col).select(
        "line", F.lit(1).alias("_shared")
    )
    lines = _lines(corpus, id_col, text_col).filter(
        _is_content(F.col("line"))
    )
    flagged = lines.join(shared, "line", "left")
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.coalesce(F.col("_shared"), F.lit(0)))
        .cast("long")
        .alias("n_shared_lines"),
        F.round(
            F.sum(F.coalesce(F.col("_shared"), F.lit(0)))
            / F.count("*"),
            4,
        ).alias("shared_line_frac"),
    )


def dedup_lines(
    corpus: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The cleaned corpus: every shared line removed from every
    document, text reassembled in original line order (blank lines
    kept), documents with no surviving non-blank line dropped.  Output
    columns: ``(doc_id, text)``."""
    shared = shared_lines(corpus, min_docs, id_col, text_col)
    return dedup_lines_against(corpus, shared, id_col, text_col)


def dedup_lines_against(
    corpus: DataFrame,
    shared: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``dedup_lines`` with an EXTERNALLY-supplied shared-line relation
    (any frame with a ``line`` column) — the serving form for a
    line-count table maintained incrementally by the streaming tier, or
    one computed on a larger corpus than the one being cleaned."""
    shared = shared.select("line")
    lines = _lines(corpus, id_col, text_col)
    # blank lines bypass the anti-join (they are never shared); content
    # lines survive iff absent from the shared set
    content = lines.filter(_is_content(F.col("line")))
    blanks = lines.filter(~_is_content(F.col("line")))
    survivors = content.join(shared, "line", "left_anti").unionByName(blanks)
    rebuilt = survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("line_no", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(text_col),
        F.max(F.when(_is_content(F.col("line")), 1).otherwise(0)).alias(
            "_has_content"
        ),
    )
    return rebuilt.filter(F.col("_has_content") == 1).select(id_col, text_col)
