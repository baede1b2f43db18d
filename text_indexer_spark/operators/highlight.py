"""Snippet / highlight extraction and regex grep — result-presentation
operators over matched documents.

The reference surfaces matches as bare paths (``DocumentsIndexer.kt:
67-76``); a serving search engine additionally shows WHERE the query hit.
These operators are engine extensions in the same spirit as phrase.py:
tokenizer-faithful (the SAME token stream as the index — one source of
truth, ``tokenizer.py``), expressed as pure JVM expressions so they fuse
into the document scan with zero shuffles and zero Python workers.

Scale shape: every operator here is embarrassingly parallel per row —
at 10^12 documents the plan is scan → project → filter inside one
whole-stage-codegen span; no aggregation, no exchange. Snippets for a
QUERY RESULT page should run over the top-k docs only (join the top-k
ids first — the operators take any corpus-shaped frame, so callers pass
the semi-joined slice); the gated form runs corpus-wide to prove the
full-scan path too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column

# "no match" sentinel for first-occurrence positions: far above any real
# token index, compares cleanly as int32 on both engines
NO_MATCH = 2_147_483_647


def _first_pos_1b(tokens: Column, terms: list[str]) -> Column:
    """1-based position of the EARLIEST occurrence of any query term in
    the token array, or NO_MATCH if none occurs. ``array_position`` is a
    codegen'd scan of the (short) per-doc array; ``least`` over |Q|
    columns keeps it expression-only."""
    positions = [
        F.when(F.array_position(tokens, t) == 0, F.lit(NO_MATCH)).otherwise(
            F.array_position(tokens, t).cast("int")
        )
        for t in terms
    ]
    if len(positions) == 1:
        return positions[0]
    return F.least(*positions)


def snippets(
    corpus: DataFrame,
    terms: list[str],
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs containing ANY query term → (id, first_pos, snippet).

    ``first_pos`` is the 1-based token index of the earliest hit;
    ``snippet`` is the space-joined ±window tokens around it (clamped at
    the document edges). Disjunctive membership mirrors the OR-mode
    query path; AND callers pre-filter with ``conjunctive_match``.
    """
    spark = corpus.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms:
        return spark.createDataFrame(
            [], f"{id_col} long, first_pos int, snippet string"
        )
    toks = tokenize_column(text_col)  # already empty-filtered
    fp = _first_pos_1b(toks, terms)
    start = F.greatest(F.lit(1), fp - F.lit(window))
    length = fp + F.lit(window) - start + F.lit(1)
    return (
        corpus.select(
            F.col(id_col),
            fp.alias("first_pos"),
            F.array_join(F.slice(toks, start, length), " ").alias("snippet"),
        )
        .filter(F.col("first_pos") != NO_MATCH)
    )


def regex_grep(
    corpus: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Regex content scan → (id, n_matches) for docs with ≥1 match.

    The grep-shaped access path the inverted index cannot serve (pattern
    crosses token boundaries). JVM-side ``regexp_count`` — one codegen'd
    pass over content, no Python, no shuffle; at scale this is the
    full-scan fallback tier of a search service, and the filter lands in
    the same scan stage as the projection."""
    return (
        corpus.select(
            F.col(id_col),
            F.regexp_count(F.col(text_col), F.lit(pattern)).alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


def grep_lines(
    corpus: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``grep -n``: (id, line_no, line) for every content LINE matching
    the pattern — the per-line result shape a code-search UI renders.
    One codegen'd pass: split on newline → posexplode → rlike filter in
    the same stage; no Python, no shuffle. Compose with the trigram
    index by semi-joining ``candidate_ids`` first (the explode then runs
    over candidates only)."""
    return (
        corpus.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .filter(F.col("line").rlike(pattern))
        .select(id_col, (F.col("pos") + 1).alias("line_no"), "line")
    )


def snippets_for_query(
    corpus: DataFrame,
    postings: DataFrame,
    query,
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    catalog: DataFrame | None = None,
) -> DataFrame:
    """Result-page snippets for a full DSL query: docs matching the
    WHOLE tree (phrases, prefixes, wildcards, fuzzy, NOT — evaluated by
    ``querylang.match_query``), highlighted around the earliest
    positively-used exact/phrase term → (id, first_pos, snippet).

    The match set rides back as a broadcast semi-join into the corpus
    scan, so the snippet projection touches matched rows only. Docs the
    tree admits WITHOUT any scoreable term (e.g. via a wildcard-only
    branch) have nothing to highlight and are omitted — the same
    convention as the ranked DSL path (scoreless matches drop).
    """
    from text_indexer_spark.operators.querylang import (
        match_query,
        parse_dsl,
        positive_score_terms,
    )

    node = parse_dsl(query) if isinstance(query, str) else query
    terms = positive_score_terms(node)
    spark = corpus.sparkSession
    if not terms:
        return spark.createDataFrame(
            [], f"{id_col} long, first_pos int, snippet string"
        )
    ids = match_query(
        postings, node, docs=corpus, catalog=catalog, text_col=text_col
    )
    sliced = corpus.join(F.broadcast(ids), id_col, "left_semi")
    return snippets(
        sliced, terms, window=window, text_col=text_col, id_col=id_col
    )
