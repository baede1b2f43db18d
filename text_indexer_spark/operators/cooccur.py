"""Term co-occurrence statistics (PMI) over the corpus.

Corpus-analytics companion to the index: which term pairs co-occur in
documents more than chance predicts. Classic uses: phrase candidate
mining, stopword diagnosis, embedding evaluation sets.

Scale shape: the pair explosion is per-document — a doc with L distinct
terms emits L·(L-1)/2 pair rows, so the operator takes a vocabulary
filter (``min_term_df``/``max_term_df``): at 100 TB you mine
co-occurrence for the mid-frequency vocabulary (stop-words are capped
away exactly like hot shingles in the Jaccard path, and hapaxes carry
no statistics). After the filter it is two hash aggregations and one
self-join keyed by doc — no skew beyond document length, which the df
cap bounds.

PMI = log( P(a,b) / (P(a)·P(b)) ) with document-level probabilities
(P = df/N). Computed in log space as
``log(N) + log(c_ab) − log(c_a) − log(c_b)`` and rounded for
cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column


def term_cooccurrence(
    df: DataFrame,
    min_pair_df: int = 2,
    min_term_df: int = 1,
    max_term_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """(term_a, term_b, pair_df, pmi) for term_a < term_b.

    ``pair_df`` = number of docs containing BOTH terms; pairs below
    ``min_pair_df`` are dropped (singleton pairs are noise and dominate
    the output volume). ``min_term_df``/``max_term_df`` bound the
    vocabulary before the per-doc pair join."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokenize_column(F.coalesce(F.col(text_col), F.lit("")))).alias("term"),
    ).distinct()
    n_docs = df.select(id_col).distinct().count()
    tdf = toks.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    vocab = tdf.filter(F.col("df") >= min_term_df)
    if max_term_df is not None:
        vocab = vocab.filter(F.col("df") <= max_term_df)
    kept = toks.join(F.broadcast(vocab.select("term")), "term", "left_semi")
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count("*").cast("long").alias("pair_df"))
        .filter(F.col("pair_df") >= min_pair_df)
    )
    da = tdf.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = tdf.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .select(
            "term_a",
            "term_b",
            "pair_df",
            F.round(
                F.log(F.lit(float(n_docs)))
                + F.log(F.col("pair_df").cast("double"))
                - F.log(F.col("df_a").cast("double"))
                - F.log(F.col("df_b").cast("double")),
                round_to,
            ).alias("pmi"),
        )
    )


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Word n-gram corpus counts → (ngram, count): the LM-training-data
    staple (count tables feed Kneser-Ney / filtering heuristics).

    Adjacent-token windows over the tokenizer's output — contiguous, so
    unlike ``term_cooccurrence`` there is no per-doc pair blow-up: a doc
    of L tokens emits exactly L−n+1 rows. The window expansion is a pure
    codegen expression (``transform`` over an index ``sequence`` —
    Catalyst evaluates it inside the scan projection, no Python), and
    the count is one hash aggregation with map-side combine, so the
    shuffle carries |distinct n-grams| per partition, not |tokens|.
    ``min_count`` drops the hapax tail that dominates row count (the
    standard LM-count cut, applied AFTER the full aggregation so counts
    stay exact).
    """
    from text_indexer_spark.tokenizer import word_ngrams_column

    grams = word_ngrams_column(F.coalesce(F.col(text_col), F.lit("")), n)
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )


def expansion_terms(
    cooc: DataFrame, term: str, k: int = 5
) -> DataFrame:
    """Query-expansion candidates for one term from the PMI table →
    (term, pmi, pair_df): the k strongest co-occurring neighbors, by
    (pmi desc, pair_df desc, term asc) — deterministic under ties.

    Vocabulary-free "related terms" (synonym-ish under distributional
    similarity). Input is :func:`term_cooccurrence` output — tiny
    relative to the corpus, so this is a pruned scan of the pair table
    + TakeOrderedAndProject; at scale the PMI table is precomputed and
    this runs at serving time per query term.
    """
    t = term.lower()
    sym = cooc.filter(
        (F.col("term_a") == t) | (F.col("term_b") == t)
    ).select(
        F.when(F.col("term_a") == t, F.col("term_b"))
        .otherwise(F.col("term_a"))
        .alias("term"),
        "pmi",
        "pair_df",
    )
    return sym.orderBy(
        F.desc("pmi"), F.desc("pair_df"), F.asc("term")
    ).limit(k)


def search_expanded(
    postings: DataFrame,
    cooc: DataFrame,
    term: str,
    k_expand: int = 3,
) -> DataFrame:
    """Disjunctive search over a term plus its PMI expansion set →
    (doc_id, n_terms): docs containing the seed or any expansion term,
    with how many of the expanded vocabulary they match (a recall
    booster for sparse queries — the expansion terms come from corpus
    statistics, no embedding model needed).

    The expansion set is k+1 strings collected to the driver (k-row
    result of a pruned scan — the same driver-side footprint as query
    tokenization), then one term-IN postings scan + per-doc count.
    """
    t = term.lower()
    exp = [r["term"] for r in expansion_terms(cooc, t, k_expand).collect()]
    terms = [t] + exp
    return (
        postings.filter(F.col("term").isin(terms))
        .select("doc_id", "term")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_terms"))
    )
