"""Query operators: conjunctive AND search + BM25 top-k.

Reference semantics (``DocumentsIndexer.kt:46-76``): tokenize the query,
look up each term's doc-id set in parallel, intersect, map ids to paths,
sort by path. Spark-first translation:

* per-token posting lookup (``Index.kt:11-13``) → one postings scan with
  ``term IN (...)`` — a pushed-down predicate over the term-bucketed
  store, NOT q separate lookups;
* the set-intersection reduce (``DocumentsIndexer.kt:65``) → the classic
  semi-join-as-aggregation: group matched postings by doc_id and keep
  docs whose distinct-term count equals |Q|;
* id→path map (``IndexedDocuments.kt:68-70``) → broadcast join against
  the catalog (match counts are ≪ corpus size);
* empty query → empty result without any scan
  (``DocumentsIndexer.kt:49-51``).

BM25 top-k (north-rule addition) scores the AND-candidates with pure JVM
expressions; ties break by doc_id ascending for rank determinism. The
block-max WAND path over compressed lists lives in ``wand.py`` and is
differential-tested rank-identical to this scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.functions.bm25 import bm25_weight
from text_indexer_spark.tokenizer import tokenize_text


def query_terms(query: str) -> list[str]:
    """Driver-side query tokenization; distinct terms, order-preserving."""
    seen: dict[str, None] = {}
    for t in tokenize_text(query):
        seen.setdefault(t, None)
    return list(seen)


def conjunctive_match(postings: DataFrame, terms: list[str]) -> DataFrame:
    """doc_ids containing ALL query terms → (doc_id).

    One scan, one aggregation; the IN-filter prunes term buckets at the
    storage layer. Empty query short-circuits to an empty frame.
    """
    spark = postings.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    matched = postings.filter(F.col("term").isin(terms))
    return (
        matched.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id")
    )


def prefix_match(postings: DataFrame, prefix: str) -> DataFrame:
    """Wildcard query ``pre*`` → (doc_id, n_terms, total_tf) over every
    vocabulary term starting with ``prefix``.

    ``startswith`` compiles to a StartsWith predicate that PUSHES DOWN
    to the parquet scan as a string-range filter — on the term-major
    merged layout (rows sorted by term) row-group min/max stats prune
    everything outside the prefix range, so the scan cost is the prefix
    bucket, not the vocabulary."""
    spark = postings.sparkSession
    if not prefix:
        return spark.createDataFrame([], "doc_id long, n_terms long, total_tf long")
    matched = postings.filter(F.col("term").startswith(prefix))
    return matched.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_terms"),
        F.sum("tf").cast("long").alias("total_tf"),
    )


def wildcard_match(postings: DataFrame, pattern: str) -> DataFrame:
    """SQL-LIKE wildcard query (``st%m``) → (doc_id, n_terms, total_tf).

    The literal prefix before the first ``%``/``_`` is extracted and
    applied as a separate ``startswith`` filter so the storage layer
    still gets a pushable range predicate; the full LIKE runs as a
    codegen'd residual on the pruned rows. A leading-wildcard pattern
    degrades to a vocabulary scan — the documented trade-off (serving
    systems add a reversed-term dictionary for that; out of scope)."""
    spark = postings.sparkSession
    if not pattern:
        return spark.createDataFrame([], "doc_id long, n_terms long, total_tf long")
    lit_prefix = ""
    for ch in pattern:
        if ch in ("%", "_"):
            break
        lit_prefix += ch
    matched = postings
    if lit_prefix:
        matched = matched.filter(F.col("term").startswith(lit_prefix))
    matched = matched.filter(F.col("term").like(pattern))
    return matched.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_terms"),
        F.sum("tf").cast("long").alias("total_tf"),
    )


def search_paths(postings: DataFrame, catalog: DataFrame, terms: list[str]) -> DataFrame:
    """Reference search result: matching docs as (doc_id, repo, path),
    sorted by path (``DocumentsIndexer.kt:67``). The id→path join is
    broadcast from the match side — match sets are tiny vs the catalog."""
    ids = conjunctive_match(postings, terms)
    return (
        catalog.join(F.broadcast(ids), "doc_id", "inner")
        .select("doc_id", "repo", "path")
        .orderBy("repo", "path")
    )


def bm25_scores(
    postings: DataFrame,
    catalog: DataFrame,
    stats: DataFrame,
    terms: list[str],
    conjunctive: bool = True,
) -> DataFrame:
    """Per-doc BM25 score over the query terms → (doc_id, score).

    ``stats`` = ``term_stats(postings)`` (term, df, cf). Collection-level
    constants (N, avgdl) come from a single-row aggregate crossJoin —
    Catalyst broadcasts it. Term df joins are broadcast too (|Q| rows).
    """
    spark = postings.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    matched = postings.filter(F.col("term").isin(terms))
    tstats = stats.filter(F.col("term").isin(terms)).select("term", "df")
    consts = catalog.agg(
        F.count("*").cast("long").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    scored = (
        matched.join(F.broadcast(tstats), "term")
        .join(catalog.select("doc_id", "doc_len"), "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "w",
            bm25_weight(
                F.col("tf"), F.col("df"), F.col("doc_len"), F.col("n_docs"), F.col("avgdl")
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("w").alias("score"), F.countDistinct("term").alias("nt")
    )
    if conjunctive:
        agg = agg.filter(F.col("nt") == len(terms))
    return agg.select("doc_id", "score")


def bm25_topk(
    postings: DataFrame,
    catalog: DataFrame,
    stats: DataFrame,
    terms: list[str],
    k: int = 10,
    conjunctive: bool = True,
    round_to: int | None = 4,
) -> DataFrame:
    """Top-k by (score desc, doc_id asc) — deterministic tie-break.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: per-partition
    top-k heaps reduced on the driver — no global sort shuffle.
    ``round_to`` stabilizes float comparison for cross-engine checks.
    """
    scores = bm25_scores(postings, catalog, stats, terms, conjunctive)
    if round_to is not None:
        scores = scores.withColumn("score", F.round(F.col("score"), round_to))
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
