"""Serving-tier query features over the postings/catalog relations:
scoped search, facet counts, minimum-should-match ranking, more-like-this,
and term autocomplete.

These are engine extensions beyond the reference's boolean AND search
(``DocumentsIndexer.kt:46-76``): the reference returns every match of
every query; a serving tier over a 10^12-doc corpus additionally needs
to *narrow* (scope filters), *summarize* (facets), *relax* (msm), and
*expand* (more-like-this, suggest) queries. Each operator is a pure
DataFrame program — Catalyst keeps the scans pruned and the small sides
broadcast; nothing here collects per-posting data to the driver.

Scale notes per operator are in the docstrings; the common theme is that
match sets are tiny relative to the corpus (broadcast them), while
postings/catalog scans stay predicate-pruned (term IN-lists, source
equality — both reach the parquet reader as pushed filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.functions.bm25 import bm25_weight
from text_indexer_spark.operators.search import conjunctive_match


def scoped_conjunctive(
    postings: DataFrame,
    catalog: DataFrame,
    terms: list[str],
    source: str | None = None,
    path_prefix: str | None = None,
) -> DataFrame:
    """Conjunctive AND search restricted to a catalog scope
    ("search within this dir/repo") → (doc_id).

    The reference scopes only by what was indexed; real serving scopes
    per query. The scope predicate (source equality / path prefix) is
    applied to the CATALOG scan — an equality on the partition-ish
    column prunes at the storage layer — and the surviving doc_ids
    semi-join the term-pruned postings. Both inputs arrive pruned: the
    postings scan reads |Q| term buckets, the catalog scan reads one
    scope. The semi-join's build side is the scoped catalog ids; for a
    narrow scope Catalyst broadcasts it (AQE converts at runtime when
    the scope is small), otherwise it shuffles on doc_id — the same key
    the group-by needs, so the exchange is reused.
    """
    spark = postings.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    scope = catalog
    if source is not None:
        scope = scope.filter(F.col("source") == source)
    if path_prefix is not None:
        scope = scope.filter(F.col("path").startswith(path_prefix))
    matched = postings.filter(F.col("term").isin(terms)).join(
        scope.select("doc_id"), "doc_id", "left_semi"
    )
    return (
        matched.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id")
    )


def facet_counts(
    postings: DataFrame,
    catalog: DataFrame,
    terms: list[str],
    facets: list[str],
) -> DataFrame:
    """Facet aggregation over the conjunctive match set →
    (facet columns..., n_docs).

    The match set is ≪ corpus, so it is broadcast INTO the catalog scan
    (the join's stream side); the facet group-by then aggregates only
    matching rows — map-side partial aggregation makes the shuffle
    |facet values|, not |matches|. At 100 TB this is one pruned postings
    scan + one catalog scan with a broadcast semi-join: no corpus-sized
    shuffle anywhere.
    """
    ids = conjunctive_match(postings, terms)
    return (
        catalog.join(F.broadcast(ids), "doc_id", "left_semi")
        .groupBy(*facets)
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def bm25_topk_msm(
    postings: DataFrame,
    catalog: DataFrame,
    stats: DataFrame,
    terms: list[str],
    min_match: int,
    k: int = 10,
    round_to: int | None = 4,
) -> DataFrame:
    """Minimum-should-match BM25 top-k: docs matching at least
    ``min_match`` of the query terms, ranked by the BM25 sum of the
    terms they DO match → (doc_id, score, nt).

    Between the reference's hard AND (all terms) and a bare OR (any
    term): msm=|Q| degenerates to the conjunctive scorer, msm=1 to
    disjunctive. Same physical shape as ``search.bm25_scores`` — pruned
    postings scan, broadcast |Q|-row df join, broadcast single-row
    consts, one doc_id aggregation, TakeOrderedAndProject for the cut —
    the msm predicate is a HAVING on the already-computed distinct-term
    count, free at any scale.
    """
    spark = postings.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms or min_match < 1:
        return spark.createDataFrame([], "doc_id long, score double, nt long")
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
                F.col("tf"), F.col("df"), F.col("doc_len"),
                F.col("n_docs"), F.col("avgdl"),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("w").alias("score"),
            F.countDistinct("term").cast("long").alias("nt"),
        )
        .filter(F.col("nt") >= min_match)
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), round_to))
    return scored.select("doc_id", "score", "nt").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)


def seed_terms_tfidf(
    postings: DataFrame,
    stats: DataFrame,
    n_docs_df: DataFrame,
    seed_doc_id: int,
    m: int,
    round_to: int = 6,
) -> DataFrame:
    """The ``m`` highest-tf·idf terms of one document → (term).

    Deterministic under ties: order by (rounded tf·idf desc, term asc).
    The seed row lookup is a pushed doc_id equality (one shard touched
    on the doc-range layout); df lookups join the per-term stats. The
    result is m rows — the driver never sees per-posting data.
    """
    seed = postings.filter(F.col("doc_id") == seed_doc_id)
    with_df = seed.join(stats.select("term", "df"), "term").crossJoin(
        F.broadcast(n_docs_df)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = with_df.withColumn(
        "tfidf", F.round(F.col("tf").cast("double") * idf, round_to)
    )
    return (
        scored.orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(m)
        .select("term")
    )


def more_like_this(
    postings: DataFrame,
    catalog: DataFrame,
    stats: DataFrame,
    seed_doc_id: int,
    m: int = 5,
    k: int = 10,
    round_to: int | None = 4,
) -> DataFrame:
    """Similar-document search: BM25 top-k over the seed document's m
    strongest tf·idf terms, seed excluded → (doc_id, score, nt).

    Classic "more like this". The expanded query is disjunctive with
    msm=1 (a similar doc rarely contains every salient term). Physical
    shape: the m seed terms are a tiny frame semi-joined into the
    postings scan (broadcast), everything downstream is the msm scorer.
    The whole pipeline is two pruned scans + broadcasts — the seed's
    term selection never leaves the cluster.
    """
    spark = postings.sparkSession
    n_docs_df = catalog.agg(F.count("*").cast("long").alias("n_docs"))
    seed_terms = seed_terms_tfidf(postings, stats, n_docs_df, seed_doc_id, m)
    matched = postings.join(F.broadcast(seed_terms), "term", "left_semi").filter(
        F.col("doc_id") != seed_doc_id
    )
    tstats = stats.join(F.broadcast(seed_terms), "term", "left_semi").select(
        "term", "df"
    )
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
                F.col("tf"), F.col("df"), F.col("doc_len"),
                F.col("n_docs"), F.col("avgdl"),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("w").alias("score"),
            F.countDistinct("term").cast("long").alias("nt"),
        )
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), round_to))
    return scored.select("doc_id", "score", "nt").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)


def suggest_terms(stats: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Autocomplete: the k most frequent vocabulary terms under a prefix
    → (term, df), by (df desc, term asc).

    ``startswith`` pushes to the stats scan as a string-range predicate
    (the term-sorted stats layout prunes row groups outside the prefix);
    ``orderBy().limit(k)`` is TakeOrderedAndProject — per-partition
    heaps, no global sort. Vocabulary-sized input, k-row output.
    """
    spark = stats.sparkSession
    if not prefix:
        return spark.createDataFrame([], "term string, df long")
    return (
        stats.filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
