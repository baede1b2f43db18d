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


def field_postings(
    docs: DataFrame, fields: dict[str, str], id_col: str = "doc_id"
) -> DataFrame:
    """Multi-field postings: ``(doc_id, field, term, tf)``.

    ``fields`` maps field name → source column (e.g. ``{"title":
    "source", "body": "text"}``). ONE scan of the document table emits
    every field's tokens (per-field token arrays are built in the scan
    projection and flattened as tagged structs — pure codegen), then
    one hash agg produces per-(doc, field, term) frequencies. The
    building block of field-weighted ranking (:func:`bm25f_topk`).
    """
    from text_indexer_spark.tokenizer import tokenize_column

    def _tagger(name):
        # NB: must be a ONE-arg lambda — F.transform passes the element
        # index as a second argument when the callable accepts two
        return lambda t: F.struct(F.lit(name).alias("field"), t.alias("term"))

    tagged = F.flatten(
        F.array(
            *[
                F.transform(
                    tokenize_column(F.coalesce(F.col(col), F.lit(""))),
                    _tagger(name),
                )
                for name, col in sorted(fields.items())
            ]
        )
    )
    return (
        docs.select(F.col(id_col), F.explode(tagged).alias("ft"))
        .select(id_col, F.col("ft.field").alias("field"), F.col("ft.term").alias("term"))
        .groupBy(id_col, "field", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def bm25f_topk(
    fps: DataFrame,
    terms: list[str],
    weights: dict[str, float],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Field-weighted BM25F top-k over :func:`field_postings` output →
    ``(doc_id, score)``.

    The simplified-Robertson BM25F: per-field tf is length-normalized
    against that FIELD's average length, boosted by the field weight,
    and summed into one pseudo-frequency before a single saturation::

        tf~(t,d) = Σ_f  w_f · tf(t,d,f) / ((1-b) + b · len(d,f)/avgdl_f)
        score(d) = Σ_t  idf(t) · tf~ · (k1+1) / (tf~ + k1)

    idf is document-level (term in ANY weighted field), matching the
    engine's single-field Robertson idf. ``avgdl_f = Σ_d len(d,f) / N``
    with N = docs that have any weighted field — a field a doc lacks
    contributes length 0, so sparse fields get shorter average lengths
    rather than skewed ones. All stats (flen, avgdl, df, N) are scoped
    to ``list(weights)``: fields outside the weight map neither score
    nor perturb the statistics.

    Scale shape: the postings scan is term-IN pruned before anything
    joins; per-field doc lengths are computed once and joined only for
    matched docs (semi-join on the tiny match set); field averages and
    per-term dfs broadcast. One shuffle keyed on doc_id does the
    (doc, term) fold AND the final per-doc sum; global cut =
    TakeOrderedAndProject.
    """
    spark = fps.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms or not weights:
        return spark.createDataFrame([], f"{id_col} long, score double")
    # Stats (flen / avgdl / df / N) are computed over EXACTLY the
    # weighted fields: a caller passing partial weights over a wider
    # schema gets idf and length normalization consistent with what can
    # actually score, instead of stats polluted by unrankable fields.
    fps = fps.filter(F.col("field").isin(list(weights)))
    matched = fps.filter(F.col("term").isin(terms))
    flen = fps.groupBy(id_col, "field").agg(
        F.sum("tf").cast("double").alias("flen")
    )
    n_docs = float(fps.select(id_col).distinct().count())
    avg = flen.groupBy("field").agg(
        (F.sum("flen") / F.lit(n_docs)).alias("avgdl")
    )
    dfreq = (
        fps.filter(F.col("term").isin(terms))
        .select("term", id_col)
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
    )
    ids = matched.select(id_col).distinct()
    flen_m = flen.join(ids, id_col, "left_semi")
    w_col = F.lit(None).cast("double")
    for name, w in weights.items():
        w_col = F.when(F.col("field") == name, F.lit(float(w))).otherwise(w_col)
    tfd = (
        matched.join(flen_m, [id_col, "field"])
        .join(F.broadcast(avg), "field")
        .select(
            id_col,
            "term",
            (
                w_col
                * F.col("tf").cast("double")
                / (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("flen") / F.col("avgdl")
                )
            ).alias("wtf"),
        )
        .groupBy(id_col, "term")
        .agg(F.sum("wtf").alias("tfd"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tfd.join(F.broadcast(dfreq), "term")
        .select(
            id_col,
            (idf * F.col("tfd") * F.lit(k1 + 1.0) / (F.col("tfd") + F.lit(k1)))
            .alias("c"),
        )
        .groupBy(id_col)
        .agg(F.sum("c").alias("score"))
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def suggest_terms_fuzzy(stats: DataFrame, text: str, k: int = 10) -> DataFrame:
    """Typo-tolerant autocomplete ("did you mean"): the k most frequent
    vocabulary terms that either EXTEND the input as a prefix or sit
    within edit distance 1 of it → (term, df), by (df desc, term asc).

    One predicate over one vocabulary scan: ``startswith`` (pushes as a
    string-range filter) OR the deletion-neighborhood+levenshtein
    radius-1 check (codegen expressions — see ``operators/fuzzy.py``).
    Still TakeOrderedAndProject on vocabulary-sized input; covers the
    "user typed tble" case plain prefix autocomplete silently drops.
    """
    from text_indexer_spark.operators.fuzzy import fuzzy_candidate_cond

    spark = stats.sparkSession
    q = text.lower()
    if not q:
        return spark.createDataFrame([], "term string, df long")
    return (
        stats.filter(
            F.col("term").startswith(q)
            | fuzzy_candidate_cond(F.col("term"), q)
        )
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
