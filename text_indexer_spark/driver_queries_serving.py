"""Driver gates for the serving-tier + corpus-analytics extensions:
scoped search, facets, minimum-should-match BM25, more-like-this, term
autocomplete, n-gram counts, tf·idf document vectors.

Same contract as ``driver_queries``: each operator is a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string
over the same parquet tables, with identical column names/rounding so
the driver's value-hash comparison holds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.driver_queries import (
    AND_TERMS,
    BM25_TERMS,
    _sql_list,
    _toks_cte,
    doc_postings,
)
from text_indexer_spark.functions.bm25 import B, K1
from text_indexer_spark.sources.tables import load_table

SCOPE_SOURCE = "src1"       # 25 docs per source in the testdata layout
MSM_MIN_MATCH = 2           # 2-of-3 over BM25_TERMS
MLT_SEED_DOC = 7            # exists at every sf
MLT_TERMS = 5
SUGGEST_PREFIX = "s"
NGRAM_N = 2
NGRAM_MIN_COUNT = 2
TFIDF_M = 5
ROUND = 4


def _postings_catalog(spark: SparkSession, sf_dir: str):
    """Shared derivation: postings + a postings-consistent catalog
    (doc_id, doc_len = Σtf) — the same convention as the bm25_topk gate,
    so every ranking gate scores over identical collection constants."""
    p = doc_postings(spark, sf_dir)
    cat = p.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("doc_len"))
    stats = p.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return p, cat, stats


# ------------------------------------------------------------ scoped search

def q_search_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive AND restricted to one source root ("search within
    dir"): the scope predicate prunes the catalog scan, the match runs
    over term-pruned postings only."""
    from text_indexer_spark.operators.serving import scoped_conjunctive

    p, _, _ = _postings_catalog(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return scoped_conjunctive(p, docs, AND_TERMS, source=SCOPE_SOURCE)


def sql_search_scoped() -> str:
    return (
        f"WITH {_toks_cte()} "
        "SELECT doc_id FROM (SELECT doc_id, count(DISTINCT term) AS nt FROM tf "
        f"WHERE term IN ({_sql_list(AND_TERMS)}) "
        f"AND doc_id IN (SELECT doc_id FROM documents WHERE source = '{SCOPE_SOURCE}') "
        f"GROUP BY doc_id) WHERE nt = {len(AND_TERMS)}"
    )


# ------------------------------------------------------------ facet counts

def q_search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet aggregation (source × lang doc counts) over the AND match
    set — the result-page summary every search UI renders."""
    from text_indexer_spark.operators.serving import facet_counts

    p, _, _ = _postings_catalog(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return facet_counts(p, docs, AND_TERMS, ["source", "lang"])


def sql_search_facets() -> str:
    return (
        f"WITH {_toks_cte()}, "
        "m AS (SELECT doc_id FROM (SELECT doc_id, count(DISTINCT term) AS nt "
        f"FROM tf WHERE term IN ({_sql_list(AND_TERMS)}) GROUP BY doc_id) "
        f"WHERE nt = {len(AND_TERMS)}) "
        "SELECT d.source, d.lang, count(*)::BIGINT AS n_docs "
        "FROM documents d JOIN m USING (doc_id) GROUP BY d.source, d.lang"
    )


# ------------------------------------------------------------ msm ranking

def _sql_bm25_scored(terms: list[str]) -> str:
    """Shared scored-CTE body (same math as sql_bm25_topk, plus nt)."""
    k1, b = K1, B
    return f"""
dl AS (SELECT doc_id, sum(tf)::DOUBLE AS dl FROM tf GROUP BY doc_id),
consts AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (consts.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {k1 + 1.0}
              / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / consts.avgdl)) ) AS s,
         count(DISTINCT tf.term)::BIGINT AS nt
  FROM tf
  JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN consts
  WHERE tf.term IN ({_sql_list(terms)})
  GROUP BY tf.doc_id
)"""


def q_bm25_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-should-match top-10: ≥2 of the 3 BM25 query terms."""
    from text_indexer_spark.operators.serving import bm25_topk_msm

    p, cat, stats = _postings_catalog(spark, sf_dir)
    return bm25_topk_msm(p, cat, stats, BM25_TERMS, MSM_MIN_MATCH, k=10)


def sql_bm25_msm() -> str:
    return (
        f"WITH {_toks_cte()}, {_sql_bm25_scored(BM25_TERMS).strip()} "
        f"SELECT doc_id, round(s, {ROUND}) AS score, nt FROM scored "
        f"WHERE nt >= {MSM_MIN_MATCH} "
        f"ORDER BY round(s, {ROUND}) DESC, doc_id ASC LIMIT 10"
    )


# ------------------------------------------------------------ more-like-this

def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar docs to seed doc 7 via its 5 strongest tf·idf terms."""
    from text_indexer_spark.operators.serving import more_like_this

    p, cat, stats = _postings_catalog(spark, sf_dir)
    return more_like_this(p, cat, stats, MLT_SEED_DOC, m=MLT_TERMS, k=10)


def sql_more_like_this() -> str:
    k1, b = K1, B
    return f"""
WITH {_toks_cte()},
dl AS (SELECT doc_id, sum(tf)::DOUBLE AS dl FROM tf GROUP BY doc_id),
consts AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
seed AS (
  SELECT tf.term
  FROM tf JOIN dfreq USING (term) CROSS JOIN consts
  WHERE tf.doc_id = {MLT_SEED_DOC}
  ORDER BY round(tf.tf * ln(1 + (consts.n_docs - dfreq.df + 0.5)
                              / (dfreq.df + 0.5)), 6) DESC, tf.term ASC
  LIMIT {MLT_TERMS}
),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (consts.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {k1 + 1.0}
              / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / consts.avgdl)) ) AS s,
         count(DISTINCT tf.term)::BIGINT AS nt
  FROM tf
  JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN consts
  WHERE tf.term IN (SELECT term FROM seed) AND tf.doc_id <> {MLT_SEED_DOC}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, {ROUND}) AS score, nt FROM scored
ORDER BY round(s, {ROUND}) DESC, doc_id ASC LIMIT 10
"""


# ------------------------------------------------------------ autocomplete

def q_term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete under prefix 's': top-10 vocabulary terms by df."""
    from text_indexer_spark.operators.serving import suggest_terms

    _, _, stats = _postings_catalog(spark, sf_dir)
    return suggest_terms(stats, SUGGEST_PREFIX, k=10)


def sql_term_suggest() -> str:
    return (
        f"WITH {_toks_cte()} "
        "SELECT term, count(*)::BIGINT AS df FROM tf "
        f"WHERE term LIKE '{SUGGEST_PREFIX}%' GROUP BY term "
        "ORDER BY df DESC, term ASC LIMIT 10"
    )


# ------------------------------------------------------------ n-gram counts

def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram corpus counts (LM training-data staple)."""
    from text_indexer_spark.operators.cooccur import ngram_counts

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_counts(docs, n=NGRAM_N, min_count=NGRAM_MIN_COUNT).withColumnRenamed(
        "count", "n"
    )


def sql_ngram_counts() -> str:
    from text_indexer_spark.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    return f"""
WITH t AS (SELECT list_filter({toks}, x -> x <> '') AS toks FROM documents),
g AS (SELECT toks[i - 1] || ' ' || toks[i] AS ngram
      FROM t, unnest(range(2, len(toks) + 1)) AS u(i))
SELECT ngram, count(*)::BIGINT AS n FROM g
GROUP BY ngram HAVING count(*) >= {NGRAM_MIN_COUNT}
"""


# ------------------------------------------------------------ tf·idf vectors

def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 tf·idf terms (sparse featurization)."""
    from text_indexer_spark.operators.textstats import tfidf_topm

    p, _, _ = _postings_catalog(spark, sf_dir)
    return tfidf_topm(p, m=TFIDF_M, round_to=ROUND)


def sql_tfidf_vectors() -> str:
    return f"""
WITH {_toks_cte()},
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tf),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(1 + (nd.n_docs - dfreq.df + 0.5)
                            / (dfreq.df + 0.5)), {ROUND}) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
),
r AS (SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC)::BIGINT AS "rank"
      FROM scored)
SELECT doc_id, term, tfidf, "rank" FROM r WHERE "rank" <= {TFIDF_M}
"""


# ------------------------------------------------------- scoped wand serving

def q_wand_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped BM25 top-10 served from the COMPRESSED persisted index:
    the scope (repo = 'src1') becomes a doc-id interval via
    ``scope_ranges`` (layout: id order ≡ (repo, path) order), and the
    WAND kernel prunes whole blocks against the interval before decode.
    Scores stay global (weights baked index-wide); only candidates
    narrow — the oracle mirrors that: global df/avgdl, scope-restricted
    match set."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_wand_index,
    )
    from text_indexer_spark.operators.index_build import (
        load_catalog,
        load_posting_lists,
    )
    from text_indexer_spark.operators.wand import scope_ranges, wand_topk

    idx = _ensure_wand_index(spark, sf_dir)
    lists = load_posting_lists(spark, idx)
    rng = scope_ranges(load_catalog(spark, idx), repo=SCOPE_SOURCE)
    cands = wand_topk(
        lists, BM25_TERMS, k=10, round_to=ROUND, global_topk=False, scope=rng
    )
    return (
        cands.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def sql_wand_scoped() -> str:
    k1, b = K1, B
    return f"""
WITH {_toks_cte()},
dl AS (SELECT doc_id, sum(tf)::DOUBLE AS dl FROM tf GROUP BY doc_id),
consts AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (consts.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {k1 + 1.0}
              / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / consts.avgdl)) ) AS s,
         count(DISTINCT tf.term) AS nt
  FROM tf
  JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN consts
  WHERE tf.term IN ({_sql_list(BM25_TERMS)})
    AND tf.doc_id IN (SELECT doc_id FROM documents WHERE source = '{SCOPE_SOURCE}')
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, {ROUND}) AS score FROM scored
WHERE nt = {len(BM25_TERMS)}
ORDER BY round(s, {ROUND}) DESC, doc_id ASC LIMIT 10
"""


# --------------------------------------------------- fuzzy autocomplete

SUGGEST_TYPO = "tble"        # no vocabulary term extends it; "table" is 1 edit


def q_term_suggest_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant autocomplete: prefix OR edit-distance-1 over the
    vocabulary in one scan."""
    from text_indexer_spark.operators.serving import suggest_terms_fuzzy

    _, _, stats = _postings_catalog(spark, sf_dir)
    return suggest_terms_fuzzy(stats, SUGGEST_TYPO, k=10)


def sql_term_suggest_fuzzy() -> str:
    return f"""
WITH {_toks_cte()},
v AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term)
SELECT term, df FROM v
WHERE starts_with(term, '{SUGGEST_TYPO}')
   OR levenshtein(term, '{SUGGEST_TYPO}') <= 1
ORDER BY df DESC, term ASC LIMIT 10
"""


# ------------------------------------------------------------- BM25F

BM25F_TERMS = ["spark", "src3"]          # "src3" lives ONLY in `source`
BM25F_WEIGHTS = {"source": 3.0, "text": 1.0}


def q_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-weighted BM25F over (source, text) as a title/body pair:
    the `source` field carries 3x weight, so a doc whose short source
    field matches outranks body-only matches."""
    from text_indexer_spark.operators.serving import bm25f_topk, field_postings

    docs = load_table(spark, sf_dir, "documents")
    fps = field_postings(docs, {"source": "source", "text": "text"})
    return bm25f_topk(
        fps, BM25F_TERMS, BM25F_WEIGHTS, k=10, round_to=ROUND
    )


def sql_bm25f() -> str:
    from text_indexer_spark.tokenizer import duckdb_tokens_sql

    terms = _sql_list(BM25F_TERMS)
    w = "CASE WHEN field = 'source' THEN 3.0 ELSE 1.0 END"

    def toks(col):
        return (
            f"SELECT doc_id, unnest(list_filter({duckdb_tokens_sql(col)}, "
            f"x -> x <> '')) AS term FROM documents"
        )

    return f"""
WITH fp AS (
  SELECT doc_id, field, term, count(*)::DOUBLE AS tf FROM (
    SELECT doc_id, 'source' AS field, term FROM ({toks('source')})
    UNION ALL
    SELECT doc_id, 'text' AS field, term FROM ({toks('text')})
  ) GROUP BY doc_id, field, term
),
flen AS (SELECT doc_id, field, sum(tf) AS flen FROM fp GROUP BY doc_id, field),
nn AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM fp),
av AS (SELECT field, sum(flen) / (SELECT n FROM nn) AS avgdl
       FROM flen GROUP BY field),
dfq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM fp
        WHERE term IN ({terms}) GROUP BY term),
tfd AS (
  SELECT fp.doc_id, fp.term,
         sum({w} * fp.tf / ({1.0 - B} + {B} * flen.flen / av.avgdl)) AS tfd
  FROM fp JOIN flen USING (doc_id, field) JOIN av USING (field)
  WHERE fp.term IN ({terms})
  GROUP BY fp.doc_id, fp.term
),
scored AS (
  SELECT doc_id,
         sum( ln(1 + ((SELECT n FROM nn) - df + 0.5) / (df + 0.5))
              * tfd * {K1 + 1.0} / (tfd + {K1}) ) AS s
  FROM tfd JOIN dfq USING (term) GROUP BY doc_id
)
SELECT doc_id, round(s, {ROUND}) AS score FROM scored
ORDER BY round(s, {ROUND}) DESC, doc_id ASC LIMIT 10
"""


# ------------------------------------------------------------ registry

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "search_scoped": q_search_scoped,
        "search_facets": q_search_facets,
        "bm25_msm": q_bm25_msm,
        "more_like_this": q_more_like_this,
        "term_suggest": q_term_suggest,
        "ngram_counts": q_ngram_counts,
        "tfidf_vectors": q_tfidf_vectors,
        "wand_bm25_scoped": q_wand_scoped,
        "bm25f_topk": q_bm25f,
        "term_suggest_fuzzy": q_term_suggest_fuzzy,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "search_scoped": sql_search_scoped(),
        "search_facets": sql_search_facets(),
        "bm25_msm": sql_bm25_msm(),
        "more_like_this": sql_more_like_this(),
        "term_suggest": sql_term_suggest(),
        "ngram_counts": sql_ngram_counts(),
        "tfidf_vectors": sql_tfidf_vectors(),
        "wand_bm25_scoped": sql_wand_scoped(),
        "bm25f_topk": sql_bm25f(),
        "term_suggest_fuzzy": sql_term_suggest_fuzzy(),
    }
