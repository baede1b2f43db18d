"""Driver-contract queries: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a matching DuckDB oracle SQL
string over the same parquet tables.

These run over the driver's testdata ``documents`` / ``embeddings``
tables (``doc_id`` is given there, so no id assignment is involved —
id assignment determinism has its own pytest). Column names and rounding
are aligned on both sides because the driver hash-compares values.

The oracle SQL is generated from the SAME delimiter-regex constant the
Spark tokenizer uses — one source of truth for tokenizer semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.functions.bm25 import B, K1
from text_indexer_spark.sources.tables import load_table
from text_indexer_spark.tokenizer import duckdb_tokens_sql, tokenize_column
from text_indexer_spark.unicode_fixture import with_fixture_sql

# Fixed query-term sets (all present in the testdata vocabulary).
AND_TERMS = ["spark", "join", "window"]
BM25_TERMS = ["merge", "vector", "stream"]
EMPTY_TERM = ["zzz_nonexistent"]
ROUND = 4


# --------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------

def doc_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (term, doc_id, tf): the inverted index as a DataFrame
    (SURVEY §2.3 A1). One explode + one hash agg; map-side combine free."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(tokenize_column("text")).alias("term"))
    return toks.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term df + collection frequency (BM25 inputs; SURVEY §2.3)."""
    p = doc_postings(spark, sf_dir)
    return p.groupBy("term").agg(
        F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token length (catalog doc_len derivation)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.size(tokenize_column("text")).cast("long").alias("doc_len"),
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection constants N + avgdl (single-row aggregate)."""
    d = q_doc_stats(spark, sf_dir)
    return d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("doc_len"), ROUND).alias("avgdl"),
    )


def _conjunctive(spark: SparkSession, sf_dir: str, terms: list[str]) -> DataFrame:
    p = doc_postings(spark, sf_dir).filter(F.col("term").isin(terms))
    return (
        p.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id")
    )


def q_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive AND membership (reference DocumentsIndexer.kt:58-67)."""
    return _conjunctive(spark, sf_dir, AND_TERMS)


def q_search_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonexistent term → empty (Index.kt:11-13 empty-set default)."""
    return _conjunctive(spark, sf_dir, EMPTY_TERM)


def q_search_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matches joined back to the doc registry (id→path join,
    IndexedDocuments.kt:68-70), broadcast from the tiny match side."""
    ids = _conjunctive(spark, sf_dir, AND_TERMS)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return docs.join(F.broadcast(ids), "doc_id", "inner").select(
        "doc_id", "source", "lang"
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over AND-candidates, deterministic tie-break.

    Everything derives from postings so the oracle and the engine share
    identical inputs: dl = Σtf per doc, N = #docs with ≥1 token.
    """
    p = doc_postings(spark, sf_dir).cache()
    dl = p.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    consts = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = p.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    matched = p.filter(F.col("term").isin(BM25_TERMS))
    scored = (
        matched.join(F.broadcast(dfreq.filter(F.col("term").isin(BM25_TERMS))), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "w",
            F.log(
                F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * F.col("tf").cast("double")
            * F.lit(K1 + 1.0)
            / (
                F.col("tf").cast("double")
                + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("w").alias("s"), F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(BM25_TERMS))
        .select("doc_id", F.round(F.col("s"), ROUND).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


PREFIX = "s"            # wildcard query "s*" (6 testdata vocab terms)
WILDCARD = "s%a%"       # SQL-LIKE pattern (scan, small, spark, stream)
SNIPPET_WINDOW = 5
# non-vacuous on testdata text; identical leftmost-non-overlapping
# semantics in Java regex and DuckDB RE2 for this pattern class
GREP_REGEX = "s[a-z]+m"


def q_search_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix wildcard query over the vocabulary (engine extension:
    term-range scan, pushdown-pruned on the term-sorted layout)."""
    from text_indexer_spark.operators.search import prefix_match

    return prefix_match(doc_postings(spark, sf_dir), PREFIX)


def q_search_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General LIKE-pattern query; literal prefix extracted for pushdown."""
    from text_indexer_spark.operators.search import wildcard_match

    return wildcard_match(doc_postings(spark, sf_dir), WILDCARD)


def q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet extraction around the first query-term hit (result
    presentation; tokenizer-faithful positions, zero-shuffle scan)."""
    from text_indexer_spark.operators.highlight import snippets

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return snippets(docs, BM25_TERMS, window=SNIPPET_WINDOW)


def q_regex_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex content scan (the grep tier the inverted index can't serve).
    Runs over documents ∪ the multi-byte fixture (unicode_fixture.py) so
    the scan is driver-exercised on CJK/accented/emoji text."""
    from text_indexer_spark.operators.highlight import regex_grep
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    docs = docs_with_fixture(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")
    return regex_grep(docs, GREP_REGEX)


def _snapshot2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic second corpus snapshot derived from ``documents``:
    doc_id % 10 == 0 → deleted, % 10 == 1 → content modified, plus one
    synthetic added doc per 10 (doc_id + 1_000_000). Drives the sync
    operators with a DuckDB-expressible ground truth."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    modified = kept.withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) == 1,
            F.concat(F.col("text"), F.lit(" modified snapshot marker")),
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 2).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("added doc body "), F.col("text")).alias("text"),
    )
    return modified.unionByName(added)


SNAPSHOT2_SQL = """
snap2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN text || ' modified snapshot marker'
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'added doc body ' || text AS text
  FROM documents WHERE doc_id % 10 = 2
)
"""


def q_sync_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff as one full outer join (IndexedFileManager.kt:83-143
    → add / remove / reindex classification on content identity)."""
    old = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("old_v")
    )
    new = _snapshot2(spark, sf_dir).select("doc_id", F.md5(F.col("text")).alias("new_v"))
    j = old.join(new, "doc_id", "full_outer")
    return (
        j.withColumn(
            "change",
            F.when(F.col("old_v").isNull(), F.lit("add"))
            .when(F.col("new_v").isNull(), F.lit("remove"))
            .when(F.col("old_v") != F.col("new_v"), F.lit("reindex"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("change").isNotNull())
        .select("doc_id", "change")
    )


def q_sync_apply_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings after applying the diff with replace semantics
    (Index.kt:15-23): stale docs anti-joined out, fresh postings unioned.
    The oracle tokenizes snapshot 2 directly — both must agree exactly."""
    old_post = doc_postings(spark, sf_dir)
    diff = q_sync_diff(spark, sf_dir)
    snap2 = _snapshot2(spark, sf_dir)
    changed = diff.filter(F.col("change").isin("remove", "reindex")).select("doc_id")
    fresh_src = snap2.join(
        diff.filter(F.col("change").isin("add", "reindex")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    fresh = (
        fresh_src.select("doc_id", F.explode(tokenize_column("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    return old_post.join(changed, "doc_id", "left_anti").unionByName(fresh)


def q_dir_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog listing rollup per source root (DepthFirstSearch fold)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.size(tokenize_column("text")).cast("long").alias("doc_len"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_len").cast("long").alias("total_tokens"),
        )
    )


def q_remove_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory removal: drop every doc under source root 'src1', then
    report surviving per-term df (posting sweep, Index.kt:29-39 — empty
    lists vanish from the group-by)."""
    docs = load_table(spark, sf_dir, "documents")
    victims = docs.filter(F.col("source") == "src1").select("doc_id")
    p = doc_postings(spark, sf_dir).join(victims, "doc_id", "left_anti")
    return p.groupBy("term").agg(F.count("*").cast("long").alias("df"))


# --------------------------------------------------------------------
# DuckDB oracle SQL (same regex, same math, same aliases)
# --------------------------------------------------------------------

def _toks_cte() -> str:
    return (
        "toks AS (SELECT doc_id, unnest("
        + duckdb_tokens_sql("text")
        + ") AS term FROM documents), "
        "tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks "
        "WHERE term <> '' GROUP BY term, doc_id)"
    )


def _sql_list(terms: list[str]) -> str:
    return ", ".join("'" + t.replace("'", "''") + "'" for t in terms)


def sql_postings() -> str:
    return f"WITH {_toks_cte()} SELECT term, doc_id, tf FROM tf"


def sql_term_stats() -> str:
    return (
        f"WITH {_toks_cte()} "
        "SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term"
    )


def sql_doc_stats() -> str:
    toks = duckdb_tokens_sql("text")
    return (
        "SELECT doc_id, lang, "
        f"length(list_filter({toks}, t -> t <> ''))::BIGINT AS doc_len "
        "FROM documents"
    )


def sql_corpus_stats() -> str:
    return (
        f"WITH d AS ({sql_doc_stats()}) "
        "SELECT count(*)::BIGINT AS n_docs, round(avg(doc_len), 4) AS avgdl FROM d"
    )


def sql_search(terms: list[str]) -> str:
    return (
        f"WITH {_toks_cte()} "
        f"SELECT doc_id FROM (SELECT doc_id, count(DISTINCT term) AS nt FROM tf "
        f"WHERE term IN ({_sql_list(terms)}) GROUP BY doc_id) WHERE nt = {len(terms)}"
    )


def sql_search_paths() -> str:
    return (
        f"WITH {_toks_cte()}, m AS (SELECT doc_id FROM (SELECT doc_id, "
        f"count(DISTINCT term) AS nt FROM tf WHERE term IN ({_sql_list(AND_TERMS)}) "
        f"GROUP BY doc_id) WHERE nt = {len(AND_TERMS)}) "
        "SELECT d.doc_id, d.source, d.lang FROM documents d JOIN m USING (doc_id)"
    )


def sql_bm25_topk(conjunctive: bool = True, terms: list[str] | None = None) -> str:
    k1, b = K1, B
    terms = BM25_TERMS if terms is None else terms
    guard = f"WHERE nt = {len(set(terms))}" if conjunctive else ""
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
  WHERE tf.term IN ({_sql_list(terms)})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored {guard}
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 10
"""


def sql_search_prefix(pattern: str) -> str:
    """Shared by the prefix and wildcard gates — both are LIKE scans on
    the tokenized relation."""
    return (
        f"WITH {_toks_cte()} "
        "SELECT doc_id, count(DISTINCT term)::BIGINT AS n_terms, "
        "sum(tf)::BIGINT AS total_tf FROM tf "
        f"WHERE term LIKE '{pattern}' GROUP BY doc_id"
    )


def sql_search_snippets() -> str:
    from text_indexer_spark.operators.highlight import NO_MATCH

    toks = duckdb_tokens_sql("text")
    pos_terms = ", ".join(
        f"coalesce(nullif(list_position(toks, '{t}'), 0), {NO_MATCH})"
        for t in BM25_TERMS
    )
    w = SNIPPET_WINDOW
    return f"""
WITH t AS (SELECT doc_id, list_filter({toks}, x -> x <> '') AS toks FROM documents),
p AS (SELECT doc_id, toks, least({pos_terms}) AS fp FROM t)
SELECT doc_id, fp::INT AS first_pos,
       array_to_string(list_slice(toks, greatest(1, fp - {w}), fp + {w}), ' ') AS snippet
FROM p WHERE fp <> {NO_MATCH}
"""


def sql_regex_grep() -> str:
    return (
        f"SELECT doc_id, length(regexp_extract_all(text, '{GREP_REGEX}'))::INT "
        "AS n_matches FROM documents "
        f"WHERE length(regexp_extract_all(text, '{GREP_REGEX}')) > 0"
    )


def sql_sync_diff() -> str:
    return f"""
WITH {SNAPSHOT2_SQL.strip()},
old AS (SELECT doc_id, md5(text) AS old_v FROM documents),
new AS (SELECT doc_id, md5(text) AS new_v FROM snap2)
SELECT doc_id,
       CASE WHEN old_v IS NULL THEN 'add'
            WHEN new_v IS NULL THEN 'remove'
            WHEN old_v <> new_v THEN 'reindex' END AS change
FROM old FULL OUTER JOIN new USING (doc_id)
WHERE (old_v IS NULL) OR (new_v IS NULL) OR (old_v <> new_v)
"""


def sql_sync_apply_postings() -> str:
    # ground truth: tokenize snapshot 2 directly
    toks = duckdb_tokens_sql("text")
    return f"""
WITH {SNAPSHOT2_SQL.strip()},
t AS (SELECT doc_id, unnest({toks}) AS term FROM snap2)
SELECT term, doc_id, count(*)::BIGINT AS tf FROM t WHERE term <> ''
GROUP BY term, doc_id
"""


def sql_dir_rollup() -> str:
    toks = duckdb_tokens_sql("text")
    return (
        "SELECT source, count(*)::BIGINT AS n_docs, "
        f"sum(length(list_filter({toks}, t -> t <> '')))::BIGINT AS total_tokens "
        "FROM documents GROUP BY source"
    )


def sql_remove_dir() -> str:
    return (
        f"WITH {_toks_cte()} "
        "SELECT term, count(*)::BIGINT AS df FROM tf "
        "WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src1') "
        "GROUP BY term"
    )


# --------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize_postings": doc_postings,
        "term_stats": q_term_stats,
        "doc_stats": q_doc_stats,
        "corpus_stats": q_corpus_stats,
        "search_and": q_search_and,
        "search_and_empty": q_search_empty,
        "search_paths": q_search_paths,
        "search_prefix": q_search_prefix,
        "search_wildcard": q_search_wildcard,
        "search_snippets": q_search_snippets,
        "regex_grep": q_regex_grep,
        "bm25_topk": q_bm25_topk,
        "sync_diff": q_sync_diff,
        "sync_apply_postings": q_sync_apply_postings,
        "dir_rollup": q_dir_rollup,
        "remove_dir": q_remove_dir,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tokenize_postings": sql_postings(),
        "term_stats": sql_term_stats(),
        "doc_stats": sql_doc_stats(),
        "corpus_stats": sql_corpus_stats(),
        "search_and": sql_search(AND_TERMS),
        "search_and_empty": sql_search(EMPTY_TERM),
        "search_paths": sql_search_paths(),
        "search_prefix": sql_search_prefix(PREFIX + "%"),
        "search_wildcard": sql_search_prefix(WILDCARD),
        "search_snippets": sql_search_snippets(),
        "regex_grep": with_fixture_sql(sql_regex_grep()),
        "bm25_topk": sql_bm25_topk(),
        "sync_diff": sql_sync_diff(),
        "sync_apply_postings": sql_sync_apply_postings(),
        "dir_rollup": sql_dir_rollup(),
        "remove_dir": sql_remove_dir(),
    }
