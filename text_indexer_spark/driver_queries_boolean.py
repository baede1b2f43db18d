"""Driver gates for boolean query trees (AND / OR / NOT).

Both the Spark evaluation and the DuckDB oracle SQL are derived from
the SAME parsed AST (``operators/boolean.py``), so the gate checks the
evaluator, not a hand-transcribed formula.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.driver_queries import (
    _sql_list,
    _toks_cte,
    doc_postings,
    sql_bm25_topk,
)
from text_indexer_spark.operators.boolean import (
    boolean_bm25_topk,
    boolean_match,
    boolean_match_index,
    leaf_terms,
    parse_query,
    to_oracle_sql,
)
from text_indexer_spark.sources.tables import load_table

# 'dup' is the one rare term (df 25 at sf0.01) — the NOT leg actually
# excludes docs; the OR leg actually widens past plain AND.
BOOL_QUERY = "spark AND (join OR window) AND NOT dup"
BOOL_NOT_QUERY = "NOT dup"
# the full DSL: a phrase leaf, a prefix leaf, a wildcard leaf, boolean
# glue — every leaf kind non-vacuous at sf0.01 ("table hash" phrase: 46
# docs; qu* → query; s?an → scan; dup rare)
DSL_QUERY = '"table hash" AND (qu* OR s?an) AND NOT dup'
# slop/NEAR leaf: merge & stream within a 6-token span, minus rare docs
NEAR_QUERY = '"merge stream"~6 AND NOT dup'
# fuzzy leaf: "tble~" is a deliberate typo one edit from "table";
# boolean glue keeps the whole grammar in play
FUZZY_QUERY = "tble~ AND (quer* OR dup)"
# d=2 fuzzy leaf: "strm" has NO distance-1 vocabulary match, so ~2 is
# the only reason this query returns anything (sort, stream)
FUZZY2_QUERY = "strm~2 AND NOT dup"
ROUND = 4


def q_search_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean tree over the postings DataFrame: one IN-scan, per-doc
    matched-leaf set, codegen'd expression — no catalog touch (the
    query is unsatisfiable under all-false)."""
    return boolean_match(doc_postings(spark, sf_dir), BOOL_QUERY)


def q_search_boolean_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-level NOT: the universe path (catalog left-join) — docs
    containing none of the query's terms must appear."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return boolean_match(doc_postings(spark, sf_dir), BOOL_NOT_QUERY, catalog=docs)


def q_boolean_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same boolean tree served from the COMPRESSED committed index
    (per-shard decode + vectorized mask evaluation) — must equal the
    DataFrame path's oracle exactly."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_wand_index,
    )
    from text_indexer_spark.operators.index_build import load_posting_lists

    idx = _ensure_wand_index(spark, sf_dir)
    ids = boolean_match_index(load_posting_lists(spark, idx), BOOL_QUERY)
    return (
        ids.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


def q_search_boolean_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean filter + BM25 rank: the expression cuts the candidate
    set, positive leaves score (a NOT filters, never scores)."""
    p = doc_postings(spark, sf_dir)
    cat = p.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("doc_len"))
    stats = p.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return boolean_bm25_topk(p, cat, stats, BOOL_QUERY, k=10, round_to=ROUND)


# ----------------------------------------------------------- query DSL

def q_search_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified query DSL (phrase + prefix + wildcard + boolean)
    over the postings/documents DataFrames — one scan for exact terms,
    one pruned scan per affix leaf, positional joins for the phrase."""
    from text_indexer_spark.operators.querylang import match_query

    docs = load_table(spark, sf_dir, "documents")
    return match_query(doc_postings(spark, sf_dir), DSL_QUERY, docs=docs)


def q_search_dsl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same DSL served from the POSITIONAL compressed index —
    per-shard decode + vectorized mask evaluation, phrase slots checked
    against the stored position payload."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_pos_index,
    )
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.querylang import match_query_index

    idx = _ensure_pos_index(spark, sf_dir)
    ids = match_query_index(load_posting_lists(spark, idx), DSL_QUERY)
    return (
        ids.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


def q_search_dsl_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL filter + BM25 rank: the tree cuts the candidate set; the
    positively-used exact terms (phrase words included) score."""
    from text_indexer_spark.operators.querylang import dsl_bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    p = doc_postings(spark, sf_dir)
    cat = p.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("doc_len"))
    stats = p.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return dsl_bm25_topk(
        p, cat, stats, DSL_QUERY, docs=docs, k=10, round_to=ROUND
    )


def q_search_dsl_ranked_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked DSL search ENTIRELY from the positional compressed index:
    the tree filters per shard, the stored per-posting BM25 weights
    score, tie-inclusive local top-k → global TakeOrderedAndProject —
    must reproduce the relational scorer's oracle exactly."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_pos_index,
    )
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.querylang import dsl_bm25_topk_index

    idx = _ensure_pos_index(spark, sf_dir)
    top = dsl_bm25_topk_index(
        load_posting_lists(spark, idx), DSL_QUERY, k=10, round_to=ROUND
    )
    return (
        top.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id", "score")
    )


def q_search_dsl_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slop syntax ("a b"~N → unordered NEAR/N) served from the
    positional index — the DSL rendering of the proximity operator."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_pos_index,
    )
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.querylang import match_query_index

    idx = _ensure_pos_index(spark, sf_dir)
    ids = match_query_index(load_posting_lists(spark, idx), NEAR_QUERY)
    return (
        ids.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


# ------------------------------------------------------------- oracles

def _match_cte(query: str, universe: bool) -> str:
    """``m`` = matching doc_ids for ``query``, rendered from the AST."""
    node = parse_query(query)
    leaves = leaf_terms(node)
    flag_of = {t: f"f{i}" for i, t in enumerate(leaves)}
    flags_sql = ", ".join(
        f"bool_or(term = '{t}') AS {flag_of[t]}" for t in leaves
    )
    lm = f"lm AS (SELECT doc_id, {flags_sql} FROM tf WHERE term IN ({_sql_list(leaves)}) GROUP BY doc_id)"
    if not universe:
        cond = to_oracle_sql(node, flag_of)
        return f"{lm}, m AS (SELECT doc_id FROM lm WHERE {cond})"
    cond = to_oracle_sql(
        node, {t: f"coalesce({flag_of[t]}, false)" for t in leaves}
    )
    return (
        f"{lm}, m AS (SELECT d.doc_id FROM documents d "
        f"LEFT JOIN lm USING (doc_id) WHERE {cond})"
    )


def _dsl_match_cte(query: str) -> str:
    """CTEs (after ``tf``): ``pp`` positional postings, ``lm`` per-doc
    leaf flags, one ``ph<i>`` per phrase leaf, ``m`` = matching doc_ids
    — all rendered from the SAME AST the Spark evaluators run."""
    from text_indexer_spark.driver_queries_ext import _pp_cte
    from text_indexer_spark.operators import querylang as ql

    node = ql.parse_dsl(query)
    leaves = ql.leaves_of(node)
    flag_of: dict = {}
    lm_flags: list[str] = []
    phrase_ctes: list[str] = []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, ql.Term):
            lm_flags.append(f"bool_or(term = '{leaf.term}') AS f{i}")
            flag_of[leaf] = f"coalesce(f{i}, false)"
        elif isinstance(leaf, ql.Prefix):
            lm_flags.append(
                f"bool_or(starts_with(term, '{leaf.prefix}')) AS f{i}"
            )
            flag_of[leaf] = f"coalesce(f{i}, false)"
        elif isinstance(leaf, ql.Wildcard):
            rx = ql.wildcard_regex(leaf.pattern).replace("'", "''")
            lm_flags.append(
                f"bool_or(regexp_matches(term, '{rx}')) AS f{i}"
            )
            flag_of[leaf] = f"coalesce(f{i}, false)"
        elif isinstance(leaf, ql.Fuzzy):
            lm_flags.append(
                f"bool_or(levenshtein(term, '{leaf.term}') <= {leaf.edits}) "
                f"AS f{i}"
            )
            flag_of[leaf] = f"coalesce(f{i}, false)"
        elif isinstance(leaf, ql.Near):
            uniq = list(dict.fromkeys(leaf.terms))
            joins = " ".join(
                f"JOIN pp a{j} ON a{j}.doc_id = a0.doc_id"
                for j in range(1, len(uniq))
            )
            conds = " AND ".join(
                f"a{j}.term = '{t}'" for j, t in enumerate(uniq)
            )
            pos_list = ", ".join(f"a{j}.pos" for j in range(len(uniq)))
            span = (
                f"greatest({pos_list}) - least({pos_list}) < {leaf.window}"
            )
            phrase_ctes.append(
                f"nr{i} AS (SELECT DISTINCT a0.doc_id "
                f"FROM pp a0 {joins} WHERE {conds} AND {span})"
            )
            flag_of[leaf] = f"(d.doc_id IN (SELECT doc_id FROM nr{i}))"
        else:  # Phrase
            joins = " ".join(
                f"JOIN pp p{j} ON p{j}.doc_id = p0.doc_id "
                f"AND p{j}.pos = p0.pos + {j}"
                for j in range(1, len(leaf.terms))
            )
            conds = " AND ".join(
                f"p{j}.term = '{t}'" for j, t in enumerate(leaf.terms)
            )
            phrase_ctes.append(
                f"ph{i} AS (SELECT DISTINCT p0.doc_id "
                f"FROM pp p0 {joins} WHERE {conds})"
            )
            flag_of[leaf] = f"(d.doc_id IN (SELECT doc_id FROM ph{i}))"
    lm = (
        "lm AS (SELECT doc_id, "
        + ", ".join(lm_flags)
        + " FROM tf GROUP BY doc_id)"
    )
    cond = ql.to_oracle_sql(node, flag_of)
    m = (
        "m AS (SELECT d.doc_id FROM documents d "
        "LEFT JOIN lm ON lm.doc_id = d.doc_id WHERE " + cond + ")"
    )
    return ", ".join([_pp_cte(), lm, *phrase_ctes, m])


def sql_search_dsl(query: str = DSL_QUERY) -> str:
    return f"WITH {_toks_cte()}, {_dsl_match_cte(query)} SELECT doc_id FROM m"


def sql_search_dsl_ranked() -> str:
    from text_indexer_spark.operators import querylang as ql

    pos = ql.positive_score_terms(ql.parse_dsl(DSL_QUERY))
    base = sql_bm25_topk(conjunctive=False, terms=pos)
    return base.replace(
        "GROUP BY tf.doc_id",
        "AND tf.doc_id IN (SELECT doc_id FROM m)\n  GROUP BY tf.doc_id",
    ).replace(
        f"WITH {_toks_cte()},",
        f"WITH {_toks_cte()}, {_dsl_match_cte(DSL_QUERY)},",
    )


def sql_search_boolean(query: str = BOOL_QUERY, universe: bool = False) -> str:
    return (
        f"WITH {_toks_cte()}, {_match_cte(query, universe)} "
        "SELECT doc_id FROM m"
    )


def sql_search_boolean_ranked() -> str:
    node = parse_query(BOOL_QUERY)
    pos = [t for t in leaf_terms(node) if t != "dup"]
    base = sql_bm25_topk(conjunctive=False, terms=pos)
    # splice the boolean match restriction into the scored CTE's WHERE
    restricted = base.replace(
        "GROUP BY tf.doc_id",
        f"AND tf.doc_id IN (SELECT doc_id FROM m)\n  GROUP BY tf.doc_id",
    ).replace(
        f"WITH {_toks_cte()},",
        f"WITH {_toks_cte()}, {_match_cte(BOOL_QUERY, False)},",
    )
    return restricted


def q_search_dsl_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy leaf (``tble~``) in the DSL over the postings DataFrame:
    deletion-neighborhood candidate filter + levenshtein verify, fused
    into the same one-scan leaf evaluation as prefix/wildcard."""
    from text_indexer_spark.operators.querylang import match_query

    return match_query(doc_postings(spark, sf_dir), FUZZY_QUERY)


def q_search_dsl_fuzzy_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same fuzzy query served from the COMPRESSED committed index
    (per-shard decoded vocabulary checked with the O(len) radius-1
    kernel) — must equal the relational path's oracle exactly."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_wand_index,
    )
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.querylang import match_query_index

    idx = _ensure_wand_index(spark, sf_dir)
    ids = match_query_index(load_posting_lists(spark, idx), FUZZY_QUERY)
    return (
        ids.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


def q_search_dsl_fuzzy2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``term~2`` leaf: SymSpell delete-2 candidate cut + levenshtein
    verify inside the one-scan leaf evaluation."""
    from text_indexer_spark.operators.querylang import match_query

    return match_query(doc_postings(spark, sf_dir), FUZZY2_QUERY)


def q_search_dsl_fuzzy2_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``term~2`` served from the compressed committed index (per-shard
    decoded vocabulary checked with the banded d<=2 kernel)."""
    from text_indexer_spark.driver_queries_ext import (
        _engine_id_map,
        _ensure_wand_index,
    )
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.querylang import match_query_index

    idx = _ensure_wand_index(spark, sf_dir)
    ids = match_query_index(load_posting_lists(spark, idx), FUZZY2_QUERY)
    return (
        ids.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


def q_search_dsl_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-page snippets for the full DSL query: the tree selects the
    docs, the positively-used phrase terms highlight."""
    from text_indexer_spark.operators.highlight import snippets_for_query

    docs = load_table(spark, sf_dir, "documents")
    return snippets_for_query(
        docs, doc_postings(spark, sf_dir), DSL_QUERY, window=4
    )


def sql_search_dsl_snippets() -> str:
    from text_indexer_spark.driver_queries import duckdb_tokens_sql
    from text_indexer_spark.operators import querylang as ql
    from text_indexer_spark.operators.highlight import NO_MATCH

    terms = ql.positive_score_terms(ql.parse_dsl(DSL_QUERY))
    toks = duckdb_tokens_sql("text")
    pos_terms = ", ".join(
        f"coalesce(nullif(list_position(toks, '{t}'), 0), {NO_MATCH})"
        for t in terms
    )
    return f"""
WITH {_toks_cte()}, {_dsl_match_cte(DSL_QUERY)},
t AS (SELECT doc_id, list_filter({toks}, x -> x <> '') AS toks FROM documents
      WHERE doc_id IN (SELECT doc_id FROM m)),
p AS (SELECT doc_id, toks, least({pos_terms}) AS fp FROM t)
SELECT doc_id, fp::INT AS first_pos,
       array_to_string(list_slice(toks, greatest(1, fp - 4), fp + 4), ' ') AS snippet
FROM p WHERE fp <> {NO_MATCH}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "search_boolean": q_search_boolean,
        "search_boolean_not": q_search_boolean_not,
        "boolean_from_index": q_boolean_from_index,
        "search_boolean_ranked": q_search_boolean_ranked,
        "search_dsl": q_search_dsl,
        "search_dsl_index": q_search_dsl_index,
        "search_dsl_ranked": q_search_dsl_ranked,
        "search_dsl_ranked_index": q_search_dsl_ranked_index,
        "search_dsl_near": q_search_dsl_near,
        "search_dsl_fuzzy": q_search_dsl_fuzzy,
        "search_dsl_fuzzy_index": q_search_dsl_fuzzy_index,
        "search_dsl_fuzzy2": q_search_dsl_fuzzy2,
        "search_dsl_fuzzy2_index": q_search_dsl_fuzzy2_index,
        "search_dsl_snippets": q_search_dsl_snippets,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "search_boolean": sql_search_boolean(),
        "search_boolean_not": sql_search_boolean(BOOL_NOT_QUERY, universe=True),
        "boolean_from_index": sql_search_boolean(),
        "search_boolean_ranked": sql_search_boolean_ranked(),
        "search_dsl": sql_search_dsl(),
        "search_dsl_index": sql_search_dsl(),
        "search_dsl_ranked": sql_search_dsl_ranked(),
        "search_dsl_ranked_index": sql_search_dsl_ranked(),
        "search_dsl_near": sql_search_dsl(NEAR_QUERY),
        "search_dsl_fuzzy": sql_search_dsl(FUZZY_QUERY),
        "search_dsl_fuzzy_index": sql_search_dsl(FUZZY_QUERY),
        "search_dsl_fuzzy2": sql_search_dsl(FUZZY2_QUERY),
        "search_dsl_fuzzy2_index": sql_search_dsl(FUZZY2_QUERY),
        "search_dsl_snippets": sql_search_dsl_snippets(),
    }
