"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k query end-to-end on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its
DuckDB oracle (see text_indexer_spark/driver_queries.py).

Registration ORDER matters: the driver's correctness gate evaluates the
first 50 entries of ``queries()`` in dict order.  Round 2 verified
registrations 1-50 (CORRECTNESS_r02.json); round 3 therefore leads with
the gates that have never had a driver row — the WAND serving family,
paging/codec, serving tier, boolean/DSL tier, hygiene tier, multimodal,
and every gate added in round 3 (lang-ID NB, fuzzy d=2, index optimize,
trigram family, code-ident family) — which now exactly fill the window.
All queries remain oracle-replayed in
``tests/test_driver_contract.py`` regardless of window position.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from text_indexer_spark import (
    driver_queries,
    driver_queries_boolean,
    driver_queries_ext,
    driver_queries_hygiene,
    driver_queries_serving,
)

#: Gates promoted to the head of the registry for round 3 — every query
#: registered after ``split_hash`` in rounds 1-2, i.e. everything whose
#: only verification so far is pytest.  38 entries; the driver's
#: 50-query window covers all of them plus the first 12 legacy gates.
_R3_PRIORITY = [
    # WAND / codec / merge serving path (changed in r2; last driver row r1)
    "wand_bm25_topk",
    "wand_bm25_topk_or",
    "wand_bm25_batch",
    "wand_bm25_scoped",
    "decoded_postings",
    "merged_decoded_postings",
    "search_results_page",
    # serving tier (never driver-verified)
    "search_scoped",
    "search_facets",
    "bm25_msm",
    "more_like_this",
    "term_suggest",
    "ngram_counts",
    "tfidf_vectors",
    "bm25f_topk",
    "term_suggest_fuzzy",
    # boolean / DSL tier (never driver-verified)
    "search_boolean",
    "search_boolean_not",
    "boolean_from_index",
    "search_boolean_ranked",
    "search_dsl",
    "search_dsl_index",
    "search_dsl_ranked",
    "search_dsl_ranked_index",
    "search_dsl_near",
    "search_dsl_fuzzy",
    "search_dsl_fuzzy_index",
    "search_dsl_snippets",
    # hygiene tier (never driver-verified); the two *_kept_corpus
    # variants are thin anti-joins over their in-window siblings — their
    # slots go to the symbol gates (distinct code paths), they stay
    # pytest-replayed
    "decontam_hits",
    "repetition_stats",
    "fuzzy_terms",
    "search_fuzzy",
    "tokenize_by_lang",
    "pii_stats",
    # multimodal (no driver row in either round)
    "multimodal_meta",
    "multimodal_frames",
    # new in r3 (never driver-verified by definition)
    "lang_id_nb",
    "fuzzy_terms2",
    "search_dsl_fuzzy2",
    # search_dsl_fuzzy2_index shares its entire path with
    # search_dsl_fuzzy_index (above) + fuzzy_terms2; its window slot goes
    # to grep_lines (a distinct code path) — it stays pytest-replayed
    "optimized_postings",
    "trigram_postings",
    "regex_grep_trigram",
    "code_ident_postings",
    "search_code_ident",
    "trigram_sync_postings",
    "substring_search",
    "grep_lines",
    "symbol_postings",
    "search_symbol",
]


def _ordered(merged: dict) -> dict:
    head = {k: merged[k] for k in _R3_PRIORITY if k in merged}
    tail = {k: v for k, v in merged.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the FULL engine path — build the compressed sharded
    index from the sf0.001 documents table (stage A/B/C + manifest
    commit), then serve BM25 top-10 via block-max WAND over the
    persisted posting lists."""
    return driver_queries_ext.q_wand_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(
        {
            **driver_queries.queries(),
            **driver_queries_ext.queries(),
            **driver_queries_serving.queries(),
            **driver_queries_boolean.queries(),
            **driver_queries_hygiene.queries(),
        }
    )


def oracle_sql() -> dict[str, str]:
    return _ordered(
        {
            **driver_queries.oracle_sql(),
            **driver_queries_ext.oracle_sql(),
            **driver_queries_serving.oracle_sql(),
            **driver_queries_boolean.oracle_sql(),
            **driver_queries_hygiene.oracle_sql(),
        }
    )
