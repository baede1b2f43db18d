"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k query end-to-end on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its
DuckDB oracle (see text_indexer_spark/driver_queries.py).

Registration ORDER matters: the driver's correctness gate evaluates the
first 50 entries of ``queries()`` in dict order.  Rounds 2-4 rotated
50-gate windows (CORRECTNESS_r0{2,3,4}.json); union coverage after r4
is 111/111 with freshness 50 r4 / 47 r3 / 14 r2.  The ROUND-5 window
retires all remaining staleness debt in priority order:

* the 14 r2-stale gates (3 rounds old — the only gates whose last
  driver row predates r3): ``term_expansion``, ``search_expanded``,
  ``phrase_match(_index)``, ``proximity_match(_index)``,
  ``decoded_positions``, ``sample_hash``, ``sample_stratified``,
  ``split_hash``, ``search_and_empty``, ``quality_kept_corpus``,
  ``dedup_kept_corpus``, ``ann_ivf_full_probe``;
* the 3 gates NEW in r5 (``bpe_vocab``/``bpe_encode`` — distributed
  byte-pair-encoding subword trainer + encoder, oracle replaying the
  full merge sequence; ``span_dedup_kept`` — exact repeated-substring
  span dedup, Lee et al. 2021's ExactSubstr rule, oracle replaying
  window → count → covered-position union → reassembly in SQL);
* the 6 r4-green gates whose CODE changed after their r4 row (commit
  2ffdaf2: batch-grep localization keeps the corpus id type and always
  localizes under a blown id-cap; the trigram gram concat is derived
  from the N constant; r5: the ``quantize_int8`` expression-staging
  rewrite — O(dim³)→O(dim) per row, numerically identical by numpy
  differential): ``trigram_postings``, ``trigram_sync_postings``,
  ``regex_grep_batch``, ``regex_grep_pushdown``, ``ann_int8_topk``,
  ``ann_ivf_int8_full_probe``;
* 27 of the 47 r3-window gates (2 rounds stale by now) — the WAND /
  serving / boolean / DSL / fuzzy / hygiene / multimodal / code-search
  family heads.

The 20 r3 gates left out are thin variants whose family head is
in-window and whose code is unchanged since their r3 green row
(``wand_bm25_topk_or/batch/scoped`` over ``wand_bm25_topk``;
``merged_decoded_postings``/``optimized_postings`` over
``decoded_postings``; ``search_boolean_not/_ranked`` +
``boolean_from_index`` over ``search_boolean``; ``search_dsl_index``,
``search_dsl_ranked_index``, ``search_dsl_fuzzy(_index)``,
``search_dsl_fuzzy2``, ``search_dsl_snippets`` over
``search_dsl``/``search_dsl_ranked``/``search_dsl_fuzzy2_index``
(r4-green); ``term_suggest_fuzzy`` over ``term_suggest`` +
``fuzzy_terms``; ``fuzzy_terms2`` over ``fuzzy_terms``; ``lang_id_nb``
over ``lang_id`` (r4-green); ``tokenize_postings``, whose full build
runs inside in-window ``wand_bm25_topk``; ``multimodal_frames`` over
``multimodal_meta``; ``tfidf_vectors`` over ``ngram_counts`` +
``bm25f_topk`` — the last two displaced by the quantize-rewrite
re-admits; ``search_symbol`` over in-window ``symbol_postings``,
displaced by the span-dedup admit).  They lead the tail order below.
Resulting union freshness: 50 r5 + 44 r4 + 20 r3 = 114/114 (gates
115-118 — ``ann_ivf_upsert_topk`` (the maintained IVF vector store),
``dsir_scores``/``dsir_selected`` (DSIR importance resampling) and
``semdedup_kept`` (SemDeDup semantic dedup) — are new late in r5 and
register OUTSIDE the window so they displace nothing; they are
oracle-replayed at HEAD like every other gate, and the DSIR/SemDeDup
gates additionally hash-verified at sf0.1).  Of the
111 pre-existing gates, 91 end the round ≤1 round stale (47 in the r5
window + 44 still r4-green); the 20 two-rounds-stale r3 gates are
exactly the documented thin variants above.  A few more r3 heads
could have been fresh instead, but the window follows the
changed-code-first / new-operator-first rule: gates whose code
changed after their r4 row (including the two whose quantizer was
rewritten this round) and the three operators new this round outrank
unchanged thin variants.
All 118 queries remain oracle-replayed at HEAD in
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

#: The round-5 window: the first 50 entries land driver rows this
#: round.  Head = the 14 r2-stale gates (the only ones 3 rounds old),
#: then the 3 gates NEW in r5 (``bpe_vocab``/``bpe_encode``/
#: ``span_dedup_kept``), then the
#: 6 r4-green gates whose code changed post-row (commit 2ffdaf2:
#: trigram gram-concat + batch-grep localization; this round: the
#: quantize_int8 staging rewrite), then 27 r3-window family heads.
#: Entries past position 50 pin the tail order: the 20 excluded r3
#: thin variants first (see module docstring for the per-gate
#: accounting), then the r4-green gates.
_R5_PRIORITY = [
    # -- 14 r2-stale (last driver row: r2) --
    "term_expansion",
    "search_expanded",
    "phrase_match",
    "proximity_match",
    "phrase_match_index",
    "proximity_match_index",
    "decoded_positions",
    "sample_hash",
    "sample_stratified",
    "split_hash",
    "search_and_empty",
    "quality_kept_corpus",
    "dedup_kept_corpus",
    "ann_ivf_full_probe",
    # -- 3 NEW in r5: distributed BPE trainer + encoder; exact
    #    repeated-substring span dedup (Lee et al. ExactSubstr) --
    "bpe_vocab",
    "bpe_encode",
    "span_dedup_kept",
    # -- 6 r4 gates whose code changed after their r4 row (2ffdaf2:
    #    trigram gram concat + batch-grep localization; r5: the
    #    quantize_int8 expression-staging rewrite) --
    "trigram_postings",
    "trigram_sync_postings",
    "regex_grep_batch",
    "regex_grep_pushdown",
    "ann_int8_topk",
    "ann_ivf_int8_full_probe",
    # -- 27 r3-window family heads (2 rounds stale) --
    "wand_bm25_topk",
    "decoded_postings",
    "multimodal_meta",
    "search_results_page",
    "search_scoped",
    "search_facets",
    "bm25_msm",
    "more_like_this",
    "term_suggest",
    "ngram_counts",
    "bm25f_topk",
    "search_boolean",
    "search_dsl",
    "search_dsl_ranked",
    "search_dsl_near",
    "search_dsl_fuzzy",
    "decontam_hits",
    "repetition_stats",
    "fuzzy_terms",
    "search_fuzzy",
    "pii_stats",
    "regex_grep_trigram",
    "code_ident_postings",
    "search_code_ident",
    "substring_search",
    "grep_lines",
    "symbol_postings",
    # ---- tail (positions 51+): pins the next rotation order ----
    # 20 excluded r3 thin variants (multimodal_frames/tfidf_vectors
    # displaced by the two quantize-rewrite re-admits; search_symbol
    # by the span-dedup admit — its head symbol_postings is in-window)
    "search_symbol",
    "multimodal_frames",
    "tfidf_vectors",
    "wand_bm25_topk_or",
    "wand_bm25_batch",
    "wand_bm25_scoped",
    "merged_decoded_postings",
    "optimized_postings",
    "search_boolean_not",
    "search_boolean_ranked",
    "boolean_from_index",
    "search_dsl_index",
    "search_dsl_ranked_index",
    "search_dsl_fuzzy_index",
    "search_dsl_fuzzy2",
    "search_dsl_snippets",
    "term_suggest_fuzzy",
    "fuzzy_terms2",
    "lang_id_nb",
    "tokenize_postings",
]


def _ordered(merged: dict) -> dict:
    head = {k: merged[k] for k in _R5_PRIORITY if k in merged}
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
