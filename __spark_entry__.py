"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k query end-to-end on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its
DuckDB oracle (see text_indexer_spark/driver_queries.py).

Registration ORDER matters: the driver's correctness gate evaluates the
first 50 entries of ``queries()`` in dict order.  Round 2 verified one
50-gate window (CORRECTNESS_r02.json), round 3 the other
(CORRECTNESS_r03.json, overlap 1).  Round 4 rotates back: the window
holds the 3 gates that had never had a driver row, the 9 gates NEW in
r4 (``regex_grep_pushdown``; ``line_dedup_stats``/``line_dedup_kept``
— corpus-wide C4-style line dedup; ``decontam_bloom_kept`` — the
Bloom-prefiltered decontamination scale path; ``regex_grep_batch`` —
one-probe multi-pattern grep; ``lm_ppl`` — CCNet-style bigram-LM
perplexity scoring; ``ann_int8_topk`` — int8-quantized vector store
with provably exact rerank; ``ann_ivf_int8_full_probe`` — IVF + SQ8
composed, both stages lossless at full probe; ``vocab_encode`` —
frequency-ranked token ids + per-doc id-sequence encoding), the 3 gates whose code changed this round
(Unicode-routing ``tokenize_by_lang``, CAS-commit
``trigram_sync_postings``, and ``trigram_postings`` after its
O(len²)→O(len) gram-extraction rewrite), and 35 of the 49 r2 gates now
stale by one round.  The 14 r2 gates left out (``search_and_empty``,
``quality_kept_corpus``, ``dedup_kept_corpus``, ``ann_ivf_full_probe``,
``sample_stratified``, ``split_hash``, and — displaced by the eight new
r4 gates — ``term_expansion``, ``search_expanded``, ``phrase_match``, ``proximity_match``, ``phrase_match_index``,
``proximity_match_index``, ``decoded_positions``, ``sample_hash``)
each have an r2 green row; the first six are thin variants of
in-window siblings sharing their code path (empty-token guard over
``search_and``; anti-join wrappers over
``quality_scores``/``dedup_clusters``; the unpersisted twin of
``ann_ivf_indexed_full_probe`` — same quantizer + per-list scorer, same
oracle; the content-stable-xxhash64 siblings of ``sample_hash``), and
the eight displaced expansion/positional/sampling gates are unchanged since r2 and
lead the intended r5 rotation (they sit first in the tail order below).
All 111 queries remain oracle-replayed at HEAD in
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

#: The round-4 window: the first 50 entries land driver rows this
#: round.  Head = 3 never-driver-verified gates, the 9 gates NEW in r4
#: (``regex_grep_pushdown``, ``line_dedup_stats``, ``line_dedup_kept``,
#: ``decontam_bloom_kept``, ``regex_grep_batch``, ``lm_ppl``,
#: ``ann_int8_topk``, ``ann_ivf_int8_full_probe``, ``vocab_encode``),
#: and the
#: 3 gates whose code changed this round (Unicode-routing
#: ``tokenize_by_lang``; CAS-commit ``trigram_sync_postings``;
#: ``trigram_postings`` itself, whose gram extraction was rewritten
#: O(len²)→O(len) this round); tail = 35 of the r2 gates in their r2
#: registration order.  Entries past position 50 stay in this list to
#: PIN THE R5 ROTATION ORDER: the eight gates the new r4 gates displaced
#: (``term_expansion`` … ``sample_hash``) come first, then the
#: ``sample_stratified``/``split_hash`` siblings (see module docstring
#: for the accounting).  Every r3-window gate is unchanged since its
#: r3 green row except the trigram family, which is re-admitted above.
_R4_PRIORITY = [
    "search_dsl_fuzzy2_index",
    "decontam_kept_corpus",
    "repetition_kept_corpus",
    "regex_grep_pushdown",
    "trigram_postings",
    "tokenize_by_lang",
    "trigram_sync_postings",
    "line_dedup_stats",
    "line_dedup_kept",
    "decontam_bloom_kept",
    "regex_grep_batch",
    "lm_ppl",
    "ann_int8_topk",
    "ann_ivf_int8_full_probe",
    "vocab_encode",
    "term_stats",
    "doc_stats",
    "corpus_stats",
    "search_and",
    "search_paths",
    "search_prefix",
    "search_wildcard",
    "search_snippets",
    "regex_grep",
    "bm25_topk",
    "sync_diff",
    "sync_apply_postings",
    "dir_rollup",
    "remove_dir",
    "registry_listing",
    "dedup_exact",
    "dedup_minhash_sigs",
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "hot_shingles",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "neardup_cosine",
    "neardup_cosine_lsh",
    "neardup_clusters_cosine",
    "ann_cosine_topk",
    "ann_ivf_indexed_full_probe",
    "lang_id",
    "quality_scores",
    "token_counts",
    "doc_fingerprints",
    "doc_chunks",
    "packed_chunks",
    "term_cooccurrence",
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
]


def _ordered(merged: dict) -> dict:
    head = {k: merged[k] for k in _R4_PRIORITY if k in merged}
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
