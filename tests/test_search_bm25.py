"""E2E: golden corpus → build → conjunctive search + BM25 top-k vs the
numpy oracle. Mirrors the reference's E2E tests
(``DocumentsIndexerTest.kt:19-60``) and the FIXTURES.md query set."""

from __future__ import annotations

import pytest

from text_indexer_spark.corpus import golden_corpus, synthetic_corpus
from text_indexer_spark.operators.postings import (
    build_catalog,
    build_postings,
    corpus_stats,
    term_stats,
)
from text_indexer_spark.operators.search import (
    bm25_topk,
    conjunctive_match,
    search_paths,
)
from text_indexer_spark.oracle import OracleIndex


@pytest.fixture(scope="module")
def golden(spark):
    corpus = golden_corpus(spark, snapshot=1)
    catalog = build_catalog(corpus).cache()
    postings = build_postings(catalog).cache()
    stats = term_stats(postings).cache()
    rows = catalog.select("doc_id", "path", "content").collect()
    oracle = OracleIndex()
    for r in rows:
        oracle.add(r["doc_id"], r["content"])
    path_by_id = {r["doc_id"]: r["path"] for r in rows}
    return catalog, postings, stats, oracle, path_by_id


def test_catalog_shape(golden, spark):
    catalog, *_ = golden
    rows = catalog.orderBy("doc_id").collect()
    assert len(rows) == 5
    # deterministic ids: rank of (repo, path, commit)
    keys = [(r["repo"], r["path"], r["commit"]) for r in rows]
    assert keys == sorted(keys)
    assert [r["doc_id"] for r in rows] == list(range(5))
    # nested detection: file in a subdir of its root
    nested = {r["path"]: r["is_nested"] for r in rows}
    assert nested["mark-manson/a-practical-guide-to-happiness.txt"] is True
    assert nested["fight-club.txt"] is False


def test_conjunctive_golden_queries(golden):
    catalog, postings, stats, oracle, path_by_id = golden
    for terms in (["me", "i", "tyler"], ["judgemental", "curious"], ["zzz_nonexistent"], []):
        got = {r["doc_id"] for r in conjunctive_match(postings, terms).collect()}
        assert got == oracle.conjunctive(terms), terms
    # [me,i,tyler] → exactly fight club (DocumentsIndexerTest.kt:52-60)
    ids = {r["doc_id"] for r in conjunctive_match(postings, ["me", "i", "tyler"]).collect()}
    assert {path_by_id[i] for i in ids} == {"fight-club.txt"}
    # sentinel query → exactly the sentinel (TestData.kt:24-26)
    ids = {r["doc_id"] for r in conjunctive_match(postings, ["judgemental", "curious"]).collect()}
    assert {path_by_id[i] for i in ids} == {"temp_file.txt"}


def test_search_paths_sorted(golden):
    catalog, postings, stats, oracle, _ = golden
    rows = search_paths(postings, catalog, ["the"]).collect()
    paths = [(r["repo"], r["path"]) for r in rows]
    assert paths == sorted(paths)
    assert {r["doc_id"] for r in rows} == oracle.conjunctive(["the"])


def test_bm25_matches_oracle_golden(golden):
    catalog, postings, stats, oracle, _ = golden
    for terms in (["me", "i", "tyler"], ["the"], ["be", "curious"], ["tyler", "says"]):
        got = bm25_topk(postings, catalog, stats, terms, k=10, round_to=None).collect()
        exp = oracle.bm25_topk(terms, k=10)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], terms
        for r, (_, s) in zip(got, exp):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_bm25_synthetic_vs_oracle(spark):
    corpus = synthetic_corpus(spark, n_docs=200, avg_tokens=60)
    catalog = build_catalog(corpus).cache()
    postings = build_postings(catalog)
    stats = term_stats(postings)
    oracle = OracleIndex()
    for r in catalog.select("doc_id", "content").collect():
        oracle.add(r["doc_id"], r["content"])
    for terms in (["the", "data"], ["spark", "index", "query"], ["theta"], ["the"]):
        got = bm25_topk(postings, catalog, stats, terms, k=10, round_to=None).collect()
        exp = oracle.bm25_topk(terms, k=10)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], terms
        for r, (_, s) in zip(got, exp):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_postings_pandas_path_identical(spark, golden):
    catalog, postings, *_ = golden
    via_pandas = build_postings(catalog, use_pandas=True)
    a = {(r["term"], r["doc_id"], r["tf"]) for r in postings.collect()}
    b = {(r["term"], r["doc_id"], r["tf"]) for r in via_pandas.collect()}
    assert a == b


def test_determinism_across_parallelism(spark):
    """Same corpus at different partition counts → identical catalog ids
    and identical postings (FIXTURES.md §6 determinism check)."""
    corpus = synthetic_corpus(spark, n_docs=120, avg_tokens=40)
    snap = []
    for nparts in (2, 8):
        catalog = build_catalog(corpus, num_partitions=nparts)
        postings = build_postings(catalog)
        snap.append(
            (
                {(r["doc_id"], r["repo"], r["path"]) for r in catalog.collect()},
                {(r["term"], r["doc_id"], r["tf"]) for r in postings.collect()},
            )
        )
    assert snap[0] == snap[1]
