"""Serving-tier operators: scoped search, facets, msm ranking,
more-like-this, suggest, n-gram counts, tf·idf vectors.

Crafted-corpus semantics tests + plan guard rails (broadcasts where the
scale story requires them, no cartesian anywhere).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.cooccur import ngram_counts
from text_indexer_spark.operators.serving import (
    bm25_topk_msm,
    facet_counts,
    more_like_this,
    scoped_conjunctive,
    suggest_terms,
)
from text_indexer_spark.operators.textstats import tfidf_topm
from text_indexer_spark.plans.checks import formatted_plan
from text_indexer_spark.tokenizer import tokenize_column


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "srcA", "a/x.py", "spark join window fast"),
        (1, "srcA", "a/y.py", "spark join window slow slow"),
        (2, "srcB", "b/x.py", "spark join window"),
        (3, "srcB", "b/y.py", "spark only here"),
        (4, "srcB", "c/z.py", "join window no first term"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, path string, text string"
    )


@pytest.fixture(scope="module")
def postings(corpus):
    toks = corpus.select(
        "doc_id", F.explode(tokenize_column("text")).alias("term")
    )
    return (
        toks.groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .cache()
    )


@pytest.fixture(scope="module")
def catalog(postings):
    return postings.groupBy("doc_id").agg(
        F.sum("tf").cast("double").alias("doc_len")
    )


@pytest.fixture(scope="module")
def stats(postings):
    return postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))


TERMS = ["spark", "join", "window"]


def test_scoped_conjunctive_restricts_to_scope(corpus, postings):
    ids = scoped_conjunctive(postings, corpus, TERMS, source="srcB")
    assert sorted(r["doc_id"] for r in ids.collect()) == [2]
    # path-prefix scope
    ids2 = scoped_conjunctive(postings, corpus, TERMS, path_prefix="a/")
    assert sorted(r["doc_id"] for r in ids2.collect()) == [0, 1]
    # empty query short-circuits
    assert scoped_conjunctive(postings, corpus, [], source="srcA").count() == 0


def test_facet_counts(corpus, postings):
    out = facet_counts(postings, corpus, TERMS, ["source"]).collect()
    got = {r["source"]: r["n_docs"] for r in out}
    assert got == {"srcA": 2, "srcB": 1}
    # the match set must be broadcast into the catalog scan
    plan = formatted_plan(facet_counts(postings, corpus, TERMS, ["source"]))
    assert "BroadcastExchange" in plan


def test_msm_relaxes_and(postings, catalog, stats):
    strict = bm25_topk_msm(postings, catalog, stats, TERMS, len(TERMS), k=10)
    assert sorted(r["doc_id"] for r in strict.collect()) == [0, 1, 2]
    relaxed = bm25_topk_msm(postings, catalog, stats, TERMS, 2, k=10).collect()
    assert sorted(r["doc_id"] for r in relaxed) == [0, 1, 2, 4]
    # nt is reported and the msm predicate held
    assert all(r["nt"] >= 2 for r in relaxed)
    # scores descend with tie-break asc doc_id
    scores = [(r["score"], r["doc_id"]) for r in relaxed]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    # msm=1 is pure disjunctive: doc 3 (only 'spark') joins
    loose = bm25_topk_msm(postings, catalog, stats, TERMS, 1, k=10)
    assert sorted(r["doc_id"] for r in loose.collect()) == [0, 1, 2, 3, 4]


def test_more_like_this_excludes_seed(postings, catalog, stats):
    out = more_like_this(postings, catalog, stats, 0, m=3, k=10).collect()
    assert 0 not in {r["doc_id"] for r in out}
    assert len(out) > 0
    # deterministic across runs
    again = more_like_this(postings, catalog, stats, 0, m=3, k=10).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_suggest_terms_orders_by_df(postings, stats):
    out = suggest_terms(stats, "s", k=10).collect()
    # 'spark' df=4, 'slow' df=1 — df desc then term asc
    assert [r["term"] for r in out][0] == "spark"
    dfs = [r["df"] for r in out]
    assert dfs == sorted(dfs, reverse=True)
    assert suggest_terms(stats, "", k=10).count() == 0


def test_ngram_counts_exact(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r["ngram"]: r["count"] for r in ngram_counts(docs, 2, 1).collect()}
    # doc0: "a b","b a","a b"; doc1: "a b","b c"; doc2: none (len<2)
    assert out == {"a b": 3, "b a": 1, "b c": 1}
    cut = {r["ngram"]: r["count"] for r in ngram_counts(docs, 2, 2).collect()}
    assert cut == {"a b": 3}
    tri = {r["ngram"]: r["count"] for r in ngram_counts(docs, 3, 1).collect()}
    assert tri == {"a b a": 1, "b a b": 1, "a b c": 1}


def test_tfidf_topm_rank_and_truncation(postings):
    out = tfidf_topm(postings, m=2).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= 2
        ordered = sorted(rows, key=lambda r: r["rank"])
        vals = [(-r["tfidf"], r["term"]) for r in ordered]
        assert vals == sorted(vals)
    # rarer terms outrank stop-word-like ones: doc 3's 'only'/'here'
    # (df=1) must beat 'spark' (df=4)
    top3 = [r["term"] for r in sorted(per_doc[3], key=lambda r: r["rank"])]
    assert "spark" not in top3


def test_no_cartesian_anywhere(corpus, postings, catalog, stats):
    # the scorers crossJoin a SINGLE-ROW broadcast consts frame — that
    # renders as a BroadcastNestedLoopJoin of one row, which is the
    # intended cheap plan; a CartesianProduct (non-broadcast) is never OK
    for df in (
        scoped_conjunctive(postings, corpus, TERMS, source="srcA"),
        facet_counts(postings, corpus, TERMS, ["source"]),
        bm25_topk_msm(postings, catalog, stats, TERMS, 2),
        more_like_this(postings, catalog, stats, 0, m=3),
        tfidf_topm(postings, m=2),
    ):
        assert "CartesianProduct" not in formatted_plan(df)
    # operators with no consts crossJoin must be BNLJ-free outright
    for df in (
        scoped_conjunctive(postings, corpus, TERMS, source="srcA"),
        facet_counts(postings, corpus, TERMS, ["source"]),
    ):
        assert "BroadcastNestedLoopJoin" not in formatted_plan(df)


# ----------------------------------------------------------------- BM25F
def test_field_postings_shape(spark):
    docs = spark.createDataFrame(
        [(1, "a b a", "t1"), (2, "b c", None)],
        "doc_id long, body string, title string",
    )
    from text_indexer_spark.operators.serving import field_postings

    fps = field_postings(docs, {"title": "title", "body": "body"})
    got = {(r["doc_id"], r["field"], r["term"]): r["tf"] for r in fps.collect()}
    assert got == {
        (1, "body", "a"): 2, (1, "body", "b"): 1, (1, "title", "t1"): 1,
        (2, "body", "b"): 1, (2, "body", "c"): 1,
    }


def test_bm25f_field_weight_changes_rank(spark):
    # doc 1 matches in the (short, boosted) title; doc 2 matches in the
    # body with equal tf — title weight must put doc 1 first, and with
    # the weights flipped doc 2 must win
    from text_indexer_spark.operators.serving import bm25f_topk, field_postings

    docs = spark.createDataFrame(
        [
            (1, "filler words here only", "needle"),
            (2, "needle filler words here", "other"),
        ],
        "doc_id long, body string, title string",
    )
    fps = field_postings(docs, {"title": "title", "body": "body"})
    top = bm25f_topk(fps, ["needle"], {"title": 5.0, "body": 1.0}, k=2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]
    flipped = bm25f_topk(fps, ["needle"], {"title": 0.1, "body": 5.0}, k=2).collect()
    assert [r["doc_id"] for r in flipped] == [2, 1]


def test_bm25f_empty_inputs(spark):
    from text_indexer_spark.operators.serving import bm25f_topk, field_postings

    docs = spark.createDataFrame([(1, "a", "b")], "doc_id long, body string, title string")
    fps = field_postings(docs, {"title": "title", "body": "body"})
    assert bm25f_topk(fps, [], {"body": 1.0}).count() == 0
    assert bm25f_topk(fps, ["a"], {}).count() == 0
    # unknown field weight key simply matches nothing
    assert bm25f_topk(fps, ["a"], {"nope": 1.0}).count() == 0


def test_bm25f_partial_weights_ignore_unweighted_fields(spark):
    # stats (df / avgdl / N) must be scoped to the weighted fields: a
    # partial weight map over a wider schema scores identically to the
    # same corpus with the unweighted field dropped entirely
    from text_indexer_spark.operators.serving import bm25f_topk, field_postings

    docs = spark.createDataFrame(
        [
            (1, "needle filler words", "needle needle needle spam spam"),
            (2, "needle other words here", "more spam spam spam spam spam"),
            (3, "clean words only here", "needle hiding in junk field"),
        ],
        "doc_id long, body string, junk string",
    )
    both = field_postings(docs, {"body": "body", "junk": "junk"})
    body_only = field_postings(docs, {"body": "body"})
    got = bm25f_topk(both, ["needle"], {"body": 2.0}, k=3, round_to=6).collect()
    want = bm25f_topk(body_only, ["needle"], {"body": 2.0}, k=3, round_to=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # doc 3 matches only in the unweighted field — it must not rank
    assert {r["doc_id"] for r in got} == {1, 2}
    # a weight key naming NO existing field is inert: mixed-known/
    # unknown weights score exactly like the known subset alone (the
    # unknown field contributes no postings, no lengths, no df)
    mixed = bm25f_topk(
        both, ["needle"], {"body": 2.0, "nope": 9.0}, k=3, round_to=6
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in mixed] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_suggest_terms_fuzzy(spark):
    from text_indexer_spark.operators.serving import suggest_terms_fuzzy

    stats = spark.createDataFrame(
        [("table", 90), ("tables", 40), ("cable", 30), ("chair", 5), ("tbl", 2)],
        "term string, df long",
    )
    # "tble": no prefix hit; fuzzy reaches table (del), tbl (ins) — NOT
    # tables (dist 2) or cable (dist 2)
    got = [(r["term"], r["df"]) for r in suggest_terms_fuzzy(stats, "tble").collect()]
    assert got == [("table", 90), ("tbl", 2)]
    # "tab": prefix hits dominate; fuzzy adds nothing in range
    got2 = [r["term"] for r in suggest_terms_fuzzy(stats, "tab").collect()]
    assert got2 == ["table", "tables"]
    assert suggest_terms_fuzzy(stats, "").count() == 0
