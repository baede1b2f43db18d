"""Boolean query trees: parser, satisfiability analysis, one-scan
DataFrame evaluation, committed-index kernel ≡ DataFrame path."""
from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.boolean import (
    And,
    Not,
    Or,
    Term,
    boolean_bm25_topk,
    boolean_match,
    boolean_match_index,
    leaf_terms,
    parse_query,
    satisfiable_all_false,
)

DOCS = [
    (0, "spark join window"),
    (1, "spark join"),
    (2, "window filter"),
    (3, "dup dup dup"),
    (4, "spark window dup"),
    (5, "plain text here"),
    (6, "join"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def postings(spark, corpus):
    from text_indexer_spark.tokenizer import tokenize_column

    return (
        corpus.select("doc_id", F.explode(tokenize_column("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .cache()
    )


# ------------------------------------------------------------- parser

def test_parser_precedence_and_adjacency():
    assert parse_query("a AND b OR c") == Or((And((Term("a"), Term("b"))), Term("c")))
    # adjacency = AND, NOT binds tightest
    assert parse_query("a b") == And((Term("a"), Term("b")))
    assert parse_query("NOT a b") == And((Not(Term("a")), Term("b")))
    assert parse_query("a OR NOT (b c)") == Or(
        (Term("a"), Not(And((Term("b"), Term("c")))))
    )
    # keywords case-insensitive; words tokenized by the engine tokenizer
    assert parse_query("Spark And JOIN") == And((Term("spark"), Term("join")))
    assert parse_query("foo.bar") == And((Term("foo"), Term("bar")))


@pytest.mark.parametrize(
    "bad", ["", "AND a", "a AND", "(a", "a)", "a OR", "NOT", "a (b", "?!"]
)
def test_parser_rejects(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_leaf_terms_and_satisfiability():
    n = parse_query("a AND (b OR c) AND NOT d")
    assert leaf_terms(n) == ["a", "b", "c", "d"]
    assert not satisfiable_all_false(n)
    assert satisfiable_all_false(parse_query("NOT a"))
    assert satisfiable_all_false(parse_query("a OR NOT b"))
    assert not satisfiable_all_false(parse_query("a OR (b AND NOT c)"))


# ------------------------------------------- brute-force differential

def _truth(doc_text: str, query: str) -> bool:
    words = set(doc_text.split())
    node = parse_query(query)

    def ev(n):
        if isinstance(n, Term):
            return n.term in words
        if isinstance(n, Not):
            return not ev(n.child)
        vals = [ev(c) for c in n.children]
        return all(vals) if isinstance(n, And) else any(vals)

    return ev(node)


QUERIES = [
    "spark AND join",
    "spark join window",
    "spark OR filter",
    "spark AND (join OR window) AND NOT dup",
    "(spark OR filter) AND NOT (join OR dup)",
    "join AND NOT NOT spark",
]

UNIVERSE_QUERIES = ["NOT dup", "spark OR NOT join", "NOT (spark OR join OR dup)"]


@pytest.mark.parametrize("q", QUERIES)
def test_match_vs_bruteforce(spark, corpus, postings, q):
    got = sorted(r["doc_id"] for r in boolean_match(postings, q).collect())
    want = sorted(d for d, t in DOCS if _truth(t, q))
    assert got == want, q


@pytest.mark.parametrize("q", UNIVERSE_QUERIES)
def test_universe_queries_need_catalog(spark, corpus, postings, q):
    with pytest.raises(ValueError, match="universe"):
        boolean_match(postings, q)
    got = sorted(
        r["doc_id"] for r in boolean_match(postings, q, catalog=corpus).collect()
    )
    want = sorted(d for d, t in DOCS if _truth(t, q))
    assert got == want, q


def test_exhaustive_three_term_expressions(spark, corpus, postings):
    """Every AND/OR/NOT shape over three terms, both evaluation paths."""
    shapes = [
        "{a} AND ({b} OR {c})",
        "({a} OR {b}) AND NOT {c}",
        "{a} OR ({b} AND {c})",
        "{a} AND {b} AND NOT {c}",
    ]
    for shape, (a, b, c) in itertools.product(
        shapes, itertools.permutations(["spark", "join", "dup"], 3)
    ):
        q = shape.format(a=a, b=b, c=c)
        got = sorted(r["doc_id"] for r in boolean_match(postings, q).collect())
        want = sorted(d for d, t in DOCS if _truth(t, q))
        assert got == want, q


# ------------------------------------------------------ index serving

def test_index_path_equals_dataframe_path(spark, tmp_path_factory):
    from text_indexer_spark.operators.index_build import (
        build_index,
        load_posting_lists,
    )

    corpus = spark.createDataFrame(
        [("r", f"d{i:02d}.txt", "c", "t", t) for i, (_, t) in enumerate(DOCS)],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path_factory.mktemp("bool_idx"))
    build_index(corpus, out, num_shards=3)
    lists = load_posting_lists(spark, out)

    from text_indexer_spark.tokenizer import tokenize_column

    # engine ids: rebuild the postings frame with the engine catalog ids
    from text_indexer_spark.operators.index_build import load_catalog

    cat = load_catalog(spark, out)
    postings = (
        corpus.join(cat.select("doc_id", "path"), "path")
        .select("doc_id", F.explode(tokenize_column("content")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    for q in QUERIES:
        got = sorted(r["doc_id"] for r in boolean_match_index(lists, q).collect())
        want = sorted(r["doc_id"] for r in boolean_match(postings, q).collect())
        assert got == want, q
    with pytest.raises(ValueError, match="universe"):
        boolean_match_index(lists, "NOT dup")


# ------------------------------------------------------------ ranking

def test_boolean_topk_scores_positive_terms_only(spark, corpus, postings):
    cat = corpus.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("doc_len")
    )
    stats = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = boolean_bm25_topk(
        postings, cat, stats, "spark AND (join OR window) AND NOT dup", k=10
    ).collect()
    ids = [r["doc_id"] for r in top]
    assert set(ids) == {0, 1}  # doc 4 has dup, doc 2 lacks spark
    assert all(r["score"] > 0 for r in top)
    # scores descending, ties by doc_id
    assert ids == [r for _, r in sorted((-t["score"], t["doc_id"]) for t in top)]
