"""Unified query DSL: parser, DataFrame evaluator, committed-index
evaluator — all differential-tested against a brute-force python oracle
over the same tokenizer."""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.boolean import And, Not, Or, Term
from text_indexer_spark.operators.index_build import build_index, load_posting_lists
from text_indexer_spark.operators.querylang import (
    Fuzzy,
    Near,
    Phrase,
    Prefix,
    Wildcard,
    dsl_bm25_topk,
    leaves_of,
    match_query,
    match_query_index,
    parse_dsl,
    positive_score_terms,
    satisfiable_all_false,
    wildcard_regex,
)
from text_indexer_spark.tokenizer import tokenize_text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown dog and a quick brown fox"),
    (2, "the fox. the brown! quick, quick brown"),
    (3, "brown quick fox"),
    (4, "nothing relevant here at all"),
    (5, "fox quick brown quick fox brown quick brown fox"),
    (6, "quickly browse the foxhole"),
    (7, "the dog sleeps"),
    (8, ""),
]

QUERIES = [
    '"quick brown" AND fox',
    '"quick brown fox"',
    'quick* AND NOT dog',
    'fox (br* OR lazy)',
    '"brown fox" OR "brown dog"',
    'qu?ck AND brown',
    '(fox OR dog) AND NOT "quick brown"',
    'fox*',
    '"the quick" br*n',
    '"fox dog"~4',
    '"quick fox"~3 AND NOT lazy',
    '("brown dog"~2 OR "brown fox"~2) quick',
    "quik~ AND brown",
    "foxx~1 AND NOT dog",
    '"quick brown" OR dg~',
    "lazi~ lazy~0",
]


def _py_eval(node, toks: list[str]) -> bool:
    if isinstance(node, Term):
        return node.term in toks
    if isinstance(node, Phrase):
        L = len(node.terms)
        return any(
            tuple(toks[i:i + L]) == node.terms
            for i in range(len(toks) - L + 1)
        )
    if isinstance(node, Near):
        sets = []
        for t in dict.fromkeys(node.terms):
            posl = [i for i, x in enumerate(toks) if x == t]
            if not posl:
                return False
            cov = set()
            for p in posl:
                cov.update(range(max(p - node.window + 1, 0), p + 1))
            sets.append(cov)
        return bool(set.intersection(*sets))
    if isinstance(node, Prefix):
        return any(t.startswith(node.prefix) for t in toks)
    if isinstance(node, Wildcard):
        rx = re.compile(wildcard_regex(node.pattern))
        return any(rx.match(t) for t in toks)
    if isinstance(node, Fuzzy):
        from text_indexer_spark.operators.fuzzy import within_one_edit

        return any(within_one_edit(t, node.term) for t in toks)
    if isinstance(node, Not):
        return not _py_eval(node.child, toks)
    if isinstance(node, And):
        return all(_py_eval(c, toks) for c in node.children)
    return any(_py_eval(c, toks) for c in node.children)


def _expected(query: str) -> set[int]:
    node = parse_dsl(query)
    return {
        i for i, text in DOCS if _py_eval(node, tokenize_text(text))
    }


# ------------------------------------------------------------- parser

def test_parse_phrase_prefix_wildcard():
    n = parse_dsl('"quick brown" AND fo* AND NOT d?g')
    assert isinstance(n, And)
    kinds = [type(c).__name__ for c in n.children]
    assert kinds == ["Phrase", "Prefix", "Not"]
    assert n.children[0].terms == ("quick", "brown")
    assert n.children[1].prefix == "fo"
    assert isinstance(n.children[2].child, Wildcard)


def test_parse_single_word_phrase_is_term():
    assert parse_dsl('"fox"') == Term("fox")


def test_parse_multi_token_word_is_phrase():
    # foo.bar indexed as consecutive tokens -> matches as that phrase
    assert parse_dsl("foo.bar") == Phrase(("foo", "bar"))


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_dsl('"unterminated')
    with pytest.raises(ValueError):
        parse_dsl("*")
    with pytest.raises(ValueError):
        parse_dsl("a.b?")  # delimiter char inside a wildcard literal
    with pytest.raises(ValueError):
        parse_dsl('""')
    with pytest.raises(ValueError):
        parse_dsl("fox AND")
    # trailing-star prefix with punctuation stem is rejected
    with pytest.raises(ValueError):
        parse_dsl("a.b*")
    # inner * is a wildcard, not a prefix
    assert parse_dsl("qu*ck*") == Wildcard("qu*ck*")
    # fuzzy: only radius <= 2; no wildcard chars in the stem
    with pytest.raises(ValueError):
        parse_dsl("fox~3")
    with pytest.raises(ValueError):
        parse_dsl("fo*~")


def test_parse_fuzzy():
    assert parse_dsl("Fox~") == Fuzzy("fox")
    assert parse_dsl("fox~1") == Fuzzy("fox")
    assert parse_dsl("fox~0") == Term("fox")
    # fuzzy leaves filter but never rank
    assert positive_score_terms(parse_dsl("fox~ AND dog")) == ["dog"]


def test_satisfiable_all_false_and_score_terms():
    n = parse_dsl('NOT fox')
    assert satisfiable_all_false(n)
    n2 = parse_dsl('"quick brown" AND NOT dog AND fo*')
    assert not satisfiable_all_false(n2)
    assert positive_score_terms(n2) == ["quick", "brown"]


# --------------------------------------------------------- evaluators

@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    posts = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .cache()
    )
    return docs, posts


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    rows = [(f"r", f"d{i:02d}.txt", "c1", "txt", t) for i, t in DOCS]
    cdf = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = str(tmp_path_factory.mktemp("dsl_idx"))
    build_index(cdf, out, num_shards=3, with_positions=True)
    # engine doc_id == row order == our doc_id (paths sort by i)
    return out


@pytest.mark.parametrize("query", QUERIES)
def test_match_query_dataframe(spark, corpus, query):
    docs, posts = corpus
    got = {
        r["doc_id"]
        for r in match_query(posts, query, docs=docs).collect()
    }
    assert got == _expected(query), query


@pytest.mark.parametrize("query", QUERIES)
def test_match_query_index(spark, corpus, pos_index, query):
    from text_indexer_spark.operators.index_build import load_catalog

    inv = {
        r["doc_id"]: int(r["path"][1:3])
        for r in load_catalog(spark, pos_index).collect()
    }
    lists = load_posting_lists(spark, pos_index)
    got = {
        inv[r["doc_id"]]
        for r in match_query_index(lists, query).collect()
    }
    assert got == _expected(query), query


def test_not_universe_path(spark, corpus):
    docs, posts = corpus
    got = {
        r["doc_id"]
        for r in match_query(
            posts, "NOT fox", catalog=docs.select("doc_id")
        ).collect()
    }
    assert got == _expected("NOT fox")  # incl. the empty doc
    with pytest.raises(ValueError):
        match_query(posts, "NOT fox")
    with pytest.raises(ValueError):
        match_query_index(posts.limit(0), "NOT fox")


def test_phrase_requires_positional(spark, corpus, tmp_path):
    rows = [("r", f"d{i}.txt", "c", "txt", t) for i, t in DOCS[:4]]
    cdf = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = str(tmp_path / "plain")
    build_index(cdf, out, num_shards=2, with_positions=False)
    with pytest.raises(ValueError, match="positional"):
        match_query_index(load_posting_lists(spark, out), '"quick brown"')


def test_dsl_ranked_index_matches_relational(spark, corpus, pos_index):
    """Index-served ranked DSL ≡ the relational scorer (ids + scores),
    including phrase filtering and score-term restriction."""
    from text_indexer_spark.operators.index_build import (
        load_catalog,
        load_posting_lists,
    )
    from text_indexer_spark.operators.querylang import dsl_bm25_topk_index

    from text_indexer_spark.tokenizer import tokenize_column

    docs, posts = corpus
    # N and avgdl must include the empty doc — the committed index's
    # stored weights were computed over the whole corpus
    cat = docs.select(
        "doc_id", F.size(tokenize_column("text")).cast("double").alias("doc_len")
    )
    stats = posts.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    inv = {
        r["doc_id"]: int(r["path"][1:3])
        for r in load_catalog(spark, pos_index).collect()
    }
    lists = load_posting_lists(spark, pos_index)
    for q in ['"quick brown" AND fox', 'fox (br* OR lazy) quick',
              '"brown fox" OR "brown dog"']:
        rel = {
            (r["doc_id"], round(r["score"], 6))
            for r in dsl_bm25_topk(
                posts, cat, stats, q, docs=docs, k=20, round_to=6
            ).collect()
        }
        idx = {
            (inv[r["doc_id"]], round(r["score"], 6))
            for r in dsl_bm25_topk_index(lists, q, k=20, round_to=6).collect()
        }
        assert idx == rel, q


def test_dsl_ranked_index_drops_scoreless_matches(spark, pos_index):
    """A doc matched only via a non-scoring leaf (wildcard arm of an OR)
    must not appear — same semantics as the relational path."""
    from text_indexer_spark.operators.index_build import (
        load_catalog,
        load_posting_lists,
    )
    from text_indexer_spark.operators.querylang import (
        dsl_bm25_topk_index,
        match_query_index,
    )

    inv = {
        r["doc_id"]: int(r["path"][1:3])
        for r in load_catalog(spark, pos_index).collect()
    }
    lists = load_posting_lists(spark, pos_index)
    q = '"quick brown" OR sleep*'
    all_matches = {
        inv[r["doc_id"]] for r in match_query_index(lists, q).collect()
    }
    ranked = {
        inv[r["doc_id"]]
        for r in dsl_bm25_topk_index(lists, q, k=50).collect()
    }
    assert 7 in all_matches  # "the dog sleeps" matches sleep*
    assert 7 not in ranked  # ...but has no quick/brown to score by
    assert ranked == {i for i in all_matches if i != 7}


def test_dsl_bm25_topk_rank(spark, corpus):
    docs, posts = corpus
    cat = posts.groupBy("doc_id").agg(
        F.sum("tf").cast("double").alias("doc_len")
    )
    stats = posts.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = dsl_bm25_topk(
        posts, cat, stats, '"quick brown" AND NOT dog', docs=docs, k=5
    ).collect()
    ids = [r["doc_id"] for r in top]
    # filter semantics: only docs with the phrase and without 'dog'
    assert set(ids) <= _expected('"quick brown" AND NOT dog')
    # scores are over quick+brown and descending
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError):
        dsl_bm25_topk(posts, cat, stats, "qu* AND NOT dog", docs=docs)


# ----------------------------------------------- randomized differential

def _random_tree(rng, depth=0):
    """Seeded random query AST over the fixture vocabulary — exercises
    operator nesting the hand-written QUERIES list can't cover."""
    vocab = ["quick", "brown", "fox", "dog", "lazy", "the"]
    typos = ["quik", "foxx", "dg", "brwn"]
    r = rng.random()
    if depth >= 3 or r < 0.45:
        kind = rng.randrange(5)
        if kind == 0:
            return Term(rng.choice(vocab))
        if kind == 1:
            return Prefix(rng.choice(["qu", "bro", "fo", "d"]))
        if kind == 2:
            return Wildcard(rng.choice(["f?x", "qu*k", "br*n", "*og"]))
        if kind == 3:
            return Fuzzy(rng.choice(typos))
        return Phrase(tuple(rng.choice([["quick", "brown"], ["brown", "fox"],
                                        ["the", "lazy", "dog"]])))
    if r < 0.6:
        return Not(_random_tree(rng, depth + 1))
    kids = tuple(_random_tree(rng, depth + 1) for _ in range(rng.randrange(2, 4)))
    return And(kids) if r < 0.8 else Or(kids)


def test_random_trees_match_python_oracle(spark, corpus):
    import random

    from text_indexer_spark.tokenizer import tokenize_text as tt

    docs, posts = corpus
    rng = random.Random(20260817)
    cat = docs.select("doc_id")
    for _ in range(12):
        node = _random_tree(rng)
        expected = {i for i, text in DOCS if _py_eval(node, tt(text))}
        got = {
            r["doc_id"]
            for r in match_query(posts, node, docs=docs, catalog=cat).collect()
        }
        assert got == expected, node


def test_snippets_for_query(spark, corpus):
    from text_indexer_spark.operators.highlight import snippets_for_query

    docs, posts = corpus
    got = {
        r["doc_id"]: r["snippet"]
        for r in snippets_for_query(
            docs, posts, '"quick brown" AND NOT dog', window=1
        ).collect()
    }
    # docs 0,1,2,5 contain the phrase (delimiters collapse in doc 2);
    # 0 and 1 also contain "dog" -> {2, 5}
    assert set(got) == {2, 5}
    # earliest positive-term hit: doc 2 "brown"@4, doc 5 "quick"@2
    assert got[2] == "the brown quick"
    assert got[5] == "fox quick brown"
    # no positively-used exact terms -> nothing to highlight
    assert snippets_for_query(docs, posts, "qu* OR f?x", window=1).count() == 0
