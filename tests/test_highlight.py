"""Snippets, regex grep, prefix/wildcard term queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_indexer_spark.operators.highlight import NO_MATCH, regex_grep, snippets
from text_indexer_spark.operators.search import prefix_match, wildcard_match


def _corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three beta four five"),
        (3, "no hits here at all"),
        (4, "beta at the very start of this document body text"),
        (5, "numbers 42 and 7 appear 3 times"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snippet_window_and_first_pos(spark):
    out = {
        r["doc_id"]: r
        for r in snippets(_corpus(spark), ["beta", "five"], window=2).collect()
    }
    assert set(out) == {1, 2, 4}
    # doc 1: beta at token 2 (1-based), window 2 → tokens 1..4
    assert out[1]["first_pos"] == 2
    assert out[1]["snippet"] == "alpha beta gamma delta"
    # doc 2: beta (pos 4) occurs before five (pos 6) → earliest wins
    assert out[2]["first_pos"] == 4
    assert out[2]["snippet"] == "two three beta four five"
    # doc 4: hit at position 1 → left edge clamps
    assert out[4]["first_pos"] == 1
    assert out[4]["snippet"] == "beta at the"


def test_snippet_empty_query(spark):
    assert snippets(_corpus(spark), [], window=2).count() == 0


def test_snippet_no_match_sentinel_excluded(spark):
    res = snippets(_corpus(spark), ["zzz"], window=2).collect()
    assert res == []
    assert NO_MATCH == 2_147_483_647


def test_regex_grep_counts(spark):
    out = {r["doc_id"]: r["n_matches"] for r in regex_grep(_corpus(spark), "[0-9]+").collect()}
    assert out == {5: 3}


def _postings(spark):
    rows = [
        ("stream", 1, 2),
        ("storm", 1, 1),
        ("stream", 2, 1),
        ("alpha", 2, 5),
        ("steam", 3, 4),
        ("beta", 3, 1),
    ]
    return spark.createDataFrame(rows, "term string, doc_id long, tf long")


def test_prefix_match(spark):
    out = {
        r["doc_id"]: (r["n_terms"], r["total_tf"])
        for r in prefix_match(_postings(spark), "st").collect()
    }
    assert out == {1: (2, 3), 2: (1, 1), 3: (1, 4)}
    assert prefix_match(_postings(spark), "").count() == 0


def test_wildcard_match_with_infix(spark):
    # s%m matches stream, storm, steam
    out = {
        r["doc_id"]: (r["n_terms"], r["total_tf"])
        for r in wildcard_match(_postings(spark), "s%m").collect()
    }
    assert out == {1: (2, 3), 2: (1, 1), 3: (1, 4)}
    # pattern with no literal prefix still works (vocabulary-scan path)
    out2 = {
        r["doc_id"]: r["n_terms"]
        for r in wildcard_match(_postings(spark), "%eam").collect()
    }
    assert out2 == {1: 1, 2: 1, 3: 1}


def test_prefix_pushdown_reaches_scan(spark, tmp_path):
    """StartsWith must appear in PushedFilters of the parquet scan."""
    p = str(tmp_path / "postings_pq")
    _postings(spark).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("term").startswith("st"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith(term,st)" in plan, plan


def test_grep_lines_multiline(spark):
    from text_indexer_spark.operators.highlight import grep_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha query\nquery beta\nno hit"),
            (2, "nothing"),
            (3, "quick\n\nquery"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["line_no"], r["line"])
        for r in grep_lines(docs, "qu[a-z]+").collect()
    )
    assert got == [
        (1, 1, "alpha query"),
        (1, 2, "query beta"),
        (3, 1, "quick"),
        (3, 3, "query"),
    ]
