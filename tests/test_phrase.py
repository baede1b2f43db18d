"""Phrase / proximity matching vs hand-built truth."""

from __future__ import annotations

import pytest

from text_indexer_spark.operators.phrase import (
    phrase_match,
    positional_postings,
    proximity_match,
)

DOCS = [
    (0, "big data engines scale big data"),
    (1, "data big engines"),                  # reversed — no phrase
    (2, "big, data!"),                        # punctuation-separated → still the phrase
    (3, "big shiny data"),                    # gap — no phrase, but NEAR/3
    (4, "unrelated words entirely here"),
    (5, "Big Data uppercase"),                # tokenizer lowercases → phrase
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_positions_are_token_positions(docs):
    got = {
        (r["doc_id"], r["pos"]): r["term"]
        for r in positional_postings(docs).collect()
        if r["doc_id"] == 0
    }
    assert got[(0, 0)] == "big" and got[(0, 1)] == "data" and got[(0, 4)] == "big"


def test_phrase_exact_consecutive(spark, docs):
    got = sorted(r["doc_id"] for r in phrase_match(docs, ["big", "data"]).collect())
    assert got == [0, 2, 5]
    assert phrase_match(docs, ["data", "engines"]).count() == 1  # doc 0 only
    assert phrase_match(docs, []).count() == 0  # empty-phrase guard
    assert phrase_match(docs, ["zzz", "qqq"]).count() == 0


def test_phrase_three_terms(docs):
    got = sorted(r["doc_id"] for r in phrase_match(docs, ["big", "data", "engines"]).collect())
    assert got == [0]


def test_proximity_window(docs):
    # big NEAR/3 data: docs 0,2,3,5 (doc 3 has gap 2 < 3); doc 1 reversed still near
    got = sorted(r["doc_id"] for r in proximity_match(docs, ["big", "data"], window=3).collect())
    assert got == [0, 1, 2, 3, 5]
    # window=2 forces adjacency (either order)
    got2 = sorted(r["doc_id"] for r in proximity_match(docs, ["big", "data"], window=2).collect())
    assert got2 == [0, 1, 2, 5]
    assert proximity_match(docs, [], window=3).count() == 0
