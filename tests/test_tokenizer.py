"""Tokenizer parity tests — golden case from the reference
(``DocumentTokenizerTest.kt:8-39``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import (
    tokenize_column,
    tokenize_series,
    tokenize_text,
)

GOLDEN_IN = (
    '"This isn\'t really death," Tyler says. "We\'ll be legend. We won\'t grow old."'
)
GOLDEN_OUT = [
    "this", "isn", "t", "really", "death", "tyler", "says",
    "we", "ll", "be", "legend", "we", "won", "t", "grow", "old",
]


def test_golden_python():
    assert tokenize_text(GOLDEN_IN) == GOLDEN_OUT


def test_golden_pandas():
    out = tokenize_series(pd.Series([GOLDEN_IN])).iloc[0]
    assert out == GOLDEN_OUT


def test_golden_spark(spark):
    df = spark.createDataFrame([(GOLDEN_IN,)], ["text"])
    got = df.select(tokenize_column("text").alias("toks")).head()["toks"]
    assert got == GOLDEN_OUT


def test_underscore_digits_kept(spark):
    # _ and digits are NOT delimiters (DocumentTokenizer.kt:21)
    s = "snake_case_2 count_2+41 a-b x.y"
    assert tokenize_text(s) == ["snake_case_2", "count_2+41", "a", "b", "x", "y"]
    df = spark.createDataFrame([(s,)], ["text"])
    got = df.select(tokenize_column("text").alias("toks")).head()["toks"]
    assert got == tokenize_text(s)


def test_empty_and_delim_only(spark):
    assert tokenize_text("") == []
    assert tokenize_text(" .,;: \t\n") == []
    df = spark.createDataFrame([("",), (" .,;: \t\n",)], ["text"])
    rows = df.select(tokenize_column("text").alias("toks")).collect()
    assert [r["toks"] for r in rows] == [[], []]


def test_arrow_postings_equivalent_to_pandas():
    """The Arrow-native build tokenizer (tokenize_postings_arrays) must
    produce the same (doc, term) -> tf map and per-doc lengths as
    tokenize_series + explode + group, including Unicode and edge rows."""
    from text_indexer_spark.tokenizer import tokenize_postings_arrays

    texts = pd.Series([
        GOLDEN_IN,
        "", None, "a b a b a C c? (c)  ",
        "under_score digit9 mix-9_x",
        "  \t\n", "tab\tsep\nnew\r\nline\x0cff",
        "ümlaut Ärger STRASSE ß café café",
        "x-y/z.w,v;u:t(s)r`q<p>o'n!m?l\"k",
    ])
    toks = tokenize_series(texts)
    exp = {}
    for i, lst in enumerate(toks):
        for t in lst:
            exp[(i, t)] = exp.get((i, t), 0) + 1
    doc_idx, terms, tfs, lens = tokenize_postings_arrays(texts)
    got = {(int(d), t): int(f) for d, t, f in zip(doc_idx, terms, tfs)}
    assert got == exp
    assert [len(l) for l in toks] == list(lens)


def test_arrow_postings_empty_batch():
    from text_indexer_spark.tokenizer import tokenize_postings_arrays

    doc_idx, terms, tfs, lens = tokenize_postings_arrays(pd.Series([], dtype="object"))
    assert len(doc_idx) == len(terms) == len(tfs) == len(lens) == 0
