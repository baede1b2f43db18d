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
