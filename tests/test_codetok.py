"""Code-identifier tokenization (operators/codetok.py).

Three-way agreement is the contract: the Spark codegen splitter, the
Python mirror, and the DuckDB oracle rendering must produce identical
token streams for any input — hypothesis drives that; golden cases pin
the rules themselves.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from text_indexer_spark.operators.codetok import (
    duckdb_camelcase_sql,
    duckdb_ident_tokens_sql,
    ident_postings,
    ident_tokenize_series,
    split_identifiers_column,
    split_identifiers_text,
)

GOLDEN = {
    # snake + camel + acronym-run, the motivating case
    "parseHTTPRequest_fooBar2Baz": [
        "parse", "http", "request", "foo", "bar2", "baz",
    ],
    # digits stay attached to their letters
    "utf8 v2 sha256sum": ["utf8", "v2", "sha256sum"],
    # acronym at end of identifier stays one token
    "servesHTTP": ["serves", "http"],
    # pure snake
    "shard_offset__tmp": ["shard", "offset", "tmp"],
    # punctuation and operators all separate
    "a.b(c,d)->e[f]": ["a", "b", "c", "d", "e", "f"],
    # lone delimiters / empty
    "___": [],
    "": [],
    # already-lowercase words pass through
    "plain words here": ["plain", "words", "here"],
}


def test_golden_python():
    for raw, want in GOLDEN.items():
        assert split_identifiers_text(raw) == want, raw


def test_golden_spark(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, raw in enumerate(GOLDEN)], "i int, s string"
    ).select("i", split_identifiers_column("s").alias("toks"))
    got = {r["i"]: r["toks"] for r in df.collect()}
    for i, (raw, want) in enumerate(GOLDEN.items()):
        assert got[i] == want, raw


def test_golden_duckdb():
    con = duckdb.connect()
    expr = duckdb_ident_tokens_sql("s")
    for raw, want in GOLDEN.items():
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS s)", [raw]
        ).fetchone()[0]
        assert got == want, raw


def test_pandas_variant_matches_python():
    import pandas as pd

    texts = pd.Series(list(GOLDEN) + [None])
    out = ident_tokenize_series(texts)
    for raw, got in zip(GOLDEN, out):
        assert got == split_identifiers_text(raw)
    assert out.iloc[-1] == []  # nulls tokenize to nothing


# identifier-ish alphabet plus the separators the rules care about
_IDENT_CHARS = st.sampled_from(
    list("abcXYZ09_ .-(")
)
_IDENT_TEXT = st.text(alphabet=_IDENT_CHARS, min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(_IDENT_TEXT)
def test_python_equals_duckdb(raw: str):
    con = duckdb.connect()
    expr = duckdb_ident_tokens_sql("s")
    got = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [raw]).fetchone()[0]
    assert got == split_identifiers_text(raw)


def test_spark_equals_python_random(spark):
    import random

    rng = random.Random(7)
    chars = "abcXYZ09_ .-("
    rows = [
        (i, "".join(rng.choice(chars) for _ in range(rng.randrange(0, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "i int, s string").select(
        "i", split_identifiers_column("s").alias("toks")
    )
    got = {r["i"]: r["toks"] for r in df.collect()}
    for i, raw in rows:
        assert got[i] == split_identifiers_text(raw), raw


def test_ident_postings_counts(spark):
    df = spark.createDataFrame(
        [(1, "fooBar foo_bar FOOBar"), (2, "x")], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in ident_postings(df).collect()
    }
    # fooBar -> foo bar; foo_bar -> foo bar; FOOBar -> foo bar
    # (acronym rule: "FOOBar" -> "FOO Bar")
    assert rows == {(1, "foo"): 3, (1, "bar"): 3, (2, "x"): 1}


def test_camelcase_column_matches_duckdb(spark):
    from text_indexer_spark.operators.codetok import camelcase_column
    from text_indexer_spark.tokenizer import duckdb_tokens_sql, tokenize_column

    texts = ["key agg a a the row", "one", "", "x y"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, s string"
    ).select("i", camelcase_column(tokenize_column(F.col("s"))).alias("c"))
    got = {r["i"]: r["c"] for r in df.collect()}
    con = duckdb.connect()
    expr = duckdb_camelcase_sql(duckdb_tokens_sql("s"))
    for i, t in enumerate(texts):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS s)", [t]
        ).fetchone()[0]
        assert got[i] == want, t


def test_lang_routing_code(spark):
    """'code' rows route to the identifier splitter inside the one
    mapInPandas pass; other langs keep the delimiter tokenizer."""
    from text_indexer_spark.operators.langroute import tokenize_postings_by_lang

    df = spark.createDataFrame(
        [
            (1, "code", "fooBar baz_qux"),
            (2, "en", "fooBar baz_qux"),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokenize_postings_by_lang(df).collect()
    }
    assert rows[(1, "foo")] == 1 and rows[(1, "bar")] == 1
    assert rows[(1, "baz")] == 1 and rows[(1, "qux")] == 1
    # default tokenizer: _ is not a delimiter, case is preserved→lowered
    assert rows[(2, "foobar")] == 1 and rows[(2, "baz_qux")] == 1
    assert (1, "foobar") not in rows


def test_no_python_in_codegen_path(spark):
    """The Spark splitter is pure expression work: no BatchEvalPython /
    ArrowEvalPython nodes in the plan."""
    df = spark.range(5).select(
        split_identifiers_column(F.lit("aB_c")).alias("t")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


@pytest.mark.parametrize("name", ["code_ident_postings", "search_code_ident"])
def test_driver_gate_matches_oracle(spark, name):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    sdf = entry.queries()[name](spark, sf)
    cols = sorted(sdf.columns)
    got = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    res = con.execute(entry.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    want = sorted(
        tuple(r[dcols.index(c)] for c in cols) for r in res.fetchall()
    )
    assert got == want
