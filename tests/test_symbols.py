"""Symbol / definition extraction (operators/symbols.py)."""

from __future__ import annotations

import duckdb
import pytest

from text_indexer_spark.operators.symbols import (
    extract_symbols,
    search_symbol,
    symbol_postings,
)


@pytest.fixture(scope="module")
def code_docs(spark):
    return spark.createDataFrame(
        [
            (1, "kotlin",
             "fun main_loop(c: Int) {}\nclass Example { val snake_name = 1 }\n"
             "fun main_loop() {}"),
            (2, "python", "def parse(x):\n    pass\nclass Example:\n    pass"),
            (3, "en", "fun prose mention class Here"),
            (4, "java", "public class Example implements Foo { interface Bar {} }"),
        ],
        "doc_id long, lang string, text string",
    )


def test_extract_lang_routed(spark, code_docs):
    got = sorted(
        (r["doc_id"], r["kind"], r["symbol"])
        for r in extract_symbols(code_docs).collect()
    )
    assert got == [
        (1, "class", "Example"),
        (1, "function", "main_loop"),
        (1, "function", "main_loop"),  # overload kept with multiplicity
        (1, "value", "snake_name"),
        (2, "class", "Example"),
        (2, "function", "parse"),
        # doc 3: lang 'en' has no pattern set -> nothing
        (4, "class", "Example"),
        (4, "interface", "Bar"),
    ]


def test_extract_langless_union(spark, code_docs):
    got = sorted(
        (r["doc_id"], r["kind"], r["symbol"])
        for r in extract_symbols(
            code_docs.select("doc_id", "text"), lang_col=None
        ).collect()
    )
    # prose now matches too (documented false-positive tier)
    assert (3, "class", "Here") in got and (3, "function", "prose") in got
    assert (1, "value", "snake_name") in got


def test_postings_and_search(spark, code_docs):
    posts = {
        (r["symbol"], r["kind"], r["doc_id"]): r["n_defs"]
        for r in symbol_postings(code_docs).collect()
    }
    assert posts[("main_loop", "function", 1)] == 2
    assert posts[("Example", "class", 1)] == 1
    hits = [
        (r["doc_id"], r["n_defs"])
        for r in search_symbol(code_docs, "Example", kind="class").collect()
    ]
    assert hits == [(1, 1), (2, 1), (4, 1)]


def test_spark_matches_duckdb_patterns(spark, code_docs):
    """The gate's SQL pattern rendering must agree with the Spark
    operator on real code text, not just the derived corpus."""
    from text_indexer_spark.operators.symbols import SYMBOL_PATTERNS

    con = duckdb.connect()
    rows = code_docs.filter("lang = 'kotlin'").collect()
    for r in rows:
        for kind, regex in SYMBOL_PATTERNS["kotlin"]:
            want = con.execute(
                "SELECT regexp_extract_all(?, ?, 1)", [r["text"], regex]
            ).fetchone()[0]
            got = [
                x["symbol"]
                for x in extract_symbols(
                    spark.createDataFrame(
                        [(1, "kotlin", r["text"])],
                        "doc_id long, lang string, text string",
                    )
                ).collect()
                if x["kind"] == kind
            ]
            assert got == want, (kind, regex)


@pytest.mark.parametrize("name", ["symbol_postings", "search_symbol"])
def test_driver_gate_matches_oracle(spark, name):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    sdf = entry.queries()[name](spark, sf)
    cols = sorted(sdf.columns)
    got = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    res = con.execute(entry.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    want = sorted(
        tuple(r[dcols.index(c)] for c in cols) for r in res.fetchall()
    )
    assert got == want
