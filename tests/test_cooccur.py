"""Term co-occurrence / PMI vs hand-computed truth."""

from __future__ import annotations

import math

from text_indexer_spark.operators.cooccur import term_cooccurrence


def test_pmi_hand_computed(spark):
    # 4 docs: (x,y) always together → PMI>0; (x,z) once of x:3,z:2 → below chance
    docs = spark.createDataFrame(
        [
            (0, "x y"),
            (1, "x y"),
            (2, "x z q"),
            (3, "z w"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["term_a"], r["term_b"]): (r["pair_df"], r["pmi"])
        for r in term_cooccurrence(docs, min_pair_df=1, min_term_df=1).collect()
    }
    n = 4
    # x df=3, y df=2, pair (x,y) df=2
    assert got[("x", "y")][0] == 2
    assert abs(got[("x", "y")][1] - round(math.log(n * 2 / (3 * 2)), 4)) < 1e-9
    # (x,z): pair 1, x 3, z 2 → log(4/6) < 0
    assert got[("x", "z")][1] < 0
    # vocabulary df filter removes hapax pairs
    filtered = term_cooccurrence(docs, min_pair_df=1, min_term_df=2)
    keys = {(r["term_a"], r["term_b"]) for r in filtered.collect()}
    assert all("q" not in k and "w" not in k for k in keys)


def test_pair_df_floor(spark):
    docs = spark.createDataFrame(
        [(i, "a b" if i % 2 == 0 else "a c") for i in range(6)],
        "doc_id long, text string",
    )
    got = {(r["term_a"], r["term_b"]) for r in term_cooccurrence(docs, min_pair_df=3).collect()}
    assert got == {("a", "b"), ("a", "c")}  # (b,c) never co-occurs


def test_expansion_terms_and_search(spark):
    from text_indexer_spark.operators.cooccur import (
        expansion_terms,
        search_expanded,
        term_cooccurrence,
    )

    docs = spark.createDataFrame(
        [
            (1, "coffee milk sugar"),
            (2, "coffee milk"),
            (3, "coffee milk cup"),
            (4, "tea leaf"),
            (5, "coffee cup"),
        ],
        "doc_id long, text string",
    )
    cooc = term_cooccurrence(docs, min_pair_df=2, min_term_df=1)
    exp = [r["term"] for r in expansion_terms(cooc, "coffee", k=2).collect()]
    # milk co-occurs with coffee in 3 docs, cup in 2 -> milk first
    assert exp[0] == "milk"
    assert len(exp) == 2

    posts = (
        docs.select(
            "doc_id",
            __import__("pyspark.sql.functions", fromlist=["explode"]).explode(
                __import__("pyspark.sql.functions", fromlist=["split"]).split("text", " ")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .count()
        .withColumnRenamed("count", "tf")
    )
    got = {
        r["doc_id"]: r["n_terms"]
        for r in search_expanded(posts, cooc, "coffee", k_expand=1).collect()
    }
    # expansion set = {coffee, milk}: doc4 (tea) excluded; doc1-3 match
    # both, doc5 matches coffee only
    assert got == {1: 2, 2: 2, 3: 2, 5: 1}
