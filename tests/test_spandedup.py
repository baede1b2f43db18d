"""Exact repeated-substring (span) dedup — ``operators/spandedup.py``.

Brute-force twin for every property: a pure-Python re-implementation of
the rule (all n-token windows, count, union covered positions) checked
against the distributed operator on hand-built corpora, plus a
parallelism-independence differential (1 vs 7 partitions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import spandedup
from text_indexer_spark.tokenizer import tokenize_text


def _py_span_dedup(texts: dict[int, str], n: int, min_count: int = 2):
    """Oracle: dict id -> (n_tokens, n_removed, kept_tokens)."""
    toks = {i: tokenize_text(t) for i, t in texts.items()}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for s in range(len(ts) - n + 1):
            g = " ".join(ts[s : s + n])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for s in range(len(ts) - n + 1):
            if counts[" ".join(ts[s : s + n])] >= min_count:
                covered.update(range(s, s + n))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        out[i] = (len(ts), len(covered), kept)
    return out


def _run(spark, texts: dict[int, str], n: int, parts: int = 4):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    ).repartition(parts)
    stats = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in spandedup.span_dedup_stats(df, n=n).collect()
    }
    kept = {
        r["doc_id"]: r["text"]
        for r in spandedup.dedup_spans(df, n=n).collect()
    }
    return stats, kept


BOILER = "all rights reserved contact us for more information today"


def test_cross_doc_span_removed(spark):
    texts = {
        1: "alpha beta gamma " + BOILER + " delta epsilon",
        2: "zeta eta " + BOILER + " theta iota kappa",
        3: "unique words only here nothing repeats in this one doc",
    }
    n = 8
    stats, kept = _run(spark, texts, n)
    oracle = _py_span_dedup(texts, n)
    for i in texts:
        nt, nr, kt = oracle[i]
        assert stats[i] == (nt, nr), i
        assert kept.get(i, None) == (" ".join(kt) if kt else None), i
    # the boilerplate really was removed, the flanks survived
    assert "rights" not in kept[1] and "alpha beta gamma" in kept[1]
    assert stats[3] == (stats[3][0], 0)


def test_within_doc_repeat_counts(spark):
    # the paper's rule: within-document repetition alone triggers
    # removal (a doc that is the same sentence twice loses both copies)
    body = "one two three four five six seven eight"
    texts = {1: body + " " + body, 2: "totally different filler words"}
    stats, kept = _run(spark, texts, n=8)
    assert stats[1] == (16, 16)
    assert 1 not in kept  # fully-removed docs are dropped
    assert kept[2] == "totally different filler words"


def test_overlapping_spans_merge(spark):
    # two duplicated shingles overlapping by n-1 tokens cover a single
    # 9-token span, not 16 tokens
    seq = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    texts = {
        1: seq + " tail1 tail2",
        2: "head1 head2 " + seq,
    }
    n = 8
    stats, kept = _run(spark, texts, n)
    oracle = _py_span_dedup(texts, n)
    for i in texts:
        assert stats[i] == oracle[i][:2]
        assert kept[i] == " ".join(oracle[i][2])
    assert stats[1] == (11, 9) and kept[1] == "tail1 tail2"


def test_short_docs_pass_through(spark):
    texts = {1: "same short thing", 2: "same short thing", 3: ""}
    stats, kept = _run(spark, texts, n=8)
    # < n tokens: no shingles, nothing removed, text re-emitted at
    # token grain; empty docs have no tokens and are absent
    assert stats[1] == (3, 0) and kept[1] == "same short thing"
    assert stats[2] == (3, 0) and kept[2] == "same short thing"
    assert 3 not in stats and 3 not in kept


def test_min_count_threshold(spark):
    texts = {
        1: "w1 w2 w3 w4 w5 w6 w7 w8",
        2: "w1 w2 w3 w4 w5 w6 w7 w8",
        3: "w1 w2 w3 w4 w5 w6 w7 w8",
    }
    stats3, kept3 = _run(spark, texts, n=8)
    assert all(stats3[i] == (8, 8) for i in texts) and not kept3
    # min_count=4: three occurrences survive
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    st = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in spandedup.span_dedup_stats(df, n=8, min_count=4).collect()
    }
    assert all(st[i] == (8, 0) for i in texts)


def test_tokenizer_grain_identity(spark):
    # delimiters collapse and case folds BEFORE span identity — the
    # rule fires on token streams, not raw bytes
    texts = {
        1: "The  QUICK-brown fox: jumps over the lazy dog now",
        2: "the quick brown fox jumps over the lazy dog later",
    }
    n = 9
    stats, kept = _run(spark, texts, n)
    oracle = _py_span_dedup(texts, n)
    for i in texts:
        assert stats[i] == oracle[i][:2]
    assert stats[1][1] == 9  # the 9-token prefix span is shared


def test_parallelism_independence(spark):
    # same corpus, 1 vs 7 partitions — byte-identical result sets
    texts = {
        i: (BOILER + f" filler{i} " + BOILER if i % 2 else f"solo text {i} " * 5)
        for i in range(20)
    }
    s1, k1 = _run(spark, texts, n=8, parts=1)
    s7, k7 = _run(spark, texts, n=8, parts=7)
    assert s1 == s7 and k1 == k7


def test_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "real words here")], "doc_id long, text string"
    )
    assert spandedup.span_dedup_stats(df, n=8).count() == 1
    assert spandedup.dedup_spans(df, n=8).count() == 1


def test_no_cartesian_or_python_in_plan(spark):
    df = spark.createDataFrame(
        [(1, BOILER), (2, BOILER)], "doc_id long, text string"
    )
    plan = spandedup.dedup_spans(df, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_property_differential(spark):
    """Property-based differential: on random tiny-alphabet corpora
    (every window collides with high probability — dense overlap
    unions, within-doc repeats, whole-doc drops) the distributed
    operator equals the pure-Python oracle exactly.  Few examples —
    each drives real Spark jobs — but the 2-word vocabulary makes
    every example adversarial for window overlap arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = st.lists(
        st.sampled_from(["aa", "bb"]), min_size=0, max_size=9
    ).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4), st.integers(2, 3))
    def check(docs, n):
        texts = {i: t for i, t in enumerate(docs)}
        oracle = _py_span_dedup(texts, n)
        stats, kept = _run(spark, texts, n, parts=3)
        for i, (nt, nr, ktoks) in oracle.items():
            if nt == 0:
                assert i not in stats  # tokenless docs emit no stats row
            else:
                assert stats[i] == (nt, nr)
            if ktoks:
                assert kept[i] == " ".join(ktoks)
            else:
                assert i not in kept  # fully-duplicated docs drop
        assert set(kept) <= set(texts)

    check()
