"""Dedup operators vs hand-computed truths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_near_pairs,
    token_shingles,
)
from text_indexer_spark.tokenizer import tokenize_text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),          # near dup of 0
    (3, "spark builds inverted indexes with posting lists fast"),
    (4, "completely different content about databases and queries"),
    (5, "the quick brown fox jumps over the lazy dog today"),    # near dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(s):
        t = tokenize_text(s)
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    rows = exact_dedup(docs).collect()
    assert {(r["doc_id"], r["canonical_id"], r["group_size"]) for r in rows} == {
        (0, 0, 2),
        (1, 0, 2),
    }


def test_shingles_counts(docs):
    sh = token_shingles(docs, n=3)
    counts = {r["doc_id"]: r["n"] for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # doc 0: 9 tokens → 7 trigrams, all distinct
    assert counts[0] == 7


def test_minhash_identical_docs_equal_sigs(docs):
    sigs = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(16))
            for r in minhash_signatures(docs, num_hashes=16).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]
    # near-dup shares most minhashes
    shared = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert shared >= 8


def test_lsh_pairs_catch_dups(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=16)
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sigs, 16, bands=4).collect()}
    assert (0, 1) in pairs           # exact dup always collides
    assert (0, 2) in pairs or (0, 5) in pairs  # near dups likely caught
    assert (3, 4) not in pairs       # unrelated docs don't collide


def test_ngram_jaccard_matches_python(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert got[(0, 1)] == 1.0
    exp_02 = round(_jaccard(DOCS[0][1], DOCS[2][1]), 4)
    assert got[(0, 2)] == pytest.approx(exp_02, abs=1e-4)
    for (a, b), j in got.items():
        assert j == pytest.approx(round(_jaccard(DOCS[a][1], DOCS[b][1]), 4), abs=1e-4)


def test_simhash(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs, bits=16).collect()}
    assert sigs[0] == sigs[1]
    assert 0 <= sigs[0] < 2**16
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(simhash_signatures(docs, bits=16), max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    # near-dups have small distance; unrelated docs should not be ≤ 3 apart
    if (0, 2) in pairs:
        assert pairs[(0, 2)] <= 3
    assert (3, 4) not in pairs


def test_simhash_banding_matches_bruteforce(spark, docs):
    """The (d+1)-band equi-join path must find the IDENTICAL pair set
    the naive all-pairs Hamming scan finds (pigeonhole recall 1.0)."""
    for bits, d in [(16, 0), (16, 2), (16, 3), (32, 2), (32, 5)]:
        sigs = simhash_signatures(docs, bits=bits)
        got = sorted(
            map(tuple, simhash_near_pairs(sigs, max_hamming=d, bits=bits).collect())
        )
        s = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
        exp = sorted(
            (a, b, bin(s[a] ^ s[b]).count("1"))
            for a in s
            for b in s
            if a < b and bin(s[a] ^ s[b]).count("1") <= d
        )
        assert got == exp, (bits, d)


def test_simhash_banding_plan_has_no_cartesian(spark, docs):
    """The near-pair join must be an equi-join on band buckets — a
    CartesianProduct / BroadcastNestedLoopJoin here is O(N²) at scale."""
    from text_indexer_spark.plans.checks import formatted_plan

    sigs = simhash_signatures(docs, bits=16)
    plan = formatted_plan(simhash_near_pairs(sigs, max_hamming=2, bits=16))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hot_shingle_cap_default_on_and_audited(spark):
    """A shingle shared by every doc must be dropped by the default cap
    (and surfaced by hot_shingles); Jaccard is then computed over the
    capped shingle universe consistently."""
    from text_indexer_spark.operators.dedup import hot_shingles

    # every doc shares the hot prefix "aa bb cc dd"; only 0/1 also share a tail
    rows = [(i, "aa bb cc dd " + ("xx yy zz ww" if i < 2 else f"u{i} v{i} w{i} q{i}"))
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=4 < 8 docs → the shingles fully contained in the hot prefix drop
    hot = {r["shingle"] for r in hot_shingles(docs, n=3, max_shingle_df=4).collect()}
    assert "aa bb cc" in hot and "bb cc dd" in hot
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_shingle_df=4
        ).collect()
    }
    # only (0,1) survive: their non-hot shingles are identical
    assert set(pairs) == {(0, 1)}
    # uncapped, the hot prefix alone links every pair at threshold 0.2
    uncapped = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_shingle_df=None)
    assert uncapped.count() > 1
