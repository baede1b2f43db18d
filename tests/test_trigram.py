"""Trigram content index: the accelerated grep must return EXACTLY the
full-scan relation, and the literal analyzer must be sound (every
extracted literal is genuinely required by the pattern — checked
exhaustively against Python ``re`` over a small alphabet)."""

from __future__ import annotations

import re
from itertools import product

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from text_indexer_spark.corpus import golden_corpus, synthetic_corpus
from text_indexer_spark.operators.highlight import regex_grep
from text_indexer_spark.operators.trigram import (
    grep_trigram,
    literals_from_regex,
    required_grams,
    substring_candidates,
    trigram_postings,
)


@pytest.fixture(scope="module")
def docs(spark):
    g = golden_corpus(spark).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"),
    )
    s = synthetic_corpus(spark, n_docs=150, avg_tokens=30, n_repos=10).select(
        (F.monotonically_increasing_id() + F.lit(1000)).alias("doc_id"),
        F.col("content").alias("text"),
    )
    return g.unionByName(s).cache()


# ------------------------------------------------------------- postings

def test_trigram_postings_matches_python(spark, docs):
    rows = docs.collect()
    want = set()
    for r in rows:
        t = (r["text"] or "").lower()
        for i in range(max(len(t) - 2, 0)):
            want.add((r["doc_id"], t[i:i + 3]))
    got = {
        (r["doc_id"], r["gram"])
        for r in trigram_postings(docs).collect()
    }
    assert got == want


def test_trigram_postings_unicode_codepoints(spark):
    """The split('')-based extraction must stay CODEPOINT-identical to
    Python slicing on multi-byte text — non-BMP emoji (surrogate pairs
    in the JVM), CJK, combining accents. Pins the O(len) rewrite to the
    same semantics the old substr form had."""
    texts = [
        (1, "ab\U0001F600cd\U0001F680ef"),      # non-BMP emoji between ascii
        (2, "搜索引擎索引构建"),                    # CJK
        (3, "café crème"),                # combining accent + latin-1
        (4, "Ω≈ç√∫˜µ≤"),                        # symbols
        (5, "\U0001F600\U0001F680\U0001F916"),  # emoji-only
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    want = set()
    for i, t in texts:
        lt = t.lower()
        for k in range(max(len(lt) - 2, 0)):
            want.add((i, lt[k:k + 3]))
    got = {(r["doc_id"], r["gram"]) for r in trigram_postings(d).collect()}
    assert got == want


def test_trigram_postings_short_docs(spark):
    d = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abc"), (4, None)],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["gram"]) for r in trigram_postings(d).collect()}
    assert got == {(3, "abc")}


# ------------------------------------------------------- literal analyzer

@pytest.mark.parametrize("pattern,want", [
    ("query", ["query"]),
    ("quer[a-z]+", ["quer"]),
    ("s[a-z]+m", ["s", "m"]),
    ("foo|bar", []),
    ("(foo)bar", ["bar"]),
    ("foo(bar)?baz", ["foo", "baz"]),
    ("foo.bar", ["foo", "bar"]),
    ("ab+c", ["ab", "bc"]),
    ("ab*c", ["a", "c"]),   # optional b BETWEEN a and c: never merge to "ac"
    ("ab?c", ["a", "c"]),
    ("fo{2}d", ["fo", "od"]),
    ("fo{0,1}d", ["f", "d"]),
    ("a\\.b", ["a.b"]),
    ("\\d+foo", ["foo"]),
    ("^start.*end$", ["start", "end"]),
    ("", []),
])
def test_literal_extraction_cases(pattern, want):
    got = literals_from_regex(pattern)
    assert got == want, (pattern, got)


_ATOMS = ["a", "b", "c", "ab", "bc", "abc", "[ab]", "[^a]", ".", "(ab)", "(a|b)", "\\d"]
_QUANTS = ["", "?", "*", "+", "{2}", "{0,2}", "{1,2}"]


@st.composite
def _patterns(draw):
    k = draw(st.integers(1, 4))
    parts = []
    for _ in range(k):
        a = draw(st.sampled_from(_ATOMS))
        q = draw(st.sampled_from(_QUANTS))
        if q and a == ".":
            q = ""  # .* over the tiny alphabet matches everything anyway
        parts.append(a + q)
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(_patterns())
def test_literal_extraction_sound_exhaustive(pattern):
    """THE soundness property: for every string (exhaustive over a 3-char
    alphabet up to length 6) the pattern matches, every extracted
    literal appears (case-folded — the index is lowercased)."""
    rx = re.compile(pattern)
    lits = literals_from_regex(pattern)
    if not lits:
        return
    for L in range(0, 7):
        for tup in product("abc", repeat=L):
            s = "".join(tup)
            if rx.search(s):
                for lit in lits:
                    assert lit.lower() in s.lower(), (pattern, lit, s)


def test_required_grams():
    assert required_grams("quer[a-z]+") == ["que", "uer"]
    assert required_grams("s[a-z]+m") == []          # literals too short
    assert required_grams("foo|bar") == []           # alternation
    assert required_grams("JudgeMental") == [
        "dge", "eme", "ent", "gem", "jud", "men", "nta", "tal", "udg",
    ]


# ---------------------------------------------------------------- grep

GREP_PATTERNS = [
    "quer[a-z]+",          # literal ≥3 → trigram-pruned
    "judgemental",         # plain literal
    "Tyler",               # case-sensitive verify over lowercased index
    "strange time",        # literal with space
    "practi[a-z]+ guide",  # two literals
    "s[a-z]+m",            # no usable literal → full-scan fallback
    "count_2 \\+ 41",      # escaped metachar (code corpus shape)
    "zzz_no_such_string",  # empty result
]


@pytest.mark.parametrize("pattern", GREP_PATTERNS)
def test_grep_trigram_equals_full_scan(spark, docs, pattern):
    tri = trigram_postings(docs).cache()
    want = sorted(
        (r["doc_id"], r["n_matches"]) for r in regex_grep(docs, pattern).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_matches"])
        for r in grep_trigram(docs, tri, pattern).collect()
    )
    assert got == want, pattern


@pytest.mark.parametrize("max_ids", [10_000, 1])
@pytest.mark.parametrize("pattern", GREP_PATTERNS)
def test_grep_trigram_pushdown_equals_full_scan(spark, docs, pattern, max_ids):
    """The id-pushdown probe returns the identical relation at every
    cap: above the cap it must silently degrade to the join form, at a
    generous cap it serves from the pushed IN-list."""
    from text_indexer_spark.operators.trigram import grep_trigram_pushdown

    tri = trigram_postings(docs).cache()
    want = sorted(
        (r["doc_id"], r["n_matches"]) for r in regex_grep(docs, pattern).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_matches"])
        for r in grep_trigram_pushdown(
            docs, tri, pattern, max_pushdown_ids=max_ids
        ).collect()
    )
    assert got == want, (pattern, max_ids)


def test_substring_candidates_superset_and_verified(spark, docs):
    needle = "curious"
    cand = substring_candidates(trigram_postings(docs), needle)
    cand_ids = {r["doc_id"] for r in cand.collect()}
    truth = {
        r["doc_id"]
        for r in docs.filter(
            F.contains(F.lower("text"), F.lit(needle))
        ).collect()
    }
    assert truth <= cand_ids  # superset (sound)
    # verify step closes the gap exactly
    verified = docs.join(cand, "doc_id", "left_semi").filter(
        F.contains(F.lower("text"), F.lit(needle))
    )
    assert {r["doc_id"] for r in verified.collect()} == truth
    with pytest.raises(ValueError):
        substring_candidates(trigram_postings(docs), "ab")


def test_substring_search_equals_like(spark):
    from text_indexer_spark.operators.trigram import (
        substring_search,
        trigram_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "the vector stream merges"),
            (2, "VECTOR STReam shouting"),
            (3, "vectors only"),
            (4, "no match here"),
            (5, "ctor str literal"),
        ],
        "doc_id long, text string",
    )
    tri = trigram_postings(docs)
    for needle in ["ctor str", "VeCtOr s", "zz", "no match here", "q"]:
        got = sorted(
            r["doc_id"] for r in substring_search(docs, tri, needle).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in docs.filter(
                F.contains(F.lower("text"), F.lit(needle.lower()))
            ).collect()
        )
        assert got == want, needle


# ------------------------------------------------------------ batch grep
def test_grep_batch_equals_per_pattern_union(spark, docs):
    from text_indexer_spark.operators.trigram import grep_trigram_batch

    tri = trigram_postings(docs)
    pats = [
        "index",          # indexed literal
        "quer[a-z]+",     # indexed via required literal "quer"
        "s.m",            # no usable literal -> fallback scan tier
        "zzqxnope",       # indexed, zero matches
    ]
    batch = {
        (r["pattern"], r["doc_id"]): r["n_matches"]
        for r in grep_trigram_batch(docs, tri, pats).collect()
    }
    single: dict = {}
    for p in pats:
        for r in grep_trigram(docs, tri, p).collect():
            single[(p, r["doc_id"])] = r["n_matches"]
    assert batch == single and len(batch) > 0


def test_grep_batch_dedups_patterns_and_rejects_empty(spark, docs):
    from text_indexer_spark.operators.trigram import grep_trigram_batch

    tri = trigram_postings(docs)
    once = grep_trigram_batch(docs, tri, ["index"]).collect()
    twice = grep_trigram_batch(docs, tri, ["index", "index"]).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))
    with pytest.raises(ValueError):
        grep_trigram_batch(docs, tri, [])


def test_grep_batch_fallback_tier_is_join_free(spark, docs):
    from text_indexer_spark.operators.trigram import grep_trigram_batch

    tri = trigram_postings(docs)
    out = grep_trigram_batch(docs, tri, ["s.m", "a.b"])  # both fallback
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one exploded multi-regex scan, no join


def test_grep_batch_pushdown_variants_identical(spark, docs):
    from text_indexer_spark.operators.trigram import grep_trigram_batch

    tri = trigram_postings(docs)
    pats = ["index", "quer[a-z]+", "zzqxnope"]
    outs = []
    for cap in (10_000, 1, None):  # pushdown hit, forced cap fallback, pure join
        outs.append(sorted(
            map(tuple, grep_trigram_batch(
                docs, tri, pats, max_pushdown_ids=cap
            ).collect())
        ))
    assert outs[0] == outs[1] == outs[2] and outs[0]


def test_grep_case_insensitive_flag_through_index(spark):
    """(?i) patterns are served soundly by the case-folded gram index:
    candidates are case-insensitive by construction (grams lowercase),
    the verify regex applies the real flag — indexed ≡ full scan on
    mixed-case text, for both the case-sensitive and (?i) forms."""
    from text_indexer_spark.operators.trigram import grep_trigram

    docs = spark.createDataFrame(
        [
            (1, "QuickSilver surfaces"),
            (2, "QUICKSILVER SHOUTS"),
            (3, "quicksilver quiet"),
            (4, "no match here"),
        ],
        "doc_id long, text string",
    )
    tri = trigram_postings(docs)
    for pat, expect in (
        ("(?i)quicksilver", {1, 2, 3}),
        ("quicksilver", {3}),
        ("QuickSilver", {1}),
    ):
        indexed = {r["doc_id"] for r in grep_trigram(docs, tri, pat).collect()}
        full = {r["doc_id"] for r in regex_grep(docs, pat).collect()}
        assert indexed == full == expect, pat


def test_grep_batch_string_doc_ids_pushdown(spark):
    """The pushdown localization must round-trip the corpus's OWN id
    type — the first cut hardcoded ``long`` and crashed on string ids
    in ``createDataFrame`` (r4 advice).  Equality against the
    single-pattern greps at every cap setting proves the typed path."""
    from text_indexer_spark.operators.trigram import grep_trigram_batch

    corpus = spark.createDataFrame(
        [
            ("doc-a", "hello quicksilver world"),
            ("doc-b", "quicksilver stream again quicksilver"),
            ("doc-c", "nothing relevant here"),
            ("doc-d", "world of streams"),
        ],
        "doc_id string, text string",
    )
    tri = trigram_postings(corpus)
    pats = ["quic[a-z]+", "world", "a.b"]  # 2 indexed + 1 fallback
    want = {
        (p, r["doc_id"]): r["n_matches"]
        for p in pats
        for r in grep_trigram(corpus, tri, p).collect()
    }
    assert want  # non-trivial fixture
    for cap in (10_000, 1, None):
        got = {
            (r["pattern"], r["doc_id"]): r["n_matches"]
            for r in grep_trigram_batch(
                corpus, tri, pats, max_pushdown_ids=cap
            ).collect()
        }
        assert got == want, cap


def test_grep_batch_blown_id_cap_still_single_probe(spark):
    """When the pair collect SUCCEEDS but the union id-list exceeds
    ``max_pushdown_ids``, the verify must still join the LOCALIZED pair
    rows (probe executed exactly once) — only the corpus IN-list is
    skipped.  The first cut threw the collected pairs away and re-joined
    the lazy plan, re-running the probe scan+aggregation (r4 advice)."""
    from text_indexer_spark.operators.trigram import grep_trigram_batch

    corpus = spark.createDataFrame(
        [(i, f"quicksilver number {i}") for i in range(8)]
        + [(100, "stream only here")],
        "doc_id long, text string",
    )
    tri = trigram_postings(corpus)
    # 2 indexed patterns, cap 3 -> pair_cap 6: "stream" contributes 1
    # pair, "quicksilver" 8 -> 9 pairs > pair_cap would abort, so cap
    # the quicksilver side instead: use 4 qs docs -> 5 pairs <= 6 but
    # union ids = 5 > 3 = max_pushdown_ids
    corpus_small = corpus.filter((F.col("doc_id") < 4) | (F.col("doc_id") == 100))
    tri_small = trigram_postings(corpus_small)
    q = grep_trigram_batch(
        corpus_small, tri_small, ["quicksilver", "stream"], max_pushdown_ids=3
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # localized pairs present (createDataFrame renders as an
    # ExistingRDD scan), gram probe absent from the verify plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD[pattern" in plan
    assert "count(distinct gram" not in plan and "In(gram" not in plan
    got = {(r["pattern"], r["doc_id"]) for r in q.collect()}
    assert got == {("quicksilver", i) for i in range(4)} | {("stream", 100)}
