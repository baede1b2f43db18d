"""Pipeline-hygiene operators: decontamination, repetition stats,
fuzzy matching — crafted-input unit tests (the sf0.01 oracle gates live
in test_driver_contract.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import decontam, fuzzy, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- decontam
def test_contamination_flags_overlapping_doc(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "unrelated words entirely here now"),
            (3, "x alpha beta gamma y"),  # shares the eval 3-gram
        ],
    )
    evalset = _docs(spark, [(100, "alpha beta gamma")])
    ev = decontam.eval_ngrams(evalset, n=3)
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in decontam.contamination_hits(corpus, ev, n=3).collect()
    }
    assert hits == {1: 1, 3: 1}
    kept = decontam.decontaminate(corpus, ev, n=3)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_decontam_short_docs_cannot_match(spark):
    # docs with fewer than n tokens emit no grams -> never contaminated
    corpus = _docs(spark, [(1, "alpha beta"), (2, "")])
    ev = decontam.eval_ngrams(_docs(spark, [(9, "alpha beta gamma")]), n=3)
    assert decontam.contamination_hits(corpus, ev, n=3).count() == 0
    assert decontam.decontaminate(corpus, ev, n=3).count() == 2


def test_decontam_hit_count_is_distinct_grams(spark):
    # the same eval gram appearing twice in a doc counts once
    corpus = _docs(spark, [(1, "a b c z a b c")])
    ev = decontam.eval_ngrams(_docs(spark, [(9, "a b c")]), n=3)
    [(did, n)] = [
        (r["doc_id"], r["n_hits"])
        for r in decontam.contamination_hits(corpus, ev, n=3).collect()
    ]
    assert (did, n) == (1, 1)


# ------------------------------------------------------------ repetition
def test_repetition_duplicate_lines(spark):
    text = "same line\nsame line\nsame line\nunique one"
    df = _docs(spark, [(1, text)])
    [r] = textstats.repetition_stats(df).collect()
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == pytest.approx(3 / 4, abs=5e-5)
    # "same line" = 9 chars * 3 dup copies; total 9*3 + 10
    assert r["dup_line_char_frac"] == pytest.approx(27 / 37, abs=5e-5)


def test_repetition_no_dups_and_empty(spark):
    df = _docs(spark, [(1, "a\nb\nc"), (2, ""), (3, None), (4, "   \n  ")])
    rows = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}
    assert rows[1]["dup_line_frac"] == 0.0
    for did in (2, 3, 4):
        assert rows[did]["n_lines"] == 0
        assert rows[did]["dup_line_frac"] == 0.0
        assert rows[did]["top_2gram"] is None
        assert rows[did]["top_2gram_frac"] == 0.0


def test_repetition_top_2gram_and_tiebreak(spark):
    # "b c" occurs twice; every other 2-gram once
    df = _docs(spark, [(1, "a b c d b c")])
    [r] = textstats.repetition_stats(df).collect()
    assert r["top_2gram"] == "b c"
    assert r["top_2gram_frac"] == pytest.approx(2 / 5, abs=5e-5)
    # all-tied doc -> alphabetically smallest 2-gram wins
    [r2] = textstats.repetition_stats(_docs(spark, [(1, "z y x w")])).collect()
    assert r2["top_2gram"] == "x w"
    assert r2["top_2gram_frac"] == pytest.approx(1 / 3, abs=5e-5)


def test_filter_by_repetition(spark):
    df = _docs(
        spark,
        [
            (1, "boiler plate\nboiler plate\nboiler plate\nboiler plate"),
            (2, "fresh words here\nwith different lines\nno repeats at all"),
        ],
    )
    kept = textstats.filter_by_repetition(
        df, max_dup_line_frac=0.5, max_top_2gram_frac=0.5
    )
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_repetition_is_zero_shuffle(spark):
    from text_indexer_spark.plans.checks import count_exchanges

    df = _docs(spark, [(1, "a b\nc d")])
    assert count_exchanges(textstats.repetition_stats(df)) == 0
    assert count_exchanges(textstats.filter_by_repetition(df)) == 0


# ----------------------------------------------------------------- fuzzy
def test_delete1_neighborhood():
    assert fuzzy.delete1_neighborhood("abc") == ["abc", "bc", "ac", "ab"]
    assert fuzzy.delete1_neighborhood("a") == ["a", ""]


def test_fuzzy_terms_kinds_of_edits(spark):
    corpus = _docs(spark, [(1, "table cable tble tables stable bable")])
    vocab = fuzzy.vocabulary(corpus)
    got = {
        r["term"]: r["dist"]
        for r in fuzzy.fuzzy_terms(vocab, "table").collect()
    }
    # exact, substitution, deletion, insertion — all distance <= 1;
    # "stable" is insertion at front (dist 1), "bable" substitution
    assert got == {"table": 0, "cable": 1, "tble": 1, "tables": 1,
                   "stable": 1, "bable": 1}


def test_fuzzy_pigeonhole_false_positive_killed(spark):
    # "ab" and "ba" share delete-1 variants ({a,b}) but levenshtein = 2:
    # the verification step must reject it
    corpus = _docs(spark, [(1, "ba xy")])
    vocab = fuzzy.vocabulary(corpus)
    assert fuzzy.fuzzy_terms(vocab, "ab").count() == 0


def test_fuzzy_conjunctive_match(spark):
    corpus = _docs(
        spark,
        [
            (1, "key table other"),   # matches both typos
            (2, "key window"),        # only one
            (3, "keys tble"),         # exact typo forms also match
        ],
    )
    got = sorted(
        r["doc_id"]
        for r in fuzzy.fuzzy_conjunctive_match(corpus, "keys tble").collect()
    )
    assert got == [1, 3]


def test_fuzzy_conjunctive_one_term_satisfies_two_tokens(spark):
    # doc term "cat" is within 1 of both query tokens "cap" and "bat":
    # one posting must satisfy BOTH conjuncts
    corpus = _docs(spark, [(1, "cat"), (2, "cap")])
    got = sorted(
        r["doc_id"]
        for r in fuzzy.fuzzy_conjunctive_match(corpus, "cap bat").collect()
    )
    assert got == [1]


def test_fuzzy_empty_query(spark):
    corpus = _docs(spark, [(1, "anything")])
    assert fuzzy.fuzzy_conjunctive_match(corpus, " , ").count() == 0


def test_fuzzy_candidate_filter_is_scan_local(spark):
    # the expansion is a filter over the vocab scan - no join, no
    # cartesian anywhere in the plan
    from text_indexer_spark.plans.checks import formatted_plan

    corpus = _docs(spark, [(1, "table cable")])
    plan = formatted_plan(fuzzy.fuzzy_terms(fuzzy.vocabulary(corpus), "table"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_within_one_edit_matches_levenshtein():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_indexer_spark.operators.fuzzy import within_one_edit

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    @settings(max_examples=300, deadline=None)
    @given(st.text("abc", max_size=6), st.text("abc", max_size=6))
    def check(a, b):
        assert within_one_edit(a, b) == (lev(a, b) <= 1)

    check()


def test_within_edits_matches_levenshtein():
    """Banded d≤2 kernel pinned to full-DP levenshtein (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_indexer_spark.operators.fuzzy import within_edits

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    @settings(max_examples=300, deadline=None)
    @given(st.text("abc", max_size=7), st.text("abc", max_size=7),
           st.integers(min_value=0, max_value=3))
    def check(a, b, d):
        assert within_edits(a, b, d) == (lev(a, b) <= d)

    check()


def test_delete2_pigeonhole_complete(spark):
    """Recall guarantee of the delete-2 candidate cut: EVERY vocabulary
    string within levenshtein ≤ 2 of the query must survive the
    neighborhood-overlap filter (hypothesis over small alphabets, run
    through the actual Spark expression)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_indexer_spark.operators.fuzzy import fuzzy_terms, within_edits

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text("ab", min_size=0, max_size=5), min_size=1,
                    max_size=8, unique=True),
           st.text("ab", min_size=1, max_size=5))
    def check(vocab_terms, q):
        vocab = spark.createDataFrame(
            [(t, 1) for t in vocab_terms], "term string, df long"
        )
        got = {r["term"] for r in fuzzy_terms(vocab, q, max_edits=2).collect()}
        want = {t for t in vocab_terms if within_edits(t, q, 2)}
        assert got == want

    check()


def test_fuzzy_terms_d2_widen_past_d1(spark):
    from text_indexer_spark.operators.fuzzy import fuzzy_terms

    vocab = spark.createDataFrame(
        [("stream", 3), ("sort", 2), ("table", 5), ("strum", 1)],
        "term string, df long",
    )
    d1 = {r["term"]: r["dist"] for r in fuzzy_terms(vocab, "strm", 1).collect()}
    d2 = {r["term"]: r["dist"] for r in fuzzy_terms(vocab, "strm", 2).collect()}
    assert d1 == {"strum": 1}
    assert d2 == {"strum": 1, "stream": 2, "sort": 2}


def test_dsl_fuzzy2_leaf(spark):
    from text_indexer_spark.operators.querylang import Fuzzy, parse_dsl

    node = parse_dsl("strm~2")
    assert node == Fuzzy("strm", edits=2)
    assert parse_dsl("strm~") == Fuzzy("strm", edits=1)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="edit distance"):
        parse_dsl("strm~3")


# ------------------------------------------------------------ lang routing
def test_char_bigram_tokenize():
    import pandas as pd

    from text_indexer_spark.operators.langroute import char_bigram_tokenize

    got = char_bigram_tokenize(pd.Series(["window a", "", None])).tolist()
    assert got == [["wi", "in", "nd", "do", "ow", "a"], [], []]


def test_tokenize_by_lang_routes(spark):
    from text_indexer_spark.operators.langroute import (
        tokenize_postings_by_lang,
    )

    docs = spark.createDataFrame(
        [
            (1, "abc de", "zh"),
            (2, "abc de", "en"),
            (3, "abc de", None),   # unknown lang -> default tokenizer
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokenize_postings_by_lang(docs).collect()
    }
    assert got == {
        (1, "ab"): 1, (1, "bc"): 1, (1, "de"): 1,
        (2, "abc"): 1, (2, "de"): 1,
        (3, "abc"): 1, (3, "de"): 1,
    }


def test_tokenize_by_lang_default_registry_equivalence(spark):
    # with an empty registry the routed tokenizer must reproduce the
    # expression tokenizer exactly (differential over the sf0.001 docs)
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.langroute import (
        tokenize_postings_by_lang,
    )
    from text_indexer_spark.sources.tables import load_table
    from text_indexer_spark.tokenizer import tokenize_column

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    routed = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokenize_postings_by_lang(docs, registry={}).collect()
    }
    expr = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in docs.select(
            "doc_id", F.explode(tokenize_column("text")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .collect()
    }
    assert routed == expr


# ------------------------------------------------------------- PII scrub
def test_redact_pii_order_and_counts(spark):
    from text_indexer_spark.operators.redact import pii_stats, redact_pii

    docs = _docs(
        spark,
        [
            (1, "write to alice@corp.io or see https://ex.org/a?user=bob@corp.io end"),
            (2, "server at 10.1.2.3 and 192.168.0.255 but not 1234.5"),
            (3, "clean text with no contact info"),
            (4, None),
        ],
    )
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    # the email inside the URL query string is swallowed by the URL
    # redaction (URL pass runs first)
    assert red[1] == "write to <EMAIL> or see <URL> end"
    assert red[2] == "server at <IP> and <IP> but not 1234.5"
    assert red[3] == "clean text with no contact info"
    assert red[4] == ""

    stats = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (stats[1]["n_url"], stats[1]["n_email"]) == (1, 2)
    assert stats[2]["n_ipv4"] == 2
    assert stats[3]["n_url"] == stats[3]["n_email"] == stats[3]["n_ipv4"] == 0


def test_redact_pii_idempotent_and_zero_shuffle(spark):
    from text_indexer_spark.operators.redact import redact_pii
    from text_indexer_spark.plans.checks import count_exchanges

    docs = _docs(spark, [(1, "mail x@y.zz at http://a.bc/d from 1.2.3.4")])
    once = redact_pii(docs)
    twice = redact_pii(once)
    assert once.collect() == twice.collect()
    assert count_exchanges(once) == 0


# ---------------------------------------------------------- bloom tier
def test_bloom_no_false_negatives_and_deterministic(spark):
    docs = _docs(
        spark,
        [(i, f"tok{i} alpha beta gamma tok{i + 1} delta") for i in range(40)],
    )
    ev = decontam.eval_ngrams(docs, n=3)
    bloom = decontam.bloom_build(ev, bits_per_key=16, k=7)
    # every member gram must probe positive (Bloom guarantee), and the
    # build must be deterministic (pure hash of the gram set)
    assert ev.filter(~decontam.bloom_contains(bloom, F.col("gram"))).count() == 0
    again = decontam.bloom_build(ev, bits_per_key=16, k=7)
    assert again == bloom


def test_bloom_candidates_superset_and_selective(spark):
    corpus = _docs(
        spark,
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(1, 50)]
        + [(100, "needle one two three four")],
    )
    ev = decontam.eval_ngrams(_docs(spark, [(0, "needle one two three")]), n=4)
    bloom = decontam.bloom_build(ev)
    cand = decontam.bloom_candidates(corpus, bloom, n=4)
    ids = {r["doc_id"] for r in cand.select("doc_id").collect()}
    assert 100 in ids  # superset of the truly contaminated doc
    # the prefilter must actually prune on disjoint-vocabulary docs
    assert len(ids) < 25


def test_decontaminate_bloom_equals_exact(spark):
    # adversarial shape: near-miss grams (share 3 of 4 words) populate
    # the corpus so the exact verify stage has real FPs to burn off
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta tail"),
            (2, "alpha beta gamma other words"),
            (3, "completely disjoint vocabulary here"),
            (4, "x alpha beta gamma delta"),
            (5, None),
        ],
    )
    ev = decontam.eval_ngrams(_docs(spark, [(0, "alpha beta gamma delta")]), n=4)
    exact = sorted(
        r["doc_id"] for r in decontam.decontaminate(corpus, ev, n=4).collect()
    )
    blm = sorted(
        r["doc_id"]
        for r in decontam.decontaminate_bloom(corpus, ev, n=4).collect()
    )
    assert exact == blm == [2, 3, 5]


def test_bloom_candidates_is_single_scan_no_shuffle(spark):
    from text_indexer_spark.plans.checks import count_exchanges

    docs = _docs(spark, [(1, "a b c d e"), (2, "f g h i j")])
    ev = decontam.eval_ngrams(docs, n=3)
    bloom = decontam.bloom_build(ev)
    cand = decontam.bloom_candidates(docs, bloom, n=3)
    assert count_exchanges(cand) == 0
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# ---------------------------------------------------------- auto routing
def test_decontam_auto_all_tiers_identical(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta tail"),
            (2, "alpha beta gamma other words"),
            (3, "completely disjoint vocabulary here"),
            (4, "x alpha beta gamma delta"),
        ],
    )
    ev = decontam.eval_ngrams(_docs(spark, [(0, "alpha beta gamma delta")]), n=4)
    want = [2, 3]
    for tier in ("auto", "exact", "bloom"):
        got = sorted(
            r["doc_id"]
            for r in decontam.decontaminate_auto(
                corpus, ev, n=4, tier=tier
            ).collect()
        )
        assert got == want, tier
    # forcing auto onto the bloom path via a tiny broadcast cap must
    # still produce the identical corpus (output-equivalence of tiers
    # is the whole point of the router)
    tiny = sorted(
        r["doc_id"]
        for r in decontam.decontaminate_auto(
            corpus, ev, n=4, max_broadcast_grams=1
        ).collect()
    )
    assert tiny == want
    with pytest.raises(ValueError):
        decontam.decontaminate_auto(corpus, ev, n=4, tier="nope")


def test_choose_tier_thresholds(spark):
    ev = decontam.eval_ngrams(
        _docs(spark, [(0, "a b c d e f g h")]), n=3
    )  # 6 grams
    assert decontam.choose_tier(ev, max_broadcast_grams=100) == "exact"
    assert decontam.choose_tier(ev, max_broadcast_grams=5) == "bloom"
    assert decontam.choose_tier(ev, max_broadcast_grams=6) == "exact"
