"""Corpus-wide line deduplication (operators/linededup.py): the C4/CCNet
shared-line rule — lines occurring in >= min_docs DISTINCT documents are
removed from every document, text reassembled in original order."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_indexer_spark.operators import linededup


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "all rights reserved"


def test_shared_lines_counts_distinct_docs(spark):
    # the boilerplate line repeats INSIDE doc 1 — within-doc repeats
    # must not inflate the distinct-document count
    c = _corpus(
        spark,
        [
            (1, f"{BOILER}\nalpha\n{BOILER}"),
            (2, f"beta\n{BOILER}"),
            (3, "gamma"),
        ],
    )
    shared = {
        r["line"]: r["n_docs"]
        for r in linededup.shared_lines(c, min_docs=2).collect()
    }
    assert shared == {BOILER: 2}


def test_dedup_removes_shared_everywhere_and_keeps_order(spark):
    c = _corpus(
        spark,
        [
            (1, f"keep one\n{BOILER}\nkeep two"),
            (2, f"{BOILER}\nother text"),
        ],
    )
    kept = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(c, min_docs=2).collect()
    }
    # shared line gone from BOTH docs (no scan-order-dependent
    # "first occurrence" survivor), original line order preserved
    assert kept == {1: "keep one\nkeep two", 2: "other text"}


def test_doc_reduced_to_boilerplate_is_dropped(spark):
    c = _corpus(
        spark,
        [(1, BOILER), (2, BOILER), (3, f"{BOILER}\nreal content")],
    )
    kept = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(c, min_docs=2).collect()
    }
    assert kept == {3: "real content"}


def test_blank_lines_never_shared_and_survive_with_doc(spark):
    # blank lines occur in all three docs but are structure, not
    # content: they must not be counted as shared and must survive
    # in documents that keep content
    c = _corpus(
        spark,
        [
            (1, f"alpha\n\nbeta"),
            (2, f"gamma\n\ndelta"),
            (3, f"{BOILER}\n\n{BOILER}"),
            (4, BOILER),
        ],
    )
    assert linededup.shared_lines(c, min_docs=2).count() == 1  # BOILER only
    kept = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(c, min_docs=2).collect()
    }
    # docs 1/2 intact (blank line kept in place); doc 3 has only blank
    # + shared lines left -> dropped; doc 4 dropped
    assert kept == {1: "alpha\n\nbeta", 2: "gamma\n\ndelta"}


def test_min_docs_threshold(spark):
    c = _corpus(
        spark,
        [(i, f"{BOILER}\nuniq {i}") for i in range(1, 4)],
    )
    assert linededup.shared_lines(c, min_docs=4).count() == 0
    kept3 = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(c, min_docs=3).collect()
    }
    assert kept3 == {1: "uniq 1", 2: "uniq 2", 3: "uniq 3"}


def test_stats_fracs(spark):
    c = _corpus(
        spark,
        [
            (1, f"{BOILER}\nalpha\nbeta\ngamma"),
            (2, f"{BOILER}\ndelta"),
        ],
    )
    stats = {
        r["doc_id"]: (r["n_lines"], r["n_shared_lines"], r["shared_line_frac"])
        for r in linededup.line_dedup_stats(c, min_docs=2).collect()
    }
    assert stats == {1: (4, 1, 0.25), 2: (2, 1, 0.5)}


def test_null_and_empty_text(spark):
    c = _corpus(spark, [(1, None), (2, ""), (3, "content\nline")])
    assert linededup.shared_lines(c, min_docs=1).count() == 2
    kept = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(c, min_docs=2).collect()
    }
    assert kept == {3: "content\nline"}


def test_dedup_lines_plan_has_no_cartesian(spark):
    c = _corpus(spark, [(1, "a\nb"), (2, "b\nc")])
    plan = linededup.dedup_lines(c)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_randomized_corpora_match_python_reference(spark):
    """Seeded random corpora vs a direct python reference of the C4
    rule — catches edge interactions (all-dup docs, within-doc repeats,
    blank runs) the crafted cases might miss."""
    import random

    rng = random.Random(20260819)
    lines_pool = [f"l{i}" for i in range(8)] + ["", " "]
    for trial in range(4):
        docs = {
            d: [rng.choice(lines_pool) for _ in range(rng.randint(0, 6))]
            for d in range(1, rng.randint(4, 9))
        }
        rows = [(d, "\n".join(ls)) for d, ls in docs.items()]
        # python reference
        from collections import Counter

        counts = Counter()
        for d, ls in docs.items():
            for line in {x for x in ls if x.strip()}:
                counts[line] += 1
        shared = {x for x, c in counts.items() if c >= 2}
        expected = {}
        for d, ls in docs.items():
            keep = [x for x in ls if x.strip() == "" or x not in shared]
            if any(x.strip() for x in keep):
                expected[d] = "\n".join(keep)
        got = {
            r["doc_id"]: r["text"]
            for r in linededup.dedup_lines(
                _corpus(spark, rows), min_docs=2
            ).collect()
        }
        assert got == expected, f"trial {trial}"
