"""Misra-Gries heavy hitters (operators/sketch.py): exact-equality
against the brute-force count at any parallelism, summary-size bound,
and the candidate-admission soundness the two-pass design rests on."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import sketch
from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX

_DELIM = re.compile(TOKEN_DELIM_REGEX)


def _py_tokens(t: str) -> list[str]:
    return [x for x in _DELIM.split((t or "").lower()) if x]


def _py_heavy(texts: list[str], min_frac: float) -> dict[str, int]:
    cnt: Counter = Counter()
    for t in texts:
        cnt.update(_py_tokens(t))
    n = sum(cnt.values())
    thr = math.ceil(min_frac * n)
    return {i: c for i, c in cnt.items() if c >= thr}


def _docs(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


SKEWED = (
    ["the quick brown fox jumps over the lazy dog the the"] * 6
    + ["the boilerplate notice appears here the the the"] * 4
    + ["unique words alpha beta gamma delta epsilon zeta"] * 2
)


def test_heavy_hitters_equals_exact(spark):
    for min_frac in (0.02, 0.05, 0.10, 0.25):
        got = {
            r["item"]: r["n"]
            for r in sketch.heavy_hitters(
                _docs(spark, SKEWED), min_frac
            ).collect()
        }
        assert got == _py_heavy(SKEWED, min_frac), min_frac


def test_parallelism_independence(spark):
    for parts in (1, 7):
        got = {
            r["item"]: r["n"]
            for r in sketch.heavy_hitters(
                _docs(spark, SKEWED, parts=parts), 0.05
            ).collect()
        }
        assert got == _py_heavy(SKEWED, 0.05), parts


def test_summary_relation_is_bounded(spark):
    """Pass 1 emits ≤ (k + 1) rows per partition regardless of
    vocabulary size — the whole point of the sketch."""
    parts, k = 5, 8
    # 5 docs x 200 distinct words each: vocabulary >> k
    texts = [
        " ".join(f"w{p}_{i}" for i in range(200)) for p in range(5)
    ]
    summ = sketch.mg_summaries(_docs(spark, texts, parts=parts), k)
    rows = summ.collect()
    assert len(rows) <= parts * (k + 1)
    # sentinel accounting: token total is exact even though items drop
    n_total = sum(r["n_tokens"] for r in rows if r["item"] is None)
    assert n_total == sum(len(_py_tokens(t)) for t in texts)


def test_candidate_bound_is_sound(spark):
    """Every true heavy hitter must survive candidate admission even
    when k is forced to the guarantee's floor (k = ceil(2/min_frac)) —
    the MG bound, not luck.  Checked by equality at a tight min_frac
    over an adversarially flat-ish corpus."""
    texts = [
        "spread spread filler%d filler%d other%d" % (i, i + 1, i) for i in range(30)
    ]
    min_frac = 2 / sum(len(_py_tokens(t)) for t in texts)  # count >= 2
    got = {
        r["item"]: r["n"]
        for r in sketch.heavy_hitters(
            _docs(spark, texts, parts=6), min_frac
        ).collect()
    }
    assert got == _py_heavy(texts, min_frac)


def test_heavy_hitters_property_differential(spark):
    """Hypothesis sweep: random tiny-alphabet corpora and thresholds,
    random partitioning — always exactly the brute-force answer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(doc, min_size=1, max_size=5),
        st.sampled_from([0.05, 0.2, 0.5]),
        st.integers(1, 5),
    )
    def check(texts, min_frac, parts):
        got = {
            r["item"]: r["n"]
            for r in sketch.heavy_hitters(
                _docs(spark, texts, parts=parts), min_frac
            ).collect()
        }
        assert got == _py_heavy(texts, min_frac)

    check()


def test_validation(spark):
    d = _docs(spark, ["a b c"])
    with pytest.raises(ValueError):
        sketch.heavy_hitters(d, 0.0)
    with pytest.raises(ValueError):
        sketch.heavy_hitters(d, 1.5)
    with pytest.raises(ValueError):
        sketch.mg_summaries(d, 0)


def test_exact_verify_join_is_broadcast(spark):
    """The pass-2 counting shuffle must carry candidates only: the
    candidate set reaches the token stream as a broadcast semi-join,
    never a shuffled one."""
    plan = sketch.heavy_hitters(
        _docs(spark, SKEWED), 0.05
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_heavy_hitters_items_shingle_stream(spark):
    """The generic item-stream form works over a non-token relation
    (word shingles) and equals the brute-force shingle count — the
    hot_shingles use case at sketch scale."""
    texts = SKEWED
    docs = _docs(spark, texts, parts=5)
    n = 3
    shingles = docs.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.size(F.split(F.lower("text"), r"\s+")) - (n - 1),
                        F.lit(0),
                    ),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split(F.lower("text"), r"\s+"), i, n)
                ),
            )
        ).alias("shingle")
    )
    got = {
        r["item"]: r["n"]
        for r in sketch.heavy_hitters_items(shingles, 0.05).collect()
    }
    # brute force over the same shingle definition
    cnt = Counter()
    for t in texts:
        ws = t.lower().split()
        cnt.update(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )
    total = sum(cnt.values())
    thr = math.ceil(0.05 * total)
    assert got == {i: c for i, c in cnt.items() if c >= thr}


def test_heavy_hitters_null_items_excluded_consistently(spark):
    """NULL items (e.g. failed host parses in a URL stream) must not
    inflate the φ·N threshold: they are uncountable by both passes, so
    they are excluded from the stream AND from N. With nulls counted
    into N, 'b' (6/12 non-null items) would miss a 0.5 cut computed
    over 18 rows; the contract says it passes."""
    from text_indexer_spark.operators.sketch import heavy_hitters_items

    rows = [("b",)] * 6 + [("a",)] * 4 + [("c",)] * 2 + [(None,)] * 6
    items = spark.createDataFrame(rows, "item string").repartition(3)
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters_items(items, min_frac=0.5).collect()
    }
    assert got == {("b", 6)}
