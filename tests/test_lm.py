"""Bigram-LM quality scoring (operators/lm.py): hand-computed
probabilities, OOV smoothing, outlier ranking."""

from __future__ import annotations

import math

import pytest

from text_indexer_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_scores(spark):
    # corpus: "a b a b" + "a b" -> bigrams: (a,b)x3, (b,a)x1
    # unigrams: a:3, b:3; V=2; k=0.5
    c = _docs(spark, [(1, "a b a b"), (2, "a b")])
    out = {r["doc_id"]: r for r in lm.lm_self_score(c, k=0.5).collect()}

    def logp(c12, c1):
        return math.log((c12 + 0.5) / (c1 + 0.5 * 2))

    ab, ba = logp(3, 3), logp(1, 3)
    exp1 = round(round((round(ab * 1e7) * 2 + round(ba * 1e7)) / 3 / 1e7, 5), 5)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logp"] == pytest.approx(exp1, abs=1e-9)
    assert out[1]["ppl"] == pytest.approx(round(math.exp(-exp1), 3), abs=1e-9)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_logp"] == pytest.approx(round(ab, 5), abs=1e-5)


def test_short_docs_absent_and_k_guard(spark):
    c = _docs(spark, [(1, "solo"), (2, ""), (3, None), (4, "two tokens")])
    out = lm.lm_self_score(c).collect()
    assert {r["doc_id"] for r in out} == {4}
    with pytest.raises(ValueError):
        lm.score_bigram_lm(c, lm.train_bigram_lm(c), k=0.0)


def test_oov_scoring_against_foreign_model(spark):
    train = _docs(spark, [(1, "the cat sat on the mat")])
    model = lm.train_bigram_lm(train)
    # every bigram of the scored doc is unseen; 'zz'/'qq' are OOV
    # prefixes too -> all probs collapse to k / (c1 + k*V) with c=0
    score = lm.score_bigram_lm(_docs(spark, [(9, "zz qq zz")]), model, k=0.5)
    row = score.collect()[0]
    v = model["v"]
    expected = math.log(0.5 / (0.5 * v))
    assert row["n_bigrams"] == 2
    assert row["avg_logp"] == pytest.approx(round(expected, 5), abs=1e-5)


def test_outlier_doc_has_higher_perplexity(spark):
    # nine docs share one phrase distribution; the outlier uses each
    # bigram exactly once from a disjoint tail
    rows = [(i, "spark builds fast indexes daily") for i in range(9)]
    rows.append((99, "zebra quartz vortex nimbus oracle"))
    out = {r["doc_id"]: r["ppl"] for r in lm.lm_self_score(_docs(spark, rows)).collect()}
    assert out[99] > max(out[i] for i in range(9))
