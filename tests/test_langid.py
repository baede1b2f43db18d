"""Char-n-gram Naive Bayes language ID: held-out accuracy on labeled
fixture docs, determinism, OOV/empty-doc behavior, and the self-predict
driver-gate shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.langid import (
    char_ngrams,
    langid_self_predict,
    predict_langid,
    train_langid,
)

# Small per-language word pools (common function/content words — public
# knowledge). Enough signal for a char-3-gram model; deliberately
# includes cross-language lookalikes (la/le, es/est, un/una).
POOLS = {
    "en": "the quick brown fox jumps over lazy dog and with from that this "
          "have will would could about which their there where when what".split(),
    "de": "der die das und ist nicht ein zu mit von auf für über schnelle "
          "braune fuchs springt faulen hund haben wird würde könnte welche".split(),
    "fr": "le la les et est un une que pour avec dans renard brun rapide "
          "saute par dessus chien paresseux avoir sera pourrait quelle où".split(),
    "es": "el la los las es y un una que para con en zorro marrón rápido "
          "salta sobre perro perezoso tener será podría cuál dónde también".split(),
    "it": "il lo la gli le è e un una che per con volpe marrone veloce "
          "salta sopra cane pigro avere sarà potrebbe quale dove anche".split(),
}


def _fixture_docs(n_per_lang: int, words_per_doc: int, seed: int):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang in sorted(POOLS):
        for _ in range(n_per_lang):
            text = " ".join(rng.choice(POOLS[lang]) for _ in range(words_per_doc))
            rows.append((i, lang, text))
            i += 1
    return rows


@pytest.fixture(scope="module")
def fixture_split(spark):
    rows = _fixture_docs(n_per_lang=40, words_per_doc=25, seed=42)
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    train = df.filter(F.col("doc_id") % 5 != 0).cache()
    test = df.filter(F.col("doc_id") % 5 == 0).cache()
    return train, test


def test_char_ngrams_expression(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "ab"), (3, ""), (4, None)], "id long, t string"
    )
    got = {r["id"]: r["g"] for r in df.select("id", char_ngrams("t", 3).alias("g")).collect()}
    assert got[1] == ["abc", "bcd"]
    assert got[2] == ["ab"]        # shorter than n → whole text
    assert got[3] == [] and got[4] == []


def test_heldout_accuracy_at_least_90pct(spark, fixture_split):
    train, test = fixture_split
    model = train_langid(train, top_v=3000)
    pred = predict_langid(test, model)
    joined = pred.join(test.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    correct = joined.filter(F.col("pred_lang") == F.col("lang")).count()
    assert n == 40  # 5 langs × 40 docs × 20% held out
    acc = correct / n
    assert acc >= 0.9, f"held-out accuracy {acc:.2f} < 0.9"


def test_predictions_deterministic(spark, fixture_split):
    train, test = fixture_split
    model = train_langid(train)
    a = sorted((r["doc_id"], r["pred_lang"]) for r in predict_langid(test, model).collect())
    b = sorted((r["doc_id"], r["pred_lang"]) for r in predict_langid(test, model).collect())
    assert a == b


def test_empty_doc_predicts_deterministically(spark, fixture_split):
    train, _ = fixture_split
    model = train_langid(train)
    empty = spark.createDataFrame([(100, ""), (101, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r["pred_lang"] for r in predict_langid(empty, model).collect()}
    # zero grams → prior-only score; all classes equal-prior here, so
    # the alphabetical tie-break must pick 'de' for both
    assert rows == {100: "de", 101: "de"}


def test_self_predict_shape_and_coverage(spark, fixture_split):
    train, _ = fixture_split
    out = langid_self_predict(train)
    assert out.columns == ["doc_id", "pred_lang"]
    assert out.count() == train.count()
    # trained-on-self should fit the training set nearly perfectly
    joined = out.join(train.select("doc_id", "lang"), "doc_id")
    acc = joined.filter(F.col("pred_lang") == F.col("lang")).count() / train.count()
    assert acc >= 0.95


def test_vocab_cap_bounds_model(spark, fixture_split):
    train, _ = fixture_split
    model = train_langid(train, top_v=50)
    assert model["model"].select("gram").distinct().count() <= 50
    # still better than chance with a tiny vocab
    pred = predict_langid(train, model)
    joined = pred.join(train.select("doc_id", "lang"), "doc_id")
    acc = joined.filter(F.col("pred_lang") == F.col("lang")).count() / train.count()
    assert acc >= 0.5
