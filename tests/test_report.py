"""Data-card report (operators/report.py): exact counters vs a
hand-computed fixture, optional sections, empty corpus, CLI."""

from __future__ import annotations

import json

from text_indexer_spark.operators.report import corpus_report

ROWS = [
    (1, "en", "the spark engine builds compressed indexes quickly"),
    (2, "en", "the spark engine builds compressed indexes quickly"),  # dup of 1
    (3, "de", "contact ops@example.com or see https://docs.example.com/x"),
    (4, "de", "see https://docs.example.com/y and https://other.example.net"),
    (5, "fr", "server at 10.0.0.1 answered"),
    (6, "fr", None),
]


def _df(spark, rows=ROWS, with_lang=True):
    if with_lang:
        return spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
    return spark.createDataFrame(
        [(i, t) for i, _, t in rows], "doc_id long, text string"
    )


def test_report_counters_exact(spark):
    rep = corpus_report(_df(spark))
    assert rep["n_docs"] == 6
    # 7+7 (dup pair) + 6 + 6 + 4 + 0 word tokens... trust the exact
    # sections instead of re-deriving the tokenizer here:
    assert rep["tokens"]["word_total"] > 0
    assert rep["tokens"]["chars_total"] == sum(
        len(t) for _, _, t in ROWS if t is not None
    )
    # HLL estimate of a tiny exact vocabulary is exact-or-near
    import re

    from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX

    vocab = {
        x
        for _, _, t in ROWS
        if t
        for x in re.split(TOKEN_DELIM_REGEX, t.lower())
        if x
    }
    assert abs(rep["tokens"]["vocab_size_approx"] - len(vocab)) <= max(
        2, len(vocab) // 10
    )
    assert rep["exact_duplication"] == {
        "docs_in_dup_groups": 2,
        "dup_groups": 1,
        "removable_docs": 1,
        "dup_frac": round(1 / 6, 4),
    }
    assert rep["pii"] == {"urls": 3, "emails": 1, "ipv4s": 1}
    doms = {d["domain"]: d["n"] for d in rep["top_domains"]}
    assert doms == {"docs.example.com": 2, "other.example.net": 1}
    assert rep["languages"] == {"en": 2, "de": 2, "fr": 2}
    ql = rep["quality"]
    assert 0.0 <= ql["p10"] <= ql["p50"] <= ql["p90"] <= 1.0


def test_report_without_lang_and_empty(spark):
    rep = corpus_report(_df(spark, with_lang=False))
    assert "languages" not in rep
    assert rep["n_docs"] == 6
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert corpus_report(empty) == {"n_docs": 0}


def test_cli_report(spark, tmp_path, capsys):
    from text_indexer_spark import cli

    src = str(tmp_path / "corpus")
    _df(spark).write.parquet(src)
    rc = cli.main(["--master", "local[4]", "report", "--corpus", src])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_docs"] == 6
    assert rep["languages"] == {"en": 2, "de": 2, "fr": 2}
    assert rep["pii"]["emails"] == 1
