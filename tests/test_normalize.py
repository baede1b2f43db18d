"""Text normalization (operators/normalize.py): exact equality with a
pure-Python oracle over adversarial fixtures, hash-tier convergence
(the reason the operator exists), line-structure preservation, and a
zero-exchange plan for the JVM tier."""

from __future__ import annotations

import re
import unicodedata

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import normalize


def _py_norm(t: str | None, form: str | None = None) -> str | None:
    if t is None:
        return None
    out = t
    if form:  # form FIRST: NFKC folds NBSP/fullwidth spaces to U+0020,
        # which the whitespace tier must then collapse
        out = unicodedata.normalize(form, out)
    out = re.sub("\r\n?", "\n", out)
    out = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]", "", out)
    out = re.sub("[ \t\x0b\f]+", " ", out)
    out = re.sub(" ?\n ?", "\n", out)
    out = re.sub("\n{3,}", "\n\n", out)
    return out.strip()


FIXTURES = [
    "plain text stays as is",
    "runs   of\t\tspaces  and\ttabs",
    "trailing spaces   \nbefore newlines\n   and after",
    "windows\r\nline\rendings",
    "ctrl\x00chars\x08here\x1fand\x9fthere",
    "too\n\n\n\n\nmany blank lines",
    "  padded at the ends  ",
    "ﬁ ligature ＆ ｆｕｌｌｗｉｄｔｈ ２３",  # NFKC folds these
    "nbsp\u00a0\u00a0run and fullwidth\u3000\u3000spaces",  # NFKC → U+0020 runs the ws tier must collapse
    "café combining accent",  # NFC composes this
    "",
    None,
]


def _docs(spark, texts=FIXTURES, parts=3):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


def _collect(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_whitespace_tier_matches_oracle(spark):
    got = _collect(normalize.normalize_text(_docs(spark)))
    want = {i: _py_norm(t) for i, t in enumerate(FIXTURES)}
    # NULL text: trim(NULL) is NULL on both sides
    assert got == want


@pytest.mark.parametrize("form", ["NFC", "NFKC"])
def test_unicode_form_tier_matches_oracle(spark, form):
    got = _collect(normalize.normalize_text(_docs(spark), form=form))
    want = {i: _py_norm(t, form) for i, t in enumerate(FIXTURES)}
    assert got == want


def test_hash_tiers_converge_after_nfkc(spark):
    """The operator's purpose: byte-different, visually-identical docs
    hash identically after normalization (exact-dedup convergence)."""
    pairs = _docs(
        spark,
        ["the ﬁle format", "the file format",  # ligature vs ascii
         "café menu", "café menu"],  # combining vs precomposed
        parts=2,
    )
    hashes = (
        normalize.normalize_text(pairs, form="NFKC")
        .select(F.md5("text").alias("h"))
        .distinct()
        .count()
    )
    assert hashes == 2  # two distinct texts, each pair converged


def test_line_structure_preserved(spark):
    """linededup's unit of identity must survive: line COUNT is
    unchanged by the whitespace tier (only intra-line runs and blank
    stretches canonicalize)."""
    doc = "line one  \n  line two\twith\ttabs\nline three"
    got = _collect(normalize.normalize_text(_docs(spark, [doc], parts=1)))
    assert got[0] == "line one\nline two with tabs\nline three"
    assert got[0].count("\n") == doc.count("\n")


def test_schema_and_columns_unchanged(spark):
    df = spark.createDataFrame(
        [(1, "a  b", "keep")], "doc_id long, text string, other string"
    )
    out = normalize.normalize_text(df)
    assert out.columns == df.columns
    assert out.first()["other"] == "keep"
    out2 = normalize.normalize_text(df, form="NFC")
    assert out2.columns == df.columns


def test_validation(spark):
    with pytest.raises(ValueError):
        normalize.normalize_text(_docs(spark), form="NFX")


def _flat_docs(spark):
    # no repartition: the fixture must not inject its own Exchange
    return spark.createDataFrame(
        [(1, "a  b\n\n\n\nc")], "doc_id long, text string"
    )


def test_jvm_tier_plan_has_no_exchange_or_python(spark):
    plan = (
        normalize.normalize_text(_flat_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_form_tier_plan_has_no_exchange(spark):
    plan = (
        normalize.normalize_text(_flat_docs(spark), form="NFKC")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan  # the documented Python stage


def test_cli_clean_normalize_flag(spark, tmp_path, capsys):
    """clean --normalize nfkc canonicalizes before the filters: a doc
    that only passes the quality gate once its whitespace junk is
    collapsed survives, and the output text is the normalized form."""
    import json

    from text_indexer_spark import cli

    src = str(tmp_path / "src")
    good = (
        "a solid paragraph of reasonable natural language text that "
        "keeps going long enough to clear the quality length gate "
    ) * 3
    spark.createDataFrame(
        [(1, good.replace(" ", "   \t") + "\r\n\r\n\r\n\r\nﬁn")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "clean")
    rc = cli.main(
        ["--master", "local[4]", "clean", "--corpus", src, "--out", out,
         "--normalize", "nfkc"]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_kept"] == 1
    text = spark.read.parquet(out).first()["text"]
    assert "\t" not in text and "\r" not in text and "   " not in text
    assert text.endswith("fin")  # NFKC folded the ligature
