"""Multi-byte fixture coverage (unicode_fixture.py): the driver gates
that union CJK/accented/Cyrillic/Greek/emoji rows into ``documents``
must stay oracle-green on them, and the two measured engine
divergences that shaped the fixture must stay pinned.

Reference parity context: the reference lowercases with Kotlin/Java
``toLowerCase()`` (``DocumentTokenizer.kt:21``) — full Unicode case
mapping, which Spark's ``lower()`` matches and DuckDB's does not
(simple mapping).  SURVEY §7 flagged exotic case mappings as the
tokenizer-parity risk; these tests make the boundary explicit.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from text_indexer_spark import unicode_fixture as ufix

SF_DIR_001 = "/root/testdata/sf0.01"


def _oracle_con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR_001}/documents.parquet')"
    )
    return con


def test_fixture_rows_are_parity_safe(spark):
    """Every fixture text must lowercase identically in Spark and
    DuckDB — the precondition for using it in hash-compared gates."""
    texts = [t for _, t, _, _ in ufix.ROWS]
    sdf = spark.createDataFrame([(t,) for t in texts], "t string")
    slow = [r["l"] for r in sdf.select(F.lower("t").alias("l")).collect()]
    con = duckdb.connect()
    for t, s in zip(texts, slow):
        d = con.execute("SELECT lower(?)", [t]).fetchone()[0]
        assert s == d, f"lower() diverges on {t!r}: spark={s!r} duck={d!r}"


def test_known_divergences_stay_out_of_fixture(spark):
    """Pin WHY the fixture bans word-final capital sigma and dotted İ:
    Spark (Java full case mapping) and DuckDB (simple mapping) disagree
    on exactly these.  If an engine upgrade makes them agree, this test
    fails and the fixture can take the characters."""
    hazards = ["ΟΔΟΣ", "İstanbul"]
    sdf = spark.createDataFrame([(t,) for t in hazards], "t string")
    slow = [r["l"] for r in sdf.select(F.lower("t").alias("l")).collect()]
    con = duckdb.connect()
    dlow = [con.execute("SELECT lower(?)", [t]).fetchone()[0] for t in hazards]
    assert slow[0] == "οδος" and dlow[0] == "οδοσ"  # contextual final sigma
    assert slow[1] != dlow[1]  # dotted capital I
    for _, text, _, _ in ufix.ROWS:
        assert "İ" not in text
        for tok in text.split():
            assert not tok.rstrip("!?.,;:()'\"").endswith("Σ")


def test_length_semantics_are_codepoints(spark):
    """n_chars (Python len) == Spark length() == DuckDB length() on all
    fixture rows — including the non-BMP emoji row (doc 900008), where
    Java's UTF-16 ``String.length`` would disagree."""
    fdf = ufix.fixture_df(spark).select(
        "doc_id", F.length("text").alias("slen"), "n_chars"
    )
    got = {r["doc_id"]: (r["slen"], r["n_chars"]) for r in fdf.collect()}
    con = duckdb.connect()
    for i, t, _, _ in ufix.ROWS:
        dlen = con.execute("SELECT length(?)", [t]).fetchone()[0]
        assert got[i] == (len(t), len(t))
        assert dlen == len(t)


def test_zh_route_emits_cjk_bigrams(spark):
    """The zh fixture docs must flow through the character-bigram
    segmenter: CJK bigram terms appear, whole CJK runs do not."""
    from text_indexer_spark.operators.langroute import (
        tokenize_postings_by_lang,
    )

    out = tokenize_postings_by_lang(ufix.fixture_df(spark))
    terms = {
        r["term"]
        for r in out.filter(F.col("doc_id") == 900001).collect()
    }
    assert "机器" in terms and "器学" in terms  # bigrams of 机器学习
    # the zh segmenter bigrams EVERY token >= 2 chars, latin included
    # ("window" -> wi in nd do ow, langroute.char_bigram_tokenize)
    assert "sp" in terms and "rk" in terms and "spark" not in terms
    assert "机器学习" not in terms               # no unsegmented run


def test_fixture_gates_match_oracle(spark):
    """The six fixture-unioned driver gates replay oracle-green at
    sf0.01 (same compare the driver does: sorted value tuples)."""
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    con = _oracle_con()

    def norm(v):
        return round(v, 9) if isinstance(v, float) else v

    for name in [
        "regex_grep", "lang_id", "token_counts",
        "quality_scores", "tokenize_by_lang",
    ]:
        sdf = qs[name](spark, SF_DIR_001)
        cols = sorted(sdf.columns)
        s = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
        res = con.execute(osql[name])
        dcols = [d[0] for d in res.description]
        d = sorted(
            tuple(norm(x) for x in (r[dcols.index(c)] for c in cols))
            for r in res.fetchall()
        )
        assert s == d, f"{name} diverges on the unicode fixture"
        fixture_ids = {i for i, *_ in ufix.ROWS}
        got_ids = {r[cols.index("doc_id")] for r in s} if "doc_id" in cols else set()
        if "doc_id" in cols:
            assert got_ids & fixture_ids, f"{name}: fixture rows absent"


def test_trigram_gate_covers_multibyte_grams(spark):
    """trigram_sync_postings (fixture-unioned) emits CJK grams and they
    match the oracle's substr windows."""
    import __spark_entry__ as m

    sdf = m.queries()["trigram_sync_postings"](spark, SF_DIR_001)
    cjk = sdf.filter(F.col("doc_id") == 900001).collect()
    grams = {r["gram"] for r in cjk}
    assert "机器学" in grams and "器学习" in grams
