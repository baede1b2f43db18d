"""BPE subword trainer/encoder: exact equality against a pure-Python
canonical implementation (Sennrich et al. 2016 greedy merge), unicode
codepoint symbols, and the determinism contract the DuckDB oracle
relies on."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import bpe
from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX

_DELIM = re.compile(TOKEN_DELIM_REGEX)


def _py_tokens(t: str) -> list[str]:
    return [x for x in _DELIM.split(t.lower()) if x]


def _py_apply(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts: list[str], n_merges: int):
    wc: Counter = Counter()
    for t in texts:
        wc.update(_py_tokens(t))
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0][0]
        merges.append(best)
        words = {w: _py_apply(s, *best) for w, s in words.items()}
    return merges


def _py_encode(text: str, merges) -> list[str]:
    pieces: list[str] = []
    for w in _py_tokens(text):
        s = list(w)
        for m in merges:
            s = _py_apply(s, *m)
        pieces.extend(s)
    return pieces


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_and_encode_match_python_reference(spark):
    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new lower"),
        (3, "widest wide wider new low"),
        (4, "lowest newest widest lower"),
    ]
    docs = _docs(spark, rows)
    merges = bpe.train_bpe(docs, n_merges=10, checkpoint_every=3)
    assert merges == _py_train([t for _, t in rows], 10)
    enc = {
        r["doc_id"]: (r["n_pieces"], r["pieces"])
        for r in bpe.encode_docs_bpe(docs, merges).collect()
    }
    for did, t in rows:
        want = _py_encode(t, merges)
        assert enc[did] == (len(want), want), did


def test_greedy_fold_is_canonical_on_self_merge_runs(spark):
    """The one place sloppy implementations diverge: runs of the same
    symbol under a self-merge.  Greedy leftmost gives aaaa -> [aa, aa]
    and aaaaa -> [aa, aa, a]."""
    docs = _docs(spark, [(1, "aaaa aaaaa aa a")])
    out = {
        r["word"]: r["syms"]
        for r in bpe.word_pieces(
            _docs(spark, [(0, "")]).sparkSession.createDataFrame(
                [("aaaa",), ("aaaaa",), ("aa",), ("a",)], "word string"
            ),
            [("a", "a")],
        ).collect()
    }
    assert out == {
        "aaaa": ["aa", "aa"],
        "aaaaa": ["aa", "aa", "a"],
        "aa": ["aa"],
        "a": ["a"],
    }
    # chained ranks apply sequentially: (a,a) -> [aa, aa, a], then
    # (aa,a) merges the trailing adjacency -> [aa, aaa]
    out2 = {
        r["word"]: r["syms"]
        for r in bpe.word_pieces(
            docs.sparkSession.createDataFrame([("aaaaa",)], "word string"),
            [("a", "a"), ("aa", "a")],
        ).collect()
    }
    assert out2 == {"aaaaa": ["aa", "aaa"]}
    assert _py_apply(_py_apply(list("aaaaa"), "a", "a"), "aa", "a") == ["aa", "aaa"]


def test_unicode_words_codepoint_symbols(spark):
    """CJK/emoji words split to codepoint symbols; merges learn
    multi-codepoint pieces; encode matches the Python reference."""
    rows = [
        (1, "你好世界 你好 你好世界"),
        (2, "café cafés \U0001f600\U0001f600 café"),
    ]
    docs = _docs(spark, rows)
    merges = bpe.train_bpe(docs, n_merges=4)
    assert merges == _py_train([t for _, t in rows], 4)
    enc = {
        r["doc_id"]: r["pieces"]
        for r in bpe.encode_docs_bpe(docs, merges).collect()
    }
    for did, t in rows:
        assert enc[did] == _py_encode(t, merges), did


def test_encode_drops_tokenless_docs_and_orders_pieces(spark):
    docs = _docs(spark, [(1, "ab ab cd"), (2, None), (3, "...")])
    merges = bpe.train_bpe(docs, n_merges=2)
    out = {r["doc_id"]: r["pieces"] for r in bpe.encode_docs_bpe(docs, merges).collect()}
    assert set(out) == {1}
    assert out[1] == _py_encode("ab ab cd", merges)


def test_train_stops_when_fully_merged(spark):
    # single distinct 2-char word: round 1 merges it, round 2 finds no
    # pair -> early stop
    docs = _docs(spark, [(1, "ab ab ab")])
    merges = bpe.train_bpe(docs, n_merges=5)
    assert merges == [("a", "b")]
    with pytest.raises(ValueError):
        bpe.train_bpe(docs, n_merges=0)


def test_merges_table_shape(spark):
    t = bpe.merges_table(spark, [("a", "b"), ("ab", "c")])
    assert [tuple(r) for r in t.collect()] == [
        (0, "a", "b", "ab"),
        (1, "ab", "c", "abc"),
    ]


def test_encode_join_has_no_sort_exchange(spark):
    """Per-doc piece order is restored IN-ROW (array_sort over the
    collected structs) — the plan must not contain a global Sort for
    the reassembly."""
    docs = _docs(spark, [(i, "alpha beta gamma") for i in range(10)])
    enc = bpe.encode_docs_bpe(docs, [("a", "l")])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Sort [pos" not in plan


def test_pieces_digest_is_injective_for_separator_tokens(spark):
    """The tokenizer does not strip 0x1f, so a token can contain the
    join separator; the length-prefixed digest must still tell
    ["a\\x1fb"] apart from ["a", "b"] (a bare 0x1f join cannot)."""
    df = spark.createDataFrame(
        [(1, ["a\x1fb"]), (2, ["a", "b"])], "doc_id long, pieces array<string>"
    ).select("doc_id", bpe.pieces_digest_column(F.col("pieces")).alias("d"))
    rows = {r["doc_id"]: r["d"] for r in df.collect()}
    assert rows[1] != rows[2]
    # and the bare join WOULD collide — the property the prefix buys
    bare = spark.createDataFrame(
        [(1, ["a\x1fb"]), (2, ["a", "b"])], "doc_id long, pieces array<string>"
    ).select("doc_id", F.md5(F.array_join("pieces", bpe.PIECE_SEP)).alias("d"))
    b = {r["doc_id"]: r["d"] for r in bare.collect()}
    assert b[1] == b[2]


def test_pieces_digest_matches_duckdb_rendering(spark):
    """The driver gate's DuckDB twin renders the same length-prefixed
    digest — pin the two renderings byte-equal on pieces that contain
    the separator, multi-byte codepoints, and empties-adjacent cases."""
    duckdb = pytest.importorskip("duckdb")
    cases = [["a\x1fb"], ["a", "b"], ["héllo", "wörld"], ["日本", "語"], ["x"]]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(cases)],
        "doc_id long, pieces array<string>",
    ).select("doc_id", bpe.pieces_digest_column(F.col("pieces")).alias("d"))
    got = {r["doc_id"]: r["d"] for r in df.collect()}
    con = duckdb.connect()
    for i, p in enumerate(cases):
        (exp,) = con.execute(
            "SELECT md5(array_to_string(list_transform(?::VARCHAR[], "
            "s -> length(s) || ':' || s), chr(31)))",
            [p],
        ).fetchone()
        assert got[i] == exp, (i, p)


def test_train_base_is_materialized_once(spark):
    """train_bpe must cut the word-frequency base's lineage BEFORE the
    merge loop — every pre-checkpoint round re-scanning the corpus is
    the exact anti-pattern the module contract rules out.  Witness:
    training still works after the input's underlying view is gone
    (checkpointed data no longer references it) and produces the same
    merges as the uncheckpointed reference."""
    docs = _docs(spark, [(1, "ab ab cd cd cd")])
    merges = bpe.train_bpe(docs, n_merges=2, checkpoint_every=100)
    assert merges == _py_train(["ab ab cd cd cd"], 2)


def test_train_encode_property_differential(spark):
    """Property-based differential: on random small-alphabet corpora
    (dense pair collisions, self-merge runs, within-word overlaps) the
    distributed trainer's merge sequence and the encoder's piece
    streams equal the pure-Python canonical implementation exactly.
    Few examples — each drives real Spark jobs — but the 3-letter
    alphabet makes every example adversarial for tie-breaking."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="aab", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4), st.integers(1, 4))
    def check(texts, n_merges):
        docs = _docs(spark, list(enumerate(texts)))
        merges = bpe.train_bpe(docs, n_merges=n_merges, checkpoint_every=2)
        assert merges == _py_train(texts, n_merges)
        got = {
            r["doc_id"]: list(r["pieces"])
            for r in bpe.encode_docs_bpe(docs, merges).collect()
        }
        want = {
            i: _py_encode(t, merges)
            for i, t in enumerate(texts)
            if _py_tokens(t)
        }
        assert got == want

    check()
