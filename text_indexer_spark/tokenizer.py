"""Tokenizer — parity with the reference's delimiter semantics.

The reference tokenizes with Java ``StringTokenizer`` after lowercasing,
using the delimiter set ``" -/.,;:()`<>'!?\"\\t\\n\\r\\f"`` and dropping
empty tokens (reference ``DocumentTokenizer.kt:18-25``; golden case
``DocumentTokenizerTest.kt:8-39``). Underscores and digits are NOT
delimiters and stay inside tokens.

This module is the single source of truth for that delimiter class:

* ``tokenize_column`` — pure JVM-side Spark expression
  (``split(lower(text))`` + empty filter): whole-stage-codegen'd, no
  Python in the hot path. This is the default tokenizer for the build.
* ``TOKENIZE_SQL_DUCKDB`` helpers — the identical regex rendered for
  DuckDB oracle SQL, so driver-side correctness checks compare the same
  semantics.
* ``tokenize_pandas_iter`` — an Arrow-vectorized pandas tokenizer used by
  ``mapInPandas`` build variants; exists to mirror the reference's
  pluggable-``DocumentTokenizer`` extension point (a per-``lang``
  tokenizer would slot in here) and is tested rank-identical to the
  expression path.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

# Delimiter class of DocumentTokenizer.kt:21 — space, dash, slash, dot,
# comma, semicolon, colon, parens, backtick, angle brackets, apostrophe,
# bang, question mark, double quote, tab, LF, CR, form feed. One-or-more
# collapses runs (StringTokenizer semantics); empties are filtered after
# the split for leading/trailing delimiters.
TOKEN_DELIM_REGEX = "[ \\t\\n\\r\\x0c\\-/.,;:()`<>'!?\"]+"

_PY_DELIM_RE = re.compile(TOKEN_DELIM_REGEX)


def tokenize_column(text: Column | str) -> Column:
    """``text -> array<string>`` of lowercased tokens, empties removed.

    Stays inside whole-stage codegen: lower → regex split → filter.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), TOKEN_DELIM_REGEX)
    return F.filter(toks, lambda t: F.length(t) > 0)


def word_ngrams_column(text: Column | str, n: int) -> Column:
    """``text -> array<string>`` of contiguous word ``n``-grams
    (space-joined tokens). A doc of L tokens yields exactly L−n+1 grams;
    docs shorter than ``n`` tokens yield an empty array. Pure codegen
    (``transform`` over an index ``sequence`` inside the scan
    projection) — shared by n-gram counts, decontamination and
    repetition stats so every consumer agrees on gram identity."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokenize_column(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duckdb_delim_regex_sql() -> str:
    """The same delimiter regex as a single-quoted DuckDB SQL literal."""
    return "'" + TOKEN_DELIM_REGEX.replace("\\", "\\").replace("'", "''") + "'"


def duckdb_tokens_sql(text_expr: str) -> str:
    """DuckDB fragment: ``text -> list<varchar>`` with the same semantics.

    Use with ``unnest(...)`` plus a ``token <> ''`` guard (DuckDB's
    regexp split keeps boundary empties just like Spark's).
    """
    return f"regexp_split_to_array(lower({text_expr}), {duckdb_delim_regex_sql()})"


def duckdb_word_ngrams_sql(text_expr: str, n: int) -> str:
    """DuckDB twin of :func:`word_ngrams_column` (same empty-array
    semantics for docs shorter than ``n`` tokens)."""
    toks = f"list_filter({duckdb_tokens_sql(text_expr)}, x -> x <> '')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
        f"ELSE []::VARCHAR[] END"
    )


def tokenize_text(text: str) -> list[str]:
    """Driver-side tokenizer for query strings (reference IndexerUI
    splits the query on commas; we accept free text and tokenize with the
    same delimiter class, matching ``DocumentTokenizer`` semantics)."""
    return [t for t in _PY_DELIM_RE.split(text.lower()) if t]


def tokenize_series(texts: "pd.Series") -> "pd.Series":
    """Vectorized pandas tokenizer: Series[str] -> Series[list[str]]."""
    parts = texts.fillna("").str.lower().str.split(TOKEN_DELIM_REGEX, regex=True)
    return parts.map(lambda toks: [t for t in toks if t])


def tokenize_postings_arrays(texts: "pd.Series"):
    """Arrow-native batch tokenizer for the build hot path.

    Series[str] -> (doc_idx, terms, tfs, doc_lens):

    * ``doc_idx``  int64[n_postings] — position of the doc in ``texts``
    * ``terms``    object[n_postings] — term strings
    * ``tfs``      int64[n_postings] — per-(doc, term) frequency
    * ``doc_lens`` int64[len(texts)] — token count per doc (post-filter)

    Same semantics as :func:`tokenize_series` + explode + groupby (tested
    equivalent), but lower/split/flatten run in Arrow C++ and the
    tf-grouping runs on dictionary codes (int64 sort) instead of Python
    string objects — the difference between interpreter-bound and
    memory-bandwidth-bound tokenization at 10^12 docs.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n_docs = len(texts)
    if n_docs == 0:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=object), z.copy(), z.copy()
    arr = pa.Array.from_pandas(texts.fillna(""), type=pa.string())
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), TOKEN_DELIM_REGEX)
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    dictarr = flat.dictionary_encode()
    if isinstance(dictarr, pa.ChunkedArray):
        dictarr = dictarr.combine_chunks()
    codes = dictarr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(dictarr.dictionary.to_pandas(), dtype=object)
    # StringTokenizer semantics: boundary splits yield empty tokens — drop
    keep = np.ones(codes.size, dtype=bool)
    empty_code = None
    for i, v in enumerate(vocab):
        if v == "":
            empty_code = i
            break
    if empty_code is not None:
        keep = codes != empty_code
    codes, doc_idx = codes[keep], doc_idx[keep]
    doc_lens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if codes.size == 0:
        return (
            np.empty(0, dtype=np.int64), np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64), doc_lens,
        )
    key = doc_idx * np.int64(len(vocab)) + codes
    uniq_keys, tf = np.unique(key, return_counts=True)
    out_doc = uniq_keys // len(vocab)
    out_code = uniq_keys % len(vocab)
    return out_doc, vocab[out_code], tf.astype(np.int64), doc_lens


def tokenize_postings_positions(texts: "pd.Series"):
    """Positional variant of :func:`tokenize_postings_arrays`.

    Returns (doc_idx, terms, tfs, doc_lens, positions): the first four
    exactly as the non-positional path produces them (identical order —
    differential-tested), plus ``positions`` — token positions (0-based,
    post-empty-filter, matching ``posexplode(tokenize_column(...))``)
    flattened per posting in posting order, ascending within a posting.

    Costs one lexsort over (doc, code, pos) where the tf-only path uses
    ``np.unique`` over a fused key — same O(n log n) class; the
    positional payload itself (~1 value per token) is the inherent price
    of a positional index.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n_docs = len(texts)
    z = np.empty(0, dtype=np.int64)
    if n_docs == 0:
        return z, np.empty(0, dtype=object), z.copy(), z.copy(), z.copy()
    arr = pa.Array.from_pandas(texts.fillna(""), type=pa.string())
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), TOKEN_DELIM_REGEX)
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    dictarr = flat.dictionary_encode()
    if isinstance(dictarr, pa.ChunkedArray):
        dictarr = dictarr.combine_chunks()
    codes = dictarr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(dictarr.dictionary.to_pandas(), dtype=object)
    keep = np.ones(codes.size, dtype=bool)
    for i, v in enumerate(vocab):
        if v == "":
            keep = codes != i
            break
    codes, doc_idx = codes[keep], doc_idx[keep]
    doc_lens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if codes.size == 0:
        return z, np.empty(0, dtype=object), z.copy(), doc_lens, z.copy()
    # position within doc AFTER the empty filter (posexplode semantics)
    starts = np.concatenate([[0], np.cumsum(doc_lens)[:-1]])
    pos = np.arange(codes.size, dtype=np.int64) - np.repeat(starts, doc_lens)
    # group to postings: sort by (doc, code); stable keeps pos ascending
    key = doc_idx * np.int64(len(vocab)) + codes
    order = np.argsort(key, kind="stable")
    skey, spos = key[order], pos[order]
    change = np.empty(skey.size, dtype=bool)
    change[0] = True
    np.not_equal(skey[1:], skey[:-1], out=change[1:])
    pstarts = np.flatnonzero(change)
    tf = np.diff(np.append(pstarts, skey.size)).astype(np.int64)
    uniq_keys = skey[pstarts]
    out_doc = uniq_keys // len(vocab)
    out_code = uniq_keys % len(vocab)
    return out_doc, vocab[out_code], tf, doc_lens, spos


def tokenize_pandas_iter(
    batches: Iterator["pd.DataFrame"],
    text_col: str = "content",
    id_col: str = "doc_id",
) -> Iterator["pd.DataFrame"]:
    """mapInPandas body: (id, text) batches -> (id, term, tf) batches.

    Emits per-document term frequencies (the reference discards tf by
    collapsing duplicates into a set, ``Index.kt:9``; BM25 needs it, so we
    keep it — recoverable because the reference tokenizer emits ordered
    duplicates, ``Document.kt:18``).
    """
    import pandas as pd

    for batch in batches:
        if batch.empty:
            continue
        toks = tokenize_series(batch[text_col])
        exploded = pd.DataFrame(
            {id_col: batch[id_col].repeat(toks.str.len()).values,
             "term": [t for doc in toks for t in doc]}
        )
        if exploded.empty:
            yield pd.DataFrame({id_col: [], "term": [], "tf": []}).astype(
                {id_col: "int64", "term": "object", "tf": "int64"}
            )
            continue
        tf = (
            exploded.groupby([id_col, "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        yield tf
