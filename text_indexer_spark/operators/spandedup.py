"""Exact repeated-substring (span) deduplication — remove every token
span that occurs more than once in the corpus.

The ExactSubstr rule of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better"): memorization and benchmark leakage ride
on long VERBATIM repeats — licence blocks, quoted passages, templated
paragraphs — that document-level (``dedup.py``), line-level
(``linededup.py``) and near-dup (``cluster.py``) tiers all miss when the
surrounding document differs.  The paper removes any ≥50-token substring
with more than one occurrence corpus-wide via a suffix array; a suffix
array is a single global order — the wrong primitive on a cluster.  The
distributed equivalent below gets the same removal semantics from
shingles: a maximal repeated span of length ``m ≥ n`` is exactly a run
of ``m − n + 1`` repeated ``n``-token shingles, so marking every
duplicated shingle's ``[start, start+n)`` token window and unioning the
windows reconstructs the paper's spans without any global sort.  No
reference analogue (the reference indexes a static corpus,
``DocumentsIndexer.kt``) — this completes the dedup ladder of a 100 TB
training-data pipeline: exact-doc → line → SPAN → MinHash/SimHash near-dup.

Semantics (deterministic at any parallelism — pure set logic, no
scan-order dependence):

* a shingle is every contiguous ``n``-token window (step 1) of the
  tokenized document; identity is the space-joined lowercased token
  string (same gram identity as ``word_ngrams_column`` /
  decontamination, so all consumers agree);
* a shingle is *duplicated* when its total occurrence count corpus-wide
  is ≥ ``min_count`` (default 2) — within-document repeats count, as in
  the paper ("keep the first occurrence" needs a global scan order and
  has no stable meaning on a distributed corpus; we remove ALL
  occurrences, the conservative variant the paper also evaluates);
* every token covered by any duplicated shingle is removed; survivors
  are reassembled in original order.  Documents shorter than ``n``
  tokens emit no shingles and pass through untouched.  Documents left
  with zero surviving tokens are dropped (same contract as
  ``linededup.dedup_lines``).

Scale shape (the part that matters at 100 TB) — deliberately the
``linededup`` shape one grain finer:

* ONE map-side-combined count aggregation at shingle grain: occurrences
  carry ``(digest, doc_id, start)`` where ``digest = md5(gram)`` — a
  fixed 16-byte key so the exchange never moves gram text.  The count
  is sum-mergeable, so partial aggregation absorbs the hot boilerplate
  keys before the shuffle.
* ONE semi-join of occurrences against the duplicated-digest set —
  NOT broadcast: at 100 TB the duplicated-shingle set of the web is
  tens of GB, and its hottest keys are exactly the boilerplate this
  operator exists to kill; AQE skew handling splits them across tasks.
* Removal is a token-grain ``left_anti`` join of ``(doc_id, pos)``
  token rows against the covered-position set — the covered set is
  pre-deduped per partition (``distinct`` with partial aggregation)
  so a position covered by many overlapping duplicated shingles
  exchanges once.
* Reassembly restores order INSIDE the row (``sort_array`` over
  ``struct(pos, tok)`` after ``collect_list``) — no sort exchange, no
  window function, no per-row quadratic interval logic anywhere.

Everything is built-in expressions (codegen) + shuffles; no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column

#: default span width in tokens.  Lee et al. use 50; the default here is
#: deliberately smaller so small test corpora exercise the operator —
#: pass ``n=50`` for the paper's setting.
DEFAULT_N = 8


def _tokens(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, toks)`` — lowercased delimiter-split tokens (the engine's
    single tokenizer), NULL text treated as empty."""
    toks = tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
    return corpus.select(F.col(id_col), toks.alias("toks"))


def _shingle_starts(toks: Column, n: int) -> Column:
    """1-based start positions of every ``n``-token window; empty for
    docs shorter than ``n`` tokens."""
    return F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))


def shingle_occurrences(
    corpus: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per shingle occurrence: ``(id, start, digest)``.

    ``digest = md5(space-joined window)`` — constant-width key so the
    count exchange and the semi-join never carry gram text.  The window
    text itself never leaves the scan projection.
    """
    t = _tokens(corpus, id_col, text_col)
    return t.select(
        id_col,
        F.explode(_shingle_starts(F.col("toks"), n)).alias("start"),
        F.col("toks"),
    ).select(
        id_col,
        "start",
        F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("start"), n)))
        .alias("digest"),
    )


def duplicated_digests(
    occ: DataFrame, min_count: int = 2
) -> DataFrame:
    """``(digest)`` of shingles with ≥ ``min_count`` total occurrences.
    Two-phase count with map-side combine; the output set is the
    boilerplate tail — small relative to the corpus but NOT assumed
    broadcastable (see module docstring)."""
    return (
        occ.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("digest")
    )


def covered_positions(
    corpus: DataFrame,
    n: int = DEFAULT_N,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, pos)`` — every 1-based token position covered by at least
    one duplicated shingle.  ``distinct`` collapses the ×``n`` overlap
    blow-up with partial aggregation before the exchange."""
    occ = shingle_occurrences(corpus, n, id_col, text_col)
    dup = duplicated_digests(occ, min_count)
    hits = occ.join(dup, "digest", "left_semi")
    return hits.select(
        id_col,
        F.explode(
            F.sequence(F.col("start"), F.col("start") + (n - 1))
        ).alias("pos"),
    ).distinct()


def _token_positions(
    corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    t = _tokens(corpus, id_col, text_col)
    return t.select(
        id_col, F.posexplode(F.col("toks")).alias("_p0", "tok")
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "tok")


def span_dedup_stats(
    corpus: DataFrame,
    n: int = DEFAULT_N,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document audit: ``(id, n_tokens, n_removed, removed_frac)``
    for every document with ≥ 1 token.  ``removed_frac`` is rounded to
    4 places (display only — filters should use the raw counts)."""
    tp = _token_positions(corpus, id_col, text_col)
    totals = tp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    removed = (
        covered_positions(corpus, n, min_count, id_col, text_col)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_removed"))
    )
    return totals.join(removed, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
        F.round(
            F.coalesce(F.col("n_removed"), F.lit(0)) / F.col("n_tokens"),
            4,
        ).alias("removed_frac"),
    )


def dedup_spans(
    corpus: DataFrame,
    n: int = DEFAULT_N,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, text)`` — surviving tokens space-joined in original
    order; documents with zero surviving tokens (fully duplicated) are
    dropped.  Output text is the TOKENIZED rendering (lowercased,
    delimiter-collapsed): span identity lives at token grain, so that
    is the grain the cleaned corpus is emitted at — the same contract
    as ``linededup`` applied to its derived line corpus."""
    tp = _token_positions(corpus, id_col, text_col)
    cov = covered_positions(corpus, n, min_count, id_col, text_col)
    kept = tp.join(cov, [id_col, "pos"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias(text_col)
    )
