"""Heavy hitters without a full-vocabulary shuffle — two-pass
Misra-Gries (mergeable-summaries) frequent-item detection.

``hot_shingles``/``ngram_counts`` count exactly: one map-side-combined
shuffle whose key space is the DISTINCT vocabulary.  That is the right
default (combiners absorb the hot keys), but at web scale a long-tail
vocabulary (shingles, n-grams, URLs) can make even the combined
exchange enormous when all the user wants is "which items exceed φ of
the corpus".  The classic answer is the Misra-Gries summary (Misra &
Gries 1982) with the mergeability result of Agarwal, Cormode, Huang,
Phillips, Wei & Yi, "Mergeable Summaries" (PODS 2012): a k-counter MG
summary understates any item's true count by at most the summary's
accumulated decrement ``err``, and summaries merge by adding counts and
re-truncating.  No reference analogue (the reference has no
approximate operators); this completes the textstats family with the
sketch tier the exact operators fall back from at 100 TB.

Two passes, both shuffle-light:

* **Pass 1 (sketch, zero shuffle):** one ``mapInPandas`` over the
  exploded token stream keeps a k-counter MG summary per partition
  (vectorized: per-Arrow-batch ``value_counts`` folded into the dict,
  MG truncation subtracts the (k+1)-th largest count and accrues it
  into ``err``).  Each partition emits ≤ k ``(item, cnt)`` rows plus
  ONE sentinel row carrying its ``(err, n_tokens)`` — the whole
  relation is ≤ partitions × (k+1) rows, independent of vocabulary.
* **Candidate admission (pure SQL on the tiny summary relation):** an
  item's true count is bounded by ``Σ stored cnt + Σ err`` (each
  partition understates by ≤ its err, including partitions that
  dropped the item entirely), so items with
  ``lower_bound + total_err < ceil(min_frac · N)`` are provably NOT
  heavy and are discarded without a second look.
* **Pass 2 (exact verify):** exact counts for the surviving candidates
  only — the token scan re-runs with a broadcast semi-join on the
  candidate set, so the counting shuffle carries ≤ |candidates|
  distinct keys.  The final filter is exact; the output is EXACTLY the
  set an exact full count would return (superset admission + exact
  rerank — the same certify-then-verify shape as the int8 ANN tier).

Guarantee: with ``k ≥ 2/min_frac`` (the default) the candidate set
provably contains every item with count ≥ min_frac·N; the exact pass
then makes the result equal to the exact computation at ANY
parallelism (differential-tested, 1 vs 7 partitions, plus a
hypothesis sweep).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column

SUMMARY_SCHEMA = "item string, cnt long, err long, n_tokens long"


def _mg_truncate(cnt: dict, k: int) -> int:
    """Misra-Gries truncation: keep the k largest counters, subtract
    the (k+1)-th largest count from the survivors (and drop anything
    non-positive).  Returns the decrement added to the summary's
    accumulated error."""
    if len(cnt) <= k:
        return 0
    by_count = sorted(cnt.values(), reverse=True)
    dec = by_count[k]
    survivors = {i: c - dec for i, c in cnt.items() if c > dec}
    cnt.clear()
    cnt.update(survivors)
    return dec


def _token_items(corpus: DataFrame, text_col: str) -> DataFrame:
    return corpus.select(
        F.explode(
            tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("item")
    )


def mg_summaries_items(items: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ANY single-string-column
    item stream (tokens, shingles, URLs, …): ≤ k ``(item, cnt)`` rows
    per partition plus one sentinel row (``item IS NULL``) carrying the
    partition's accumulated ``err`` and exact ``n_tokens``.  Zero
    shuffle; Arrow-batched.  The first column is the item; any other
    columns are ignored.  NULL items are excluded from the stream —
    and from ``n_tokens`` — BEFORE sketching: ``value_counts`` (pass 1)
    and the semi-join (pass 2) both drop nulls, so counting them into
    N would inflate every φ·N threshold with rows no item can ever
    match (real in the URL/domain streams, where a failed host parse
    yields NULL)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    tokens = items.select(F.col(items.columns[0]).alias("item")).filter(
        F.col("item").isNotNull()
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cnt: dict = {}
        err = 0
        n = 0
        for b in batches:
            if not len(b):
                continue
            n += len(b)
            for item, c in b["item"].value_counts().items():
                cnt[item] = cnt.get(item, 0) + int(c)
            # bounded working set: truncate when the dict overshoots
            # (4k keeps truncation rare without growing memory)
            if len(cnt) > 4 * k:
                err += _mg_truncate(cnt, k)
        err += _mg_truncate(cnt, k)
        items = list(cnt)
        yield pd.DataFrame(
            {
                "item": items + [None],
                "cnt": [cnt[i] for i in items] + [0],
                "err": [0] * len(items) + [err],
                "n_tokens": [0] * len(items) + [n],
            }
        )

    return tokens.mapInPandas(run, SUMMARY_SCHEMA)


def mg_summaries(
    corpus: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """Token-stream convenience wrapper over
    :func:`mg_summaries_items` (the engine's single tokenizer)."""
    return mg_summaries_items(_token_items(corpus, text_col), k)


def heavy_hitters_items(
    items: DataFrame,
    min_frac: float,
    k: int | None = None,
) -> DataFrame:
    """``(item, n)`` — the EXACT count of every item whose frequency in
    the stream is at least ``min_frac`` of all items (``n ≥
    ceil(min_frac · N)``), computed without ever shuffling the full
    key space.  Works over ANY single-string-column relation (the
    first column is the item): tokens, shingles, URLs, n-grams.
    Output equals the exact full count's answer (the sketch only
    prunes provably-light items; survivors are re-counted exactly).

    ``items`` is scanned twice (sketch + exact verify) — cache or
    checkpoint upstream if it is expensive to recompute."""
    if not 0 < min_frac <= 1:
        raise ValueError("min_frac must be in (0, 1]")
    if k is None:
        k = min(int(math.ceil(2.0 / min_frac)), 100_000)
    # same null contract as the sketch: N counts countable items only
    tokens = items.select(F.col(items.columns[0]).alias("item")).filter(
        F.col("item").isNotNull()
    )
    summ = mg_summaries_items(tokens, k).localCheckpoint(eager=True)
    totals = summ.groupBy().agg(
        F.sum("err").alias("total_err"), F.sum("n_tokens").alias("n_total")
    )
    cand = (
        summ.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("lb"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("lb") + F.col("total_err")
            >= F.ceil(F.lit(min_frac) * F.col("n_total"))
        )
        .select("item", "n_total")
    )
    return (
        tokens.join(F.broadcast(cand.select("item")), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("n") >= F.ceil(F.lit(min_frac) * F.col("n_total"))
        )
        .select("item", "n")
    )


def heavy_hitters(
    corpus: DataFrame,
    min_frac: float,
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """Token-stream convenience wrapper over
    :func:`heavy_hitters_items`: the exact φ-heavy tokens of a corpus
    (see the module docstring for the two-pass guarantee)."""
    return heavy_hitters_items(_token_items(corpus, text_col), min_frac, k=k)
