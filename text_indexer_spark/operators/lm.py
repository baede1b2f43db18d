"""Bigram language-model scoring — CCNet-style statistical quality
filtering.

The CCNet pipeline (Wenzek et al., public) buckets web documents by
language-model perplexity: text that a corpus-trained LM finds
predictable is prose; text it finds surprising is lorem-ipsum, menus,
base64, or keyword stuffing.  The heavy pipelines use a KenLM model; the
engine-native equivalent is an add-k-smoothed bigram model whose
training AND scoring are both plain DataFrame algebra — no model
binaries, no Python in the hot path, and an exact SQL twin for the
oracle.  No reference analogue (the reference indexes, it does not
filter), but this is a first-class operator of a 100 TB training-data
pipeline: score once, then threshold/bucket like ``quality_scores``.

Model: P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V), where c(w1 w2) is
the corpus bigram count, c(w1) the corpus token count of ``w1``, V the
unigram vocabulary size, and k the add-k pseudo-count.  One formula
covers every OOV case: unseen bigrams and unseen prefixes just see
their counts coalesce to 0 — no special-cased backoff to keep the SQL
twin honest.

Scale shape:

* Training is two hash aggregations with map-side combine (bigram
  counts, unigram counts) — shuffle volume is |distinct n-grams|, not
  |tokens| (same argument as ``cooccur.ngram_counts``).
* Scoring joins each bigram OCCURRENCE against the two count tables.
  The tables are vocabulary-bounded; at gate scale Spark broadcasts
  them on its own, at web scale they exceed the broadcast threshold
  and AQE picks shuffle joins on (w1, w2)/(w1) — hot prefixes ("the",
  "of") are exactly the keys AQE's skew splitting handles.
* Per-bigram log-probs are SCALED TO INTEGERS (×10^7, rounded) before
  the per-doc sum — integer addition is exact and associative, so the
  per-doc total is bit-identical at ANY parallelism and in any engine
  (a rounded DOUBLE sum is not: two summation orders can land on
  opposite sides of a rounding boundary — observed once in 500 docs
  when this used the Naive-Bayes-gate discipline of round-then-sum).
  The average divides the exact integer sum and rounds once (5 dp);
  the perplexity exponentiates that already-rounded value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column

LOGP_SCALE = 10_000_000  # 7 dp fixed-point for exact, order-free sums
AVG_ROUND = 5
PPL_ROUND = 3


def _doc_bigrams(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, w1, w2)`` — one row per bigram OCCURRENCE (order-free
    multiset; scoring only needs counts per doc)."""
    toks = tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return corpus.select(
        F.col(id_col), F.explode(pairs).alias("_p")
    ).select(id_col, "_p.w1", "_p.w2")


def train_bigram_lm(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Corpus count tables: ``{"bigrams": (w1, w2, c12),
    "unigrams": (w1, c1), "v": vocabulary size}``.  Pure aggregation —
    the "model" is two relations and a scalar, checkpoint-free and
    engine-portable."""
    bigrams = (
        _doc_bigrams(corpus, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("c12"))
    )
    unigrams = (
        corpus.select(
            F.explode(
                tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("w1")
        )
        .groupBy("w1")
        .agg(F.count("*").cast("double").alias("c1"))
    )
    return {"bigrams": bigrams, "unigrams": unigrams, "v": unigrams.count()}


def score_bigram_lm(
    corpus: DataFrame,
    model: dict,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: ``(doc_id, n_bigrams, avg_logp, ppl)`` — mean
    bigram log-probability under the model and its perplexity
    ``exp(-avg_logp)``.  Docs with fewer than two tokens have no
    bigrams and are absent (score them by falling back to
    ``quality_scores``' length cuts — a 1-token doc has no LM
    evidence).  Left joins + coalesce(0) make unseen bigrams/prefixes
    score through the same smoothed formula, so any corpus can be
    scored against any model (decontaminated split, held-out shard,
    streaming batch)."""
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    v = float(model["v"])
    big = _doc_bigrams(corpus, id_col, text_col)
    scored = (
        big.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["unigrams"], ["w1"], "left")
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0.0)) + F.lit(k))
                    / (F.coalesce(F.col("c1"), F.lit(0.0)) + F.lit(k * v))
                )
                * F.lit(float(LOGP_SCALE)),
                0,
            )
            .cast("long")
            .alias("ilogp"),
        )
    )
    avg = F.round(
        (F.sum("ilogp").cast("double") / F.count("*"))
        / F.lit(float(LOGP_SCALE)),
        AVG_ROUND,
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        avg.alias("avg_logp"),
        F.round(F.exp(-avg), PPL_ROUND).alias("ppl"),
    )


def lm_self_score(
    corpus: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train on the corpus and score the same corpus — the CCNet usage
    (the model IS the corpus statistics; outlier docs surface as
    high-perplexity)."""
    return score_bigram_lm(
        corpus, train_bigram_lm(corpus, id_col, text_col), k, id_col, text_col
    )
