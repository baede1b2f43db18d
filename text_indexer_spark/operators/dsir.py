"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram profile
looks like a small TARGET corpus.

The published recipe, re-expressed as DataFrame algebra end to end:

* **Features** — every word unigram and bigram of a document, hashed
  into ``n_buckets`` buckets.  The hash is the engine's content-stable
  md5 bucket (first 8 hex digits mod B — the ``sampling.uniform_hash``
  construction), so the DuckDB oracle computes the identical bucket
  for every gram and the whole train+score pipeline replays in SQL.
* **Model** — two bag-of-buckets multinomials with add-k smoothing,
  one fit on the target sample, one on the raw corpus:
  ``p[b] = (c_t[b] + k) / (N_t + k·B)`` (same for ``q`` from the raw
  counts).  Fitting is ONE map-side-combined aggregation per side —
  the shuffle carries ≤ B distinct keys, never tokens.  The log-ratio
  table ``λ[b] = ln p[b] − ln q[b]`` is materialized over the full
  ``range(B)`` bucket spine, so scoring never needs a special OOV
  path: every possible bucket has a row.
* **Importance score** — ``log w(doc) = Σ_b c_doc[b]·λ[b]``.
  Per-bucket λ is scaled to a ×10⁷ integer before the per-doc sum
  (the ``lm.py`` discipline): integer sums are exact and order-free,
  so scores are bit-identical at any parallelism and in any engine;
  the single float division of identical integer operands is IEEE
  correctly-rounded, hence also bit-identical.
* **Resampling** — the paper draws docs ∝ w without replacement;
  the deterministic equivalent is Gumbel top-k: key =
  ``log w + g`` with ``g = −ln(−ln(u))`` and ``u`` the content-stable
  md5 uniform of the doc id (never exactly 0 or 1: ``(h + 0.5)/2³²``).
  Same row → same draw on any cluster, any rerun; ties break on
  doc_id.  Take the n largest keys.

Scale shape: the raw-side counts are derived from the SAME per-doc
feature frame the scorer consumes (one extraction subtree, shared
structurally); everything that shuffles is bucket-grain (≤ B rows) or
doc-grain count pairs.  The λ join is a
B-bounded relation — the optimizer broadcasts it under the threshold,
AQE shuffles it beyond (the urlfilter/--max-ppl precedent: no forced
broadcast of caller-sized relations).  No Python in any hot path.

No reference analogue (the reference indexes, it does not select
training data); this is the model-based data-selection tier next to
the rule-based cuts (quality/repetition/LM-ppl) and the mixture
sampler (``mixing.py``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column, word_ngrams_column

#: Fixed-point scale for per-bucket log-ratios (exact, order-free doc
#: sums — see lm.py for the measured double-sum failure mode).
LAMBDA_SCALE = 10_000_000
SCORE_ROUND = 5
DEFAULT_BUCKETS = 1 << 16
_DENOM = float(1 << 32)


def hash_bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable bucket id ∈ [0, n_buckets): first 8 md5 hex
    digits as an integer, mod B (DuckDB twin:
    ``('0x' || substr(md5(g), 1, 8))::BIGINT % B``)."""
    h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return (h % F.lit(int(n_buckets))).alias("bucket")


def doc_features(
    corpus: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, bucket, c)`` — per-document hashed unigram+bigram
    occurrence counts.  One codegen scan (tokenize → gram arrays →
    explode) into one map-side-combined aggregation; docs with no
    tokens contribute no rows."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    text = F.coalesce(F.col(text_col), F.lit(""))
    grams = F.concat(
        tokenize_column(text), word_ngrams_column(text, 2)
    )
    return (
        corpus.select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(id_col, hash_bucket(F.col("gram"), n_buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_counts(
    corpus: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(bucket, c)`` — corpus-level hashed-feature counts (the
    sufficient statistics of one DSIR multinomial)."""
    return (
        doc_features(corpus, n_buckets, id_col, text_col)
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
    )


def log_ratio_table(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int,
    k: float = 0.5,
) -> DataFrame:
    """``(bucket, ilam)`` over the FULL ``range(n_buckets)`` spine:
    ``ilam = round((ln p̂[b] − ln q̂[b]) · 10⁷)`` with add-k smoothed
    multinomials.  Total by construction — scoring needs no OOV
    special case.  The two count relations are ≤ B rows; totals ride
    along as broadcast 1-row cross joins."""
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    spark = target_counts.sparkSession
    spine = spark.range(int(n_buckets)).select(F.col("id").alias("bucket"))
    t_tot = target_counts.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("double").alias("nt")
    )
    r_tot = raw_counts.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("double").alias("nr")
    )
    kb = float(k) * float(n_buckets)
    return (
        spine.join(target_counts.withColumnRenamed("c", "ct"), "bucket", "left")
        .join(raw_counts.withColumnRenamed("c", "cr"), "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(float(k)))
                        / (F.col("nt") + F.lit(kb))
                    )
                    - F.log(
                        (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(float(k)))
                        / (F.col("nr") + F.lit(kb))
                    )
                )
                * F.lit(float(LAMBDA_SCALE)),
                0,
            )
            .cast("long")
            .alias("ilam"),
        )
    )


def dsir_scores(
    corpus: DataFrame,
    target: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_feats, logw)`` — per-document DSIR importance
    log-weight of ``corpus`` toward ``target``: the raw-side
    multinomial is fit on ``corpus`` itself, the target side on
    ``target``.  Docs with no features (empty/NULL text) carry no
    evidence and are absent (the ``lm.py`` contract).  ``logw`` is the
    exact integer λ-sum divided by the scale and NOT re-rounded: the
    IEEE division of identical operands is bit-identical in every
    engine, whereas a 5-dp re-round of an exact integer ratio lands on
    a ``…5`` half-way lattice point for ~1 doc in 100 and Java
    (string-repr HALF_UP) and C (numeric scaling) disagree on the tie
    direction — observed as 4/5000 one-ulp diffs at sf0.1 before this
    was removed."""
    tc = bucket_counts(target, n_buckets, id_col, text_col)
    feats = doc_features(corpus, n_buckets, id_col, text_col)
    # raw-side counts derive from the SAME per-doc frame the scorer
    # consumes — structural subtree sharing, not a second extraction
    # left to Spark's exchange-reuse heuristic
    rc = feats.groupBy("bucket").agg(F.sum("c").alias("c"))
    lam = log_ratio_table(tc, rc, n_buckets, k)
    return (
        feats.join(lam, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            (
                F.sum(F.col("c") * F.col("ilam")).cast("double")
                / F.lit(float(LAMBDA_SCALE))
            ).alias("logw"),
        )
    )


def gumbel_key(logw: Column, id_col: Column, salt: str = "dsir1") -> Column:
    """Deterministic Gumbel perturbation of a log-weight: ``logw −
    ln(−ln(u))`` with ``u = (md5-uniform(id) + 0.5)/2³²`` (never 0 or
    1, so both logs are finite in every engine)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(id_col.cast("string"), F.lit("|" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_DENOM)
    return F.round(logw - F.log(-F.log(u)), SCORE_ROUND)


def dsir_resample(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    n_buckets: int = DEFAULT_BUCKETS,
    k: float = 0.5,
    salt: str = "dsir1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, logw, key)`` — the ``n`` documents DSIR selects:
    Gumbel top-k over the importance weights (sampling without
    replacement ∝ w, made deterministic by the content-stable uniform).
    Ties break on doc_id; the sort is a TakeOrderedAndProject (top-k,
    never a full global sort)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    scored = dsir_scores(corpus, target, n_buckets, k, id_col, text_col)
    return (
        scored.select(
            id_col,
            "logw",
            gumbel_key(F.col("logw"), F.col(id_col), salt).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(int(n))
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    n_buckets: int = DEFAULT_BUCKETS,
    k: float = 0.5,
    salt: str = "dsir1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The selected corpus rows themselves (all original columns):
    ``dsir_resample``'s id set semi-joined back into the corpus."""
    picked = dsir_resample(
        corpus, target, n, n_buckets, k, salt, id_col, text_col
    ).select(id_col)
    return corpus.join(picked, id_col, "left_semi")
