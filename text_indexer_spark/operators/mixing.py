"""Data-mixture sampling — hit a per-source token budget, the "data
mixing" stage of an LLM training pipeline (domain/language reweighting
à la The Pile / CCNet mixture tables).

Given mixture ``weights`` over a source column (domain, language,
corpus slice) and a ``total_tokens`` budget, each source s gets a
deterministic keep rate

    rate_s = min(1, total_tokens · w_s / Σw / available_tokens_s)

and a document survives iff its content-stable hash draw
(:func:`sampling.uniform_hash` — the md5 construction the DuckDB
oracles can replay) falls under its source's rate.  Doc-grain Bernoulli
sampling hits the budget IN EXPECTATION per source (token-exact packing
afterwards is ``textstats.pack_chunks``' job); ``min(1, ·)`` means an
under-resourced source contributes everything it has — the standard
behavior when a mixture over-asks a small domain (upsampling/epochs are
a training-loop concern, not a corpus-sampling one).  Sources absent
from ``weights`` are dropped (a mixture is an explicit allowlist).

No reference analogue (the reference indexes everything it is given).

Scale shape: one map-side-combined aggregation whose key space is the
SOURCE column (domains/languages — tiny), a broadcast of the ≤
|sources| rate rows back onto the corpus, and a row-local hash filter
fused into the scan.  Zero corpus shuffles; deterministic at any
parallelism, across reruns and resumes (same row → same draw, the
``sampling.py`` contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.operators.sampling import uniform_hash
from text_indexer_spark.tokenizer import tokenize_column


def _with_tokens(corpus: DataFrame, text_col: str) -> DataFrame:
    return corpus.withColumn(
        "_n_tok",
        F.size(tokenize_column(F.coalesce(F.col(text_col), F.lit("")))),
    )


def mixture_rates(
    corpus: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """``(source, avail_tokens, target_tokens, rate)`` per weighted
    source — the audit relation :func:`mixture_sample` filters with.
    ``rate`` is 0 for a weighted source with no tokens."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    tot_w = float(sum(weights.values()))
    if tot_w <= 0:
        raise ValueError("weights must sum to > 0")
    spark = corpus.sparkSession
    w = spark.createDataFrame(
        [(s, float(x)) for s, x in sorted(weights.items())],
        f"{source_col} string, _w double",
    )
    avail = (
        _with_tokens(corpus, text_col)
        .groupBy(source_col)
        .agg(F.sum("_n_tok").alias("avail_tokens"))
    )
    return (
        w.join(avail, source_col, "left")
        .select(
            source_col,
            F.coalesce(F.col("avail_tokens"), F.lit(0)).alias(
                "avail_tokens"
            ),
            (F.lit(float(total_tokens)) * F.col("_w") / F.lit(tot_w)).alias(
                "target_tokens"
            ),
        )
        .withColumn(
            "rate",
            F.when(F.col("avail_tokens") > 0,
                   F.least(
                       F.lit(1.0),
                       F.col("target_tokens") / F.col("avail_tokens"),
                   ))
            .otherwise(F.lit(0.0)),
        )
    )


def mixture_sample(
    corpus: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "mix1",
) -> DataFrame:
    """The mixed corpus: per-source deterministic Bernoulli keep at
    ``mixture_rates``' rate.  Expected kept tokens per source =
    ``min(target_tokens, avail_tokens)``; unweighted sources drop."""
    rates = mixture_rates(
        corpus, weights, total_tokens, source_col, text_col
    ).select(source_col, "rate")
    return (
        corpus.join(F.broadcast(rates), source_col)
        .filter(uniform_hash(F.col(key_col), salt) < F.col("rate"))
        .drop("rate")
    )
