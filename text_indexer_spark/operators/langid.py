"""Char-n-gram Naive Bayes language identification — a real, trainable
classifier (public method: multinomial NB over character n-grams, the
classic Cavnar-Trenkle / langid.py family), replacing the marker-lexicon
stand-in for corpus-scale routing.

Everything is declarative DataFrame ops — no Python UDFs anywhere:

- TRAIN: explode char n-grams → one (lang, gram) count shuffle → global
  top-V vocabulary (TakeOrdered, bounded) → Laplace log-probs. The
  model is tiny (V × L rows) and broadcast for inference.
- PREDICT: one (doc, gram) count shuffle, one broadcast join against
  the model, one per-doc aggregation, one per-doc window argmax.
  Out-of-vocabulary grams are exact, not dropped: each lang has a
  smoothed floor log-prob ``oov``, so

      score(d, l) = log prior(l) + n_total(d) · oov(l)
                    + Σ_{g ∈ vocab} n_g(d) · (logp(l, g) − oov(l))

  which needs only the INNER join on vocab grams.

Determinism across engines (the DuckDB oracle replays the same math):
log-probs are rounded to 7 decimals at train time and scores to 5
before the argmax, so double-summation-order differences (~1e-12)
cannot flip a prediction; ties break alphabetically on lang.

Scale shape: two shuffles keyed on (lang, gram) / (doc, gram), both
combiner-friendly; the vocab cut is a bounded TakeOrdered; every join
on the scoring path broadcasts model-sized tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NGRAM = 3
TOP_V = 2000
LOGP_ROUND = 7
SCORE_ROUND = 5


def char_ngrams(text_col: str, n: int = NGRAM):
    """Overlapping char n-grams of lower-cased text (array<string>);
    shorter texts yield the whole text as one gram; empty → []."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    short = F.when(F.length(t) > 0, F.array(t)).otherwise(
        F.array().cast("array<string>")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
        lambda i: F.substr(t, i, F.lit(n)),
    )
    return F.when(F.length(t) >= n, grams).otherwise(short)


def train_langid(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = NGRAM,
    top_v: int = TOP_V,
) -> dict[str, DataFrame]:
    """→ {'model': (lang, gram, adj), 'langs': (lang, logprior, oov)}.

    ``adj = round(logp,7) − round(oov,7)`` is pre-baked so predict sums
    one column. Laplace α=1; V = realized vocab size (ties at the top-V
    boundary break on gram asc, deterministically)."""
    grams = docs.select(
        F.col(label_col).alias("lang"),
        F.explode(char_ngrams(text_col, n)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("c"))
    vocab = (
        counts.groupBy("gram")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("gram"))
        .limit(top_v)
        .select("gram")
    )
    in_vocab = counts.join(F.broadcast(vocab), "gram")
    v_size = vocab.count()
    totals = in_vocab.groupBy("lang").agg(F.sum("c").alias("n_l"))
    priors = docs.groupBy(F.col(label_col).alias("lang")).agg(
        F.count("*").alias("n_docs")
    )
    n_total = docs.count()
    langs = (
        totals.join(priors, "lang", "full")
        .select(
            "lang",
            F.round(
                F.log(F.coalesce(F.col("n_docs"), F.lit(0)) / F.lit(float(n_total))),
                LOGP_ROUND,
            ).alias("logprior"),
            F.round(
                F.log(
                    F.lit(1.0)
                    / (F.coalesce(F.col("n_l"), F.lit(0)) + F.lit(float(v_size)))
                ),
                LOGP_ROUND,
            ).alias("oov"),
        )
    )
    model = (
        in_vocab.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "gram",
            (
                F.round(
                    F.log((F.col("c") + 1.0) / (F.col("n_l") + F.lit(float(v_size)))),
                    LOGP_ROUND,
                )
                - F.round(
                    F.log(F.lit(1.0) / (F.col("n_l") + F.lit(float(v_size)))),
                    LOGP_ROUND,
                )
            ).alias("adj"),
        )
    )
    return {"model": model, "langs": langs}


def predict_langid(
    docs: DataFrame,
    trained: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = NGRAM,
) -> DataFrame:
    """→ (doc_id, pred_lang). Docs with zero grams predict the
    alphabetically-first lang by prior-only score (deterministic)."""
    dg = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(char_ngrams(text_col, n)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("n_g"))
    )
    totals = dg.groupBy("doc_id").agg(F.sum("n_g").alias("n_tot"))
    # zero-gram docs still need a row
    totals = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .na.fill({"n_tot": 0})
    )
    adj = (
        dg.join(F.broadcast(trained["model"]), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("n_g") * F.col("adj")).alias("adj"))
    )
    scored = (
        totals.crossJoin(F.broadcast(trained["langs"]))
        .join(adj, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang",
            F.round(
                F.col("logprior")
                + F.col("n_tot") * F.col("oov")
                + F.coalesce(F.col("adj"), F.lit(0.0)),
                SCORE_ROUND,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )


def langid_self_predict(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = NGRAM,
    top_v: int = TOP_V,
) -> DataFrame:
    """Train on the corpus's own labels and predict every doc — the
    driver-gate shape (fully SQL-expressible, deterministic)."""
    return predict_langid(
        docs,
        train_langid(docs, label_col, text_col, n=n, top_v=top_v),
        text_col=text_col,
        id_col=id_col,
        n=n,
    )
