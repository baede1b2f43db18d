"""Benchmark decontamination — drop training documents that overlap an
evaluation set.

The standard LLM-pipeline hygiene step (GPT-3 appendix C / PaLM style):
a training doc is *contaminated* if it shares any contiguous word
n-gram (n≈8-13 for prose; configurable) with any document of the
benchmark/eval set. No reference analogue — the reference indexes a
static corpus (`DocumentsIndexer.kt`) — but this is a first-class
operator of any 100 TB training-data pipeline built on this engine.

Scale shape (the part that matters at 100 TB):

* The eval set is SMALL (benchmarks are thousands of docs, not
  billions). Its distinct n-gram set is built once and **broadcast** —
  the corpus side never shuffles its grams anywhere.
* Corpus grams are produced inside the scan projection
  (`word_ngrams_column` — pure codegen, L−n+1 grams per doc, no
  Python) and hit the broadcast hash table map-side. The only shuffle
  in `contamination_hits` is the final per-doc count aggregation, whose
  input is already reduced to the (rare) hit rows.
* `decontaminate` keeps the corpus scan intact and removes flagged
  docs with a left-anti join against the (tiny) contaminated-id set —
  also broadcast, so the cleaned corpus is a single pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import word_ngrams_column


def eval_ngrams(
    evalset: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the evaluation set: ``(gram)``.

    Small by construction (|eval docs| × avg_len); intended to be
    broadcast by the callers below.
    """
    return (
        evalset.select(
            F.explode(word_ngrams_column(F.coalesce(F.col(text_col), F.lit("")), n))
            .alias("gram")
        )
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_grams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated doc: ``(doc_id, n_hits)`` where ``n_hits`` is
    the number of DISTINCT eval n-grams the doc contains. Docs with no
    overlap are absent (the common case — keep the output sparse)."""
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams_column(F.coalesce(F.col(text_col), F.lit("")), n))
        .alias("gram"),
    ).dropDuplicates([id_col, "gram"])
    hits = grams.join(F.broadcast(eval_grams), "gram")
    return hits.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_hits")
    )


def decontaminate(
    corpus: DataFrame,
    eval_grams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The cleaned corpus: every row of ``corpus`` whose text shares no
    word n-gram with the eval set. Two corpus scans (flag, then filter)
    but ZERO corpus shuffles: the contaminated-id set is tiny and rides
    along as a broadcast anti-join, so the cleaned output streams
    straight from the second scan."""
    bad = contamination_hits(corpus, eval_grams, n, id_col, text_col).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
