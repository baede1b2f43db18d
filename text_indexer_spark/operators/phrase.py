"""Phrase and proximity matching — positional queries over the corpus.

The reference is a boolean membership index (``Index.kt:9``: token →
doc-id set — no positions), so phrase search is an ENGINE EXTENSION:
conjunctive AND (J1) strengthened with token-position constraints.
Implemented query-time over the tokenized corpus (no index-format
change): positions come from ``posexplode`` of the SAME tokenizer the
index uses, so phrase semantics are tokenizer-faithful (punctuation and
case behave exactly like indexed terms — a raw substring match would
not be).

Scale shape: the first phrase term's postings are filtered FIRST (the
rarest-first heuristic belongs to the caller via term order), then each
subsequent term joins on (doc, position+i) — equi-joins on composite
keys, no theta join; each join's build side is one term's positional
postings, pruned by the term filter at the scan. For a served system
the same joins run against a positional postings table
(term, doc_id, pos) built once — the operator takes either a corpus or
a prebuilt positional table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, pos): the positional postings relation (0-based
    token positions, duplicates kept — one row per occurrence)."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "term"),
    )


def phrase_match(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids containing the EXACT consecutive token sequence
    ``phrase`` (tokenizer-faithful). Empty phrase → empty result (the
    empty-token guard, same policy as conjunctive search)."""
    spark = df.sparkSession
    if not phrase:
        return spark.createDataFrame([], f"{id_col} long")
    posts = positional_postings(df, text_col, id_col)
    base = posts.filter(F.col("term") == phrase[0]).select(
        id_col, F.col("pos").alias("p0")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = posts.filter(F.col("term") == term).select(
            id_col, (F.col("pos") - i).alias("p0")
        )
        base = base.join(nxt, [id_col, "p0"], "left_semi")
    return base.select(id_col).distinct()


def proximity_match(
    df: DataFrame,
    terms: list[str],
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids where ALL ``terms`` occur within some ``window``
    consecutive tokens (unordered NEAR/w). Anchor = the first term:
    every other term must appear within [anchor − w + 1, anchor + w − 1]
    and the full span must fit in ``window`` — checked exactly via
    min/max positions per anchor occurrence."""
    spark = df.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long")
    uniq = list(dict.fromkeys(terms))
    posts = positional_postings(df, text_col, id_col)
    anchor = posts.filter(F.col("term") == uniq[0]).select(
        id_col, F.col("pos").alias("apos")
    )
    cur = anchor.withColumn("minp", F.col("apos")).withColumn("maxp", F.col("apos"))
    for term in uniq[1:]:
        t = posts.filter(F.col("term") == term).select(
            id_col, F.col("pos").alias("tpos")
        )
        cur = (
            cur.join(t, id_col)
            .filter(
                (F.col("tpos") > F.col("apos") - window)
                & (F.col("tpos") < F.col("apos") + window)
            )
            .withColumn("minp", F.least("minp", "tpos"))
            .withColumn("maxp", F.greatest("maxp", "tpos"))
            .drop("tpos")
        )
    return (
        cur.filter(F.col("maxp") - F.col("minp") < window)
        .select(id_col)
        .distinct()
    )
