"""BM25 scoring expressions (Okapi BM25, Robertson idf).

The reference stores a boolean index (term → doc-id set, ``Index.kt:9``)
and returns unranked conjunctive matches; the north rule extends this to
BM25 top-k. Scores are computed as pure Spark SQL expressions — JVM-side,
whole-stage-codegen'd; numpy re-implementations live in ``oracle.py`` and
the block-max codec.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

with k1 = 1.2, b = 0.75.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf_expr(df_col: Column, n_docs: Column) -> Column:
    """Robertson idf; non-negative for any df ≤ N."""
    return F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_weight(
    tf_col: Column, df_col: Column, doc_len: Column, n_docs: Column, avgdl: Column
) -> Column:
    """Per (term, doc) BM25 contribution; sum over query terms = score."""
    tf = tf_col.cast("double")
    norm = F.lit(K1) * (
        F.lit(1.0) - F.lit(B) + F.lit(B) * doc_len.cast("double") / avgdl
    )
    return idf_expr(df_col, n_docs) * tf * F.lit(K1 + 1.0) / (tf + norm)
