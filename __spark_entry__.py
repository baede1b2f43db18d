"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k query end-to-end on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its
DuckDB oracle (see text_indexer_spark/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from text_indexer_spark import (
    driver_queries,
    driver_queries_boolean,
    driver_queries_ext,
    driver_queries_hygiene,
    driver_queries_serving,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the FULL engine path — build the compressed sharded
    index from the sf0.001 documents table (stage A/B/C + manifest
    commit), then serve BM25 top-10 via block-max WAND over the
    persisted posting lists."""
    return driver_queries_ext.q_wand_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        **driver_queries.queries(),
        **driver_queries_ext.queries(),
        **driver_queries_serving.queries(),
        **driver_queries_boolean.queries(),
        **driver_queries_hygiene.queries(),
    }


def oracle_sql() -> dict[str, str]:
    return {
        **driver_queries.oracle_sql(),
        **driver_queries_ext.oracle_sql(),
        **driver_queries_serving.oracle_sql(),
        **driver_queries_boolean.oracle_sql(),
        **driver_queries_hygiene.oracle_sql(),
    }
