"""Source abstraction: Iceberg table when a catalog is configured, else
Parquet directories with the identical schema.

The reference's "scan" is a recursive filesystem walk
(``FileManager.kt:31-39``); at 10^12-file scale the scan is a table read
with predicate pushdown — never Python-side filesystem walking. This
module is the one place that knows how tables are materialized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table.

    If ``sf_dir`` looks like a catalog namespace (no path separator and
    not an existing directory), read via ``spark.read.table`` (Iceberg /
    metastore); otherwise read the Parquet file in the directory. Filter
    and column pruning push down in both cases.
    """
    if os.sep not in sf_dir and not os.path.isdir(sf_dir):
        return spark.read.table(f"{sf_dir}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def table_snapshot(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Read a table AS OF a snapshot — the natural ``source`` argument
    for ``index_sync.sync_index_dir`` (diff the committed index against
    any table version).

    Catalog namespaces get Iceberg time travel (``snapshot-id`` /
    ``as-of-timestamp`` read options — pure Spark reader config, no
    extra code path); parquet directories have no snapshot history, so
    both options are rejected there rather than silently ignored —
    snapshot semantics for local dirs come from the engine's own
    versioned index directories (``index_sync``) instead."""
    if os.sep not in sf_dir and not os.path.isdir(sf_dir):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", int(snapshot_id))
        if as_of_ms is not None:
            reader = reader.option("as-of-timestamp", int(as_of_ms))
        return reader.table(f"{sf_dir}.{name}")
    if snapshot_id is not None or as_of_ms is not None:
        raise ValueError(
            "parquet-directory sources have no snapshot history; time "
            "travel requires an Iceberg catalog namespace (or use the "
            "engine's versioned index dirs)"
        )
    return load_table(spark, sf_dir, name)


def documents_as_corpus(
    spark: SparkSession, sf_dir: str, num_partitions: int | None = None
) -> DataFrame:
    """Map the ``documents`` testdata table onto the corpus input shape
    ``(repo, path, commit, lang, content)`` (BASELINE input_hint).

    Deterministic: repo = source, path derived from doc_id, commit =
    sha256 of content (a content-version identity, exactly the role the
    reference's mtime plays — ``Document.kt:7``, ``IndexedItem.kt:45-51``).

    ``num_partitions``: the testdata is ONE small parquet file = one
    input split; without an explicit repartition every downstream
    exchange computes the whole projection (sha2 per row) in a single
    task. A real corpus has thousands of files and never needs this.
    """
    docs = load_table(spark, sf_dir, "documents")
    if num_partitions:
        docs = docs.repartition(num_partitions)
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "path"
        ),
        F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
