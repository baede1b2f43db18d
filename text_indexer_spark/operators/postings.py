"""Index build: corpus → catalog + postings.

Replaces the reference's in-memory build loop (``DocumentsIndexer.kt:
100-130``: per-file coroutine tokenize → actor-serialized map insert)
with two declarative jobs:

* ``build_catalog`` — dedup overlapping inputs (``FilesAndDirs.kt:12-16``),
  deterministic doc-id assignment, sha256 invariant, doc_len.
* ``build_postings`` — tokenize (JVM expression or Arrow pandas UDF) →
  explode → one hash aggregation on (term, doc_id). Catalyst gives the
  partial (map-side) aggregate for free; no actor, no mutex — the shuffle
  IS the serialization point.

Scale notes:
* doc-id assignment avoids the classic single-reducer global window: we
  range-partition by the sort key, count rows per partition (tiny
  driver-side cumsum), then add per-partition offsets to local ranks via
  one mapInPandas pass — fully parallel, deterministic for unique keys.
* the (term, doc_id) aggregation key is fine-grained, so hot terms do NOT
  skew this shuffle; skew appears only when grouping BY TERM to assemble
  posting lists — handled by the salted two-phase merge in
  ``index_build.py``.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column, tokenize_pandas_iter

SORT_KEYS = ["repo", "path", "commit"]


def dedup_corpus(corpus: DataFrame) -> DataFrame:
    """Unique (repo, path): keep the greatest (commit, ...) tuple —
    deterministic replacement for the reference's first-wins
    ``distinctBy(path)`` (``FilesAndDirs.kt:12-16``), which depends on
    arrival order."""
    extra = [c for c in corpus.columns if c not in ("repo", "path", "commit", "lang", "content")]
    agg = corpus.groupBy("repo", "path").agg(
        F.max(F.struct("commit", "lang", "content", *extra)).alias("v")
    )
    return agg.select(
        "repo", "path", F.col("v.commit").alias("commit"),
        F.col("v.lang").alias("lang"), F.col("v.content").alias("content"),
        *[F.col(f"v.{c}").alias(c) for c in extra],
    )


def assign_doc_ids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Add ``doc_id`` = global rank of (repo, path), 0-based (callers
    pass a ``dedup_corpus``'d frame, so keys are unique and commit never
    has to break a tie).

    Deterministic and parallel, sharing the index builder's machinery
    (``index_build._compute_boundaries`` / ``_shard_of_udf`` /
    ``_route_tokens``): explicit sampled boundaries from a PRUNED
    (repo, path) scan replace ``repartitionByRange``, whose hidden
    sampling job re-executes the full child plan (a second `content`
    scan at 100 TB — the exact double-execution the builder's stage A
    avoids). Per-shard offsets come from one pruned count aggregate
    (tiny driver cumsum); ranks attach in a single mapInPandas pass over
    the one wide shuffle. A plain ``row_number() over (order by ...)``
    would funnel every row through one reducer at 10^12 scale.
    """
    from text_indexer_spark.operators.index_build import (
        _compute_boundaries,
        _route_tokens,
        _shard_of_udf,
        _sharded_sorted,
    )

    spark = corpus.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    bounds = _compute_boundaries(corpus, num_partitions)
    route = _route_tokens(spark, num_partitions)
    shard_of = _shard_of_udf(bounds)
    # Tiny aggregate over PRUNED key columns: one row per shard →
    # driver cumsum → broadcast.
    sizes = {
        r["_pid"]: r["n"]
        for r in corpus.select("repo", "path")
        .withColumn("_pid", shard_of("repo", "path"))
        .groupBy("_pid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sorted_df = _sharded_sorted(corpus, bounds, route)
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = sorted_df.drop("_pid").schema.add("doc_id", "long", False)

    def attach(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd  # noqa: F401

        seen = 0
        base = None
        for batch in batches:
            if batch.empty:
                continue
            if base is None:
                base = boff.value[int(batch["_pid"].iloc[0])]
            batch = batch.drop(columns=["_pid"])
            batch["doc_id"] = range(base + seen, base + seen + len(batch))
            seen += len(batch)
            yield batch

    return sorted_df.mapInPandas(attach, out_schema)


def build_catalog(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """corpus → catalog (see schema.CATALOG_SCHEMA).

    ``content_sha256`` is the per-row invariant re-verified against the
    source (input_hint): if the source table carries its own
    ``content_sha256`` column that value is kept as the EXPECTED hash
    (and the build's stage A recomputes + compares); otherwise it is
    derived here. ``is_nested`` / ``source_root`` mirror the reference's
    nested-vs-independent provenance (``IndexedItem.kt:17-22``). They
    are EVENT properties, not path properties (``operators/registry.py``
    holds the full state machine): a corpus carrying them (e.g. joined
    from a registry listing) passes them through verbatim; without
    provenance columns the path-shape default applies (file in a
    subdirectory = swept by its root).
    """
    has_expected = "content_sha256" in corpus.columns
    with_ids = assign_doc_ids(dedup_corpus(corpus), num_partitions)
    sha_col = (
        F.col("content_sha256")
        if has_expected
        else F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    )
    nested_col = (
        F.col("is_nested") if "is_nested" in corpus.columns
        else F.col("path").contains("/")
    )
    root_col = (
        F.col("source_root") if "source_root" in corpus.columns else F.col("repo")
    )
    return with_ids.select(
        "doc_id",
        "repo",
        "path",
        "commit",
        "lang",
        sha_col.alias("content_sha256"),
        F.size(tokenize_column(F.coalesce(F.col("content"), F.lit("")))).alias("doc_len"),
        nested_col.alias("is_nested"),
        root_col.alias("source_root"),
        "content",
    )


def build_postings(catalog_with_content: DataFrame, use_pandas: bool = False) -> DataFrame:
    """(doc_id, content) → postings (term, doc_id, tf).

    Default path is pure JVM expressions (split/explode/hash-agg, fully
    codegen'd). ``use_pandas=True`` routes through the Arrow-vectorized
    pandas tokenizer (the pluggable-tokenizer extension point, reference
    ``DocumentTokenizer.kt:6-13``); both paths are differential-tested
    identical.
    """
    if use_pandas:
        src = catalog_with_content.select("doc_id", F.col("content"))
        raw = src.mapInPandas(
            lambda it: tokenize_pandas_iter(it, text_col="content", id_col="doc_id"),
            "doc_id long, term string, tf long",
        )
        # pandas path already aggregates per (doc, term) within a doc —
        # docs never span batches after the select, so this is final.
        return raw.select("term", "doc_id", "tf")
    toks = catalog_with_content.select(
        "doc_id", F.explode(tokenize_column("content")).alias("term")
    )
    return (
        toks.groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .select("term", "doc_id", "tf")
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """Per-term document frequency (df) and collection tf."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def corpus_stats(catalog: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl) aggregate."""
    return catalog.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
