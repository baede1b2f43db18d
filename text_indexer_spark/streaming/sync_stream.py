"""Structured-Streaming front end for incremental indexing.

The reference has no true streaming — its "sync" is a 10-second polling
batch loop (``ExecutePeriodically.kt:9-14``, ``Indexer.kt:63-71``), and
SURVEY §2.6 scopes the engine accordingly: incremental sync is a batch
snapshot-diff job (``operators/sync.py``). This module is the thin
Structured-Streaming adapter for deployments where corpus changes arrive
as a FEED rather than as table snapshots:

* ``corpus_change_stream`` — a file-source stream of corpus rows
  (new parquet files under a drop directory = new/changed documents;
  exactly how an Iceberg CDC feed or Kafka topic would look, minus the
  connector jars this sandbox lacks).
* ``stream_postings`` — tokenizes the stream with the SAME expression
  tokenizer as the batch build and emits (term, doc_id?, tf) micro-batch
  postings; writes go through ``foreachBatch`` into the same
  replace-semantics merge the batch sync uses, so the index state is
  identical whichever front end fed it (tested).
* ``windowed_doc_rates`` — watermarked per-minute ingest counts (the
  operational metric a streaming build would alert on; demonstrates
  event-time windows + late-data handling on this schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.schema import CORPUS_SCHEMA
from text_indexer_spark.tokenizer import tokenize_column


def corpus_change_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """readStream over a parquet drop directory with the corpus schema +
    an ``event_time`` column (file arrival proxy)."""
    from pyspark.sql import types as T

    # copy the fields: StructType.add MUTATES the shared schema object.
    # `deleted` is the optional tombstone flag of an upsert feed — files
    # written without it read as NULL (= not deleted).
    schema = T.StructType(
        list(CORPUS_SCHEMA.fields)
        + [
            T.StructField("event_time", T.TimestampType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )


def stream_postings(changes: DataFrame) -> DataFrame:
    """Streaming tokenize → per-(doc, term) tf. Keyed by (repo, path,
    commit) — doc ids are assigned at merge time by the batch layer."""
    toks = changes.select(
        "repo", "path", "commit",
        F.explode(tokenize_column("content")).alias("term"),
    )
    return toks.groupBy("repo", "path", "commit", "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def windowed_doc_rates(changes: DataFrame, window: str = "1 minute",
                       watermark: str = "2 minutes") -> DataFrame:
    """Event-time windowed ingest counts with a watermark (late rows
    beyond the watermark are dropped — standard late-data policy)."""
    return (
        changes.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "repo")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "repo",
            "n_docs",
        )
    )


def run_stream_index_maintenance(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    versions_dir: str,
    max_files_per_trigger: int = 16,
):
    """End-to-end streaming maintenance of the COMPRESSED index: each
    micro-batch of upserts/tombstones is applied with
    ``index_sync.sync_index_dir`` — only affected shards rebuilt, new
    immutable version per batch under ``versions_dir/v<N>``, old version
    readable throughout. Returns (query, get_latest) where
    ``get_latest()`` yields the newest committed index path.

    Version commits are serialized by the single writer foreachBatch
    guarantees (one micro-batch at a time per query) — the streaming
    analogue of the reference's indexer mutex (``DocumentsIndexer.kt:
    29``).

    Restart-safe: the base index is NOT blindly ``index_dir`` — on
    start-up the newest COMMITTED version under ``versions_dir`` (valid
    ``_MANIFEST.json``) is adopted as the base and its numbering
    continued. Without this, restarting with the same ``checkpoint_dir``
    would silently drop every previously applied batch: the streaming
    checkpoint suppresses replay of processed files while the index base
    reset to the stale ``index_dir``."""
    import os
    import re

    from text_indexer_spark.checkpoint import read_manifest
    from text_indexer_spark.operators.index_sync import (
        sync_index_dir,
        upserts_as_snapshot,
    )

    state = {"latest": index_dir, "n": 0}
    if os.path.isdir(versions_dir):
        committed = []
        for name in os.listdir(versions_dir):
            m = re.fullmatch(r"v(\d+)", name)
            p = os.path.join(versions_dir, name)
            if m and read_manifest(p) is not None:
                committed.append((int(m.group(1)), p))
        if committed:
            state["n"], state["latest"] = max(committed)

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        cols = [c for c in ("repo", "path", "commit", "lang", "content", "deleted")
                if c in batch_df.columns]
        snap = upserts_as_snapshot(spark, state["latest"], batch_df.select(*cols))
        state["n"] += 1
        out = os.path.join(versions_dir, f"v{state['n']:04d}")
        sync_index_dir(spark, state["latest"], snap, out)
        state["latest"] = out

    stream = corpus_change_stream(spark, drop_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, (lambda: state["latest"])


def run_stream_sync(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    merge_fn,
    once: bool = True,
):
    """Drive the stream into the batch merge: every micro-batch of corpus
    rows is handed to ``merge_fn(batch_df, batch_id)`` — in production
    the replace-semantics postings merge (``sync.apply_diff_to_postings``)
    behind an atomic manifest commit. ``once=True`` processes all
    available files then stops (test/cron mode)."""
    stream = corpus_change_stream(spark, drop_dir)
    writer = (
        stream.writeStream.foreachBatch(merge_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="10 seconds").start()
    return q


def run_stream_trigram_maintenance(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    tri_dir: str,
    max_files_per_trigger: int = 16,
):
    """Streaming maintenance of the COMMITTED trigram index: each
    micro-batch of upserts/tombstones becomes ONE ``trigram_commit`` —
    every batch doc's old rows are tombstoned and non-deleted docs
    re-add their grams in the same commit (replace semantics, identical
    to the batch path). The LSM layout is already versioned internally,
    so no external versions directory is needed; foreachBatch's
    one-micro-batch-at-a-time guarantee serializes commits, and a crash
    between segment write and the LATEST swap leaves only an
    unreferenced orphan directory (the manifest pointer is atomic).

    Within a batch, multiple upserts of the same document collapse to
    the newest by ``event_time`` (``max_by``) — segments must hold one
    row-set per doc. Returns (query, get_version)."""
    from text_indexer_spark.operators.trigram import trigram_commit

    state = {"version": 0}

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        docs = batch_df.withColumn("doc_id", F.xxhash64("repo", "path"))
        deleted = (
            F.coalesce(F.col("deleted"), F.lit(False))
            if "deleted" in batch_df.columns
            else F.lit(False)
        )
        docs = docs.withColumn("_del", deleted)
        # NULL-safe ordering: max_by IGNORES rows whose ordering value
        # is null, so a feed written without event_times would reduce
        # every group to NULL (observed; regression-tested in the
        # line-count stream) — coalesce to epoch so null-timestamped
        # rows still participate (ties broken arbitrarily, as any
        # timestamp tie would be)
        order = (
            F.coalesce(
                F.col("event_time"),
                F.lit("1970-01-01 00:00:00").cast("timestamp"),
            )
            if "event_time" in batch_df.columns
            else F.monotonically_increasing_id()
        )
        latest = docs.groupBy("doc_id").agg(
            F.max_by(F.struct("content", "_del"), order).alias("last")
        )
        adds = latest.filter(~F.col("last._del")).select(
            "doc_id", F.col("last.content").alias("text")
        )
        removed = latest.select("doc_id")
        state["version"] = trigram_commit(adds, tri_dir, removed_ids=removed)

    stream = corpus_change_stream(spark, drop_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, (lambda: state["version"])
