"""Structured-Streaming front end for the IVF vector store.

Completes the streaming-maintenance story: postings
(``sync_stream.run_stream_index_maintenance``), trigrams
(``run_stream_trigram_maintenance``), line counts
(``linecount_stream``) and now vectors all consume the same
drop-directory upsert/tombstone feed shape and fold each micro-batch
into ONE committed version of their index family.

Each micro-batch becomes one :func:`vecstore.ivf_upsert` commit — an
immutable cid-partitioned delta segment plus a tombstone list, CAS-
guarded.  foreachBatch's one-micro-batch-at-a-time guarantee serializes
commits (the single-writer contract ``storage.swap_latest`` enforces);
a crash between segment write and the LATEST swap leaves only an
unreferenced orphan that :func:`vecstore.ivf_vacuum` never touches and
the next commit's version number simply passes over.

Replay-idempotence: a micro-batch redelivered after a crash re-commits
the SAME rows under a new version — replace-on-upsert makes the served
view identical (effect-idempotent, like the trigram maintenance's
replace semantics; crash-replay tested), at the cost of one redundant
version directory, reclaimed by vacuum.  This is the same argument as
the trigram stream, NOT the additive line-count sink (which needed a
transactional batch-id marker).

The store must be bootstrapped by ``ivf_ingest`` first — upserts are
assigned to the STORED coarse quantizer, so there must be one.  At
100 TB each trigger touches only the delta; compaction cadence (chain
length) is an operational knob outside the stream, exactly like
``index_optimize`` for the token index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vector_change_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """readStream over a parquet drop directory of vector upserts:
    (vec_id, embedding, event_time, deleted).  Files written without
    ``deleted`` read as NULL (= upsert); without ``event_time`` as NULL
    (ties collapsed arbitrarily, as any timestamp tie would be)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("event_time", T.TimestampType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )


def collapse_vector_batch(
    batch_df: DataFrame, checkpoint: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Within-batch collapse to (upserts, delete_ids): one row per
    vec_id — the newest by ``event_time`` wins, and whether it is an
    upsert or a delete decides which side the id lands on (disjoint by
    construction, satisfying ``ivf_upsert``'s contract).

    ``max_by`` ignores NULL ordering values, so a feed without
    event_times would collapse every group to NULL — coalesce to epoch
    (the bug class found in the line-count stream and guarded in all
    three sibling maintenances)."""
    deleted = (
        F.coalesce(F.col("deleted"), F.lit(False))
        if "deleted" in batch_df.columns
        else F.lit(False)
    )
    order = (
        F.coalesce(
            F.col("event_time"),
            F.lit("1970-01-01 00:00:00").cast("timestamp"),
        )
        if "event_time" in batch_df.columns
        else F.monotonically_increasing_id()
    )
    latest = (
        batch_df.withColumn("_del", deleted)
        .groupBy("vec_id")
        .agg(F.max_by(F.struct("embedding", "_del"), order).alias("last"))
    )
    if checkpoint:
        # the two sides feed ivf_upsert's contract counts + assignment
        # + segment/tombstone writes — materialize the (delta-sized)
        # collapse once instead of re-aggregating per consuming job
        # (same reason the line-count maintenance checkpoints its
        # collapsed batch)
        latest = latest.localCheckpoint(eager=True)
    upserts = latest.filter(~F.col("last._del")).select(
        "vec_id", F.col("last.embedding").alias("embedding")
    )
    delete_ids = latest.filter(F.col("last._del")).select("vec_id")
    return upserts, delete_ids


def run_stream_vector_maintenance(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    max_files_per_trigger: int = 16,
):
    """Streaming maintenance of a committed IVF store: one
    ``ivf_upsert`` commit per micro-batch.  Returns (query,
    get_version) where ``get_version()`` yields the newest committed
    store version this run produced (0 = no batch seen)."""
    from text_indexer_spark.operators.vecstore import ivf_upsert

    state = {"version": 0}

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        upserts, delete_ids = collapse_vector_batch(batch_df, checkpoint=True)
        ups = None if upserts.isEmpty() else upserts
        dels = None if delete_ids.isEmpty() else delete_ids
        if ups is None and dels is None:
            return
        state["version"] = ivf_upsert(spark, index_dir, ups, dels)

    stream = vector_change_stream(spark, drop_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, (lambda: state["version"])
