"""Streaming maintenance of the corpus-wide line-count table.

The C4 shared-line rule (``operators/linededup.py``) needs GLOBAL
distinct-document counts per line — a number that keeps changing as a
streaming ingest appends documents.  Because :func:`linededup.
line_counts` is additive over disjoint document sets, the maintenance
is a fold: each micro-batch's per-line counts sum-merge into a
committed versioned table, and the final table equals the batch
computation over the whole corpus EXACTLY (differential-tested).

Contract: the feed is APPEND-ONLY DISTINCT documents.  Unlike the
index maintenances (replace semantics — a re-presented doc converges),
an additive fold has no decrement path, so the contract is ENFORCED,
not assumed: every committed version also records its contributing
``doc_id`` delta (``docs_v<N>``), and each micro-batch drops documents
whose id the table has already counted (first-seen content wins; the
drop count is recorded in the version's meta as ``n_docs_dropped`` so
violations are observable, not silent; a batch dropped WHOLE commits
no version and instead leaves an (app, batch)-keyed
``dropped_b<id>_<apphash>.json`` marker, so even the largest possible
violation leaves a trace — and a rerun under a fresh checkpoint
cannot overwrite the original app's record).  The membership probe follows
the id-pushdown discipline: the batch's bounded id list is pushed as
an IN-filter into the seen-ids scan (no shuffle); above
``SEEN_PROBE_CAP`` ids it falls back to a distributed left-anti join.
Content-level re-deliveries of the same (repo, path) are therefore
harmless; a genuine UPDATE (same doc, new text) is dropped too — a
corpus that mutates documents needs the replace-semantics line
accounting of a full recount, not this fold.  Both crash windows are
covered: a crash
BEFORE the pointer swap leaves an unreferenced orphan directory (the
replay re-merges into the last committed version), and a crash AFTER
the swap but before the streaming offset commit re-presents the same
micro-batch — which the per-version (checkpoint, batch_id) txn marker
detects and skips, because an additive merge is NOT naturally
idempotent the way the index maintenances' replace-semantics commits
are.  The guarded ``swap_latest`` keeps concurrent writers loud
(``ConcurrentCommitError``); both mechanisms are inherited from the
registry/trigram durability story.

Serving: ``linededup.dedup_lines_against(corpus,
load_line_counts(...).filter(n_docs >= m))`` cleans any corpus slice
against the maintained table without recounting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.operators.linededup import line_counts
from text_indexer_spark.streaming.sync_stream import corpus_change_stream

#: Batch-id-list size above which the seen-doc membership probe
#: abandons collect+IN-pushdown for a distributed left-anti join (same
#: cap discipline as ``trigram.grep_trigram_pushdown``).
SEEN_PROBE_CAP = 20_000


def load_line_counts_version(counts_dir: str) -> int:
    from text_indexer_spark import storage

    ptr = storage.join(counts_dir, "LATEST")
    if not storage.exists(ptr):
        return 0
    return int(storage.read_bytes(ptr).decode().strip())


def load_line_counts(spark: SparkSession, counts_dir: str) -> DataFrame:
    """The committed ``(line, n_docs)`` table (empty if none yet)."""
    from text_indexer_spark import storage

    version = load_line_counts_version(counts_dir)
    if version == 0:
        return spark.createDataFrame([], "line string, n_docs long")
    return spark.read.parquet(
        storage.join(counts_dir, f"counts_v{version:06d}")
    )


def _compaction_floor(counts_dir: str) -> int:
    """Highest version whose doc-id delta has been folded into a
    consolidated ``docs_compact_v`` dir (0 = never compacted)."""
    from text_indexer_spark import storage

    raw = storage.read_bytes(storage.join(counts_dir, "DOCS_COMPACT"))
    return int(raw.decode().strip()) if raw else 0


def load_seen_doc_ids(spark: SparkSession, counts_dir: str) -> DataFrame:
    """Union of every committed version's contributing ``doc_id`` delta
    (empty if none).  Versions committed before the guard existed have
    no ``docs_v`` dir and contribute nothing — their documents could be
    re-presented once; every version since records its delta.  Deltas
    at or below the compaction floor are read from the ONE consolidated
    ``docs_compact_v`` dir (see :func:`compact_seen_doc_ids`); only
    versions above the floor contribute a per-version dir, so probe
    setup cost is O(batches since last compaction), not O(lifetime
    batches)."""
    from text_indexer_spark import storage

    version = load_line_counts_version(counts_dir)
    floor = _compaction_floor(counts_dir)
    paths = (
        [storage.join(counts_dir, f"docs_compact_v{floor:06d}")]
        if floor > 0
        else []
    )
    paths += [
        storage.join(counts_dir, f"docs_v{v:06d}")
        for v in range(floor + 1, version + 1)
    ]
    paths = [p for p in paths if storage.exists(p)]
    if not paths:
        return spark.createDataFrame([], "doc_id long")
    return spark.read.parquet(*paths).select("doc_id")


def compact_seen_doc_ids(spark: SparkSession, counts_dir: str) -> int:
    """Fold every per-version ``docs_v`` delta (plus any previous
    consolidated dir) into ONE deduplicated ``docs_compact_v<cur>``
    dir, advance the ``DOCS_COMPACT`` floor marker atomically, then
    delete the folded dirs.  Returns the new floor (0 if there was
    nothing to compact).

    Why this exists: the membership probe unions one directory per
    committed version — correct at any count, but after K micro-batches
    every probe pays K file listings + scan setups.  This is the LSM
    compaction answer (same posture as ``trigram``'s segment merge),
    and it deliberately does NOT touch the counts table, bump the
    version, or rewrite the newest meta — so the (txn_app,
    txn_batch_id) replay marker that makes the sink idempotent is
    unaffected and a micro-batch replayed across a compaction is still
    detected and skipped.

    Crash posture: the consolidated dir is fully written BEFORE the
    atomic marker swap (a crash before the swap leaves an orphan dir a
    re-run overwrites); a crash AFTER the swap but before the deletes
    leaves stale ``docs_v``/old-compact dirs that the floor makes
    unreachable — pure garbage, swept by the next compaction's cleanup
    loop, never read.  Single-writer contract (the streaming
    maintenance's own): run it from the maintenance process between
    batches, not concurrently with a commit."""
    from text_indexer_spark import storage

    cur = load_line_counts_version(counts_dir)
    floor = _compaction_floor(counts_dir)
    if cur == 0 or cur == floor:
        return floor
    seen = load_seen_doc_ids(spark, counts_dir)
    target = storage.join(counts_dir, f"docs_compact_v{cur:06d}")
    seen.select("doc_id").distinct().write.mode("overwrite").parquet(target)
    storage.write_bytes_atomic(
        storage.join(counts_dir, "DOCS_COMPACT"), str(cur).encode()
    )
    # sweep everything the new floor makes unreachable — including any
    # leftovers a previous crash-after-swap stranded
    for v in range(1, cur + 1):
        p = storage.join(counts_dir, f"docs_v{v:06d}")
        if storage.exists(p):
            storage.rmtree(p)
    for v in range(1, cur):
        p = storage.join(counts_dir, f"docs_compact_v{v:06d}")
        if storage.exists(p):
            storage.rmtree(p)
    return cur


def commit_line_counts(
    delta: DataFrame,
    counts_dir: str,
    txn_app: str | None = None,
    txn_batch_id: int | None = None,
    new_doc_ids: DataFrame | None = None,
    n_docs_dropped: int = 0,
) -> int:
    """Sum-merge a per-line count delta into the committed table as the
    next version; returns the committed version.  One shuffle on the
    line key (the merge aggregation); the previous version is read,
    never rewritten.

    ``txn_app``/``txn_batch_id`` make the sink IDEMPOTENT under
    micro-batch replay (the Delta-style transactional-sink pattern): an
    additive merge applied twice inflates counts PERMANENTLY — a line
    seen in 1 document would read as shared and ``dedup_lines_against``
    would delete legitimate unique content — so each version records
    which (app, batch) produced it, and a commit whose (app, batch) is
    already reflected in LATEST is skipped.  Replay can only re-deliver
    the batch after LATEST's (foreachBatch is serialized and the
    streaming checkpoint commits batch N before N+1 runs), so checking
    the newest version's marker is sufficient."""
    from text_indexer_spark import storage

    spark = delta.sparkSession
    cur = load_line_counts_version(counts_dir)
    if txn_app is not None and cur > 0:
        meta = storage.read_json(
            storage.join(counts_dir, f"counts_v{cur:06d}.meta.json")
        )
        if (
            meta
            and meta.get("txn_app") == txn_app
            and txn_batch_id is not None
            and meta.get("txn_batch_id") is not None
            and txn_batch_id <= meta["txn_batch_id"]
        ):
            return cur  # replayed batch: already folded into LATEST
    merged = (
        load_line_counts(spark, counts_dir)
        .unionByName(delta.select("line", "n_docs"))
        .groupBy("line")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
    )
    version = cur + 1
    vdir = storage.join(counts_dir, f"counts_v{version:06d}")
    merged.write.mode("overwrite").parquet(vdir)
    if new_doc_ids is not None:
        # the version's contributing doc-id delta; written (and on
        # crash-replay, overwritten) BEFORE the pointer swap, so
        # load_seen_doc_ids never reads an uncommitted delta
        new_doc_ids.select("doc_id").write.mode("overwrite").parquet(
            storage.join(counts_dir, f"docs_v{version:06d}")
        )
    storage.write_json_atomic(
        storage.join(counts_dir, f"counts_v{version:06d}.meta.json"),
        {
            "txn_app": txn_app,
            "txn_batch_id": txn_batch_id,
            "n_docs_dropped": n_docs_dropped,
        },
    )
    storage.swap_latest(counts_dir, cur, version)
    return version


def vacuum_line_counts(counts_dir: str, keep_last: int = 2) -> list[str]:
    """Retention for the line-count version chain: delete all but the
    newest ``keep_last`` committed ``counts_v<N>`` tables (and their
    meta sidecars).  Returns the removed table paths, oldest first.

    Each commit writes a FULL merged table, so the chain grows
    O(versions × table size) — this is the ``index_sync.
    vacuum_versions`` discipline applied to the line-count store.
    Safety: the LATEST version is always kept (serving + the next
    merge read it, and its meta carries the (txn_app, batch_id)
    replay marker); versions ABOVE the pointer (crash orphans from a
    failed commit) are never touched — the next commit overwrites
    them; the seen-id ``docs_v``/``docs_compact_v`` dirs are
    compaction's job (:func:`compact_seen_doc_ids`), not vacuum's;
    idempotent — re-running removes nothing new."""
    from text_indexer_spark import storage

    return storage.vacuum_versioned(
        counts_dir, "counts_v", keep_last=keep_last, sidecar=".meta.json"
    )


def run_stream_line_counts(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    counts_dir: str,
    max_files_per_trigger: int = 16,
    auto_compact_every: int = 16,
):
    """foreachBatch fold: batch docs → per-line distinct-doc counts →
    sum-merge commit.  foreachBatch serializes the commits (single
    writer); within a batch, repeated upserts of one document collapse
    to the newest by ``event_time`` before counting, mirroring the
    trigram maintenance.  Returns ``(query, get_version)``.

    ``auto_compact_every``: once the number of per-version seen-id
    delta dirs above the compaction floor reaches this count, the
    batch commit is followed by :func:`compact_seen_doc_ids` — the
    maintenance keeps its own membership probe O(1) dirs-read instead
    of requiring an operator to remember to compact (foreachBatch is
    serialized, so the single-writer contract holds).  ``0`` disables
    auto-compaction."""

    state = {"version": load_line_counts_version(counts_dir)}

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        docs = batch_df.withColumn("doc_id", F.xxhash64("repo", "path"))
        # null-safe: max_by ignores null-ordered rows (an all-null
        # event_time feed would reduce every doc to NULL text)
        order = (
            F.coalesce(
                F.col("event_time"),
                F.lit("1970-01-01 00:00:00").cast("timestamp"),
            )
            if "event_time" in batch_df.columns
            else F.monotonically_increasing_id()
        )
        # materialize the collapse ONCE: the batch result feeds up to
        # three downstream jobs (membership probe, per-line counts,
        # docs_v delta) and the no-event_time ordering expression
        # (monotonically_increasing_id) must not re-evaluate per job
        latest = docs.groupBy("doc_id").agg(
            F.max_by(F.col("content"), order).alias("text")
        ).localCheckpoint()
        n_batch = latest.count()
        # contract enforcement: drop documents the committed table has
        # already counted (additive fold — a re-presented doc would
        # inflate n_docs permanently).  The batch size is COUNTED
        # before anything reaches the driver: only a batch under
        # ``SEEN_PROBE_CAP`` collects its ids for the IN-pushdown probe
        # into the seen-ids scan (no shuffle); above the cap, a
        # distributed anti-join — the driver never materializes an
        # unbounded id list.
        n_dropped = 0
        if state["version"] > 0 and n_batch:
            seen = load_seen_doc_ids(spark, counts_dir)
            if n_batch <= SEEN_PROBE_CAP:
                ids = [r[0] for r in latest.select("doc_id").collect()]
                dup = {
                    r[0]
                    for r in seen.filter(F.col("doc_id").isin(ids)).collect()
                }
                if dup:
                    n_dropped = len(dup)
                    latest = latest.filter(~F.col("doc_id").isin(list(dup)))
            else:
                latest = latest.join(
                    seen, "doc_id", "left_anti"
                ).localCheckpoint()
                n_dropped = n_batch - latest.count()
        if n_dropped == n_batch:
            # whole batch already counted: nothing to fold, but the
            # LARGEST contract violation must not be the one that
            # leaves no trace — record it under an (app, batch)-keyed
            # marker: deterministic per app → overwrite-idempotent
            # under replay of the SAME app, while two apps (distinct
            # checkpoints, e.g. a checkpoint-loss rerun) sharing one
            # counts_dir cannot clobber each other's trace
            import hashlib

            from text_indexer_spark import storage

            app_h = hashlib.sha256(
                checkpoint_dir.encode("utf-8")
            ).hexdigest()[:12]
            storage.write_json_atomic(
                storage.join(
                    counts_dir, f"dropped_b{batch_id:012d}_{app_h}.json"
                ),
                {"txn_app": checkpoint_dir, "n_docs_dropped": n_dropped},
            )
            return
        state["version"] = commit_line_counts(
            line_counts(latest),
            counts_dir,
            # idempotence key: a replayed micro-batch (crash between
            # swap_latest and the streaming offset commit) re-presents
            # the same (checkpoint, batch_id) and is skipped
            txn_app=checkpoint_dir,
            txn_batch_id=batch_id,
            new_doc_ids=latest.select("doc_id"),
            n_docs_dropped=n_dropped,
        )
        if (
            auto_compact_every
            and state["version"] - _compaction_floor(counts_dir)
            >= auto_compact_every
        ):
            compact_seen_doc_ids(spark, counts_dir)

    stream = corpus_change_stream(spark, drop_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, (lambda: state["version"])
