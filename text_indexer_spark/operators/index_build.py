"""The resumable index-build job: corpus → persisted index directory.

Replaces the reference's in-memory bulk build (``DocumentsIndexer.kt:
100-130``: per-file coroutines + one index actor) with a three-stage
pipeline whose resume unit is the **doc-range shard**:

    stage A  dedup + doc-ids + sha verify + tokenize
             → catalog/shard=K + postings/shard=K (+ markers)
    stage B  global stats (df, N, avgdl)  → stats/ (+ marker)
    stage C  encode compressed lists      → posting_lists/shard=K (+ marker)
    commit   _MANIFEST.json               → index becomes visible

Scale design:

* **One wide shuffle for the whole of stage A, content read ONCE.** The
  corpus is range-partitioned on (repo, path) via EXPLICIT sampled
  boundaries + collision-free hash routing (`_compute_boundaries` /
  `_route_tokens`), not ``repartitionByRange`` — Spark's range exchange
  re-executes the child plan for boundary sampling, which would scan
  `content` twice (2× I/O at 100 TB). Boundary sampling and doc-id
  sizing here touch only the pruned (repo, path) columns. Everything
  else in stage A — duplicate-key dedup (reference ``FilesAndDirs.kt:
  12-16``), deterministic doc-id assignment (global rank = per-partition
  offset + local position; never a single-reducer window), sha256
  verification, tokenization, per-doc tf — happens streaming inside one
  mapInPandas pass over the sorted partitions. Content bytes cross the
  network exactly once and are scanned exactly once.
* **Shard = range partition.** Every document's postings are co-located,
  so (a) per-doc stats are computable locally, (b) the query path
  intersects lists doc-at-a-time per shard without a shuffle, and (c) a
  stop-word term's 10^9-entry posting list is structurally split across
  all shards — the explicit skew handling the north rule asks for: no
  single reducer ever sees a whole hot term. Skew ratio per shard
  (hottest term's in-shard df vs mean) is logged to metrics.
* **Streaming within a partition**: Arrow batches are tokenized and
  reduced one at a time; content is dropped batch-by-batch, so executor
  memory holds one batch of content plus the shard's postings — that,
  not the shard's raw bytes, bounds shard sizing.
* **Per-shard executor-side writes** (pyarrow parquet + tmp-rename, one
  row group per file) give checkpoint granularity = shard; a killed
  build reuses every completed shard because doc-id assignment is
  deterministic.
* **sha256**: when the source carries a ``content_sha256`` column, every
  row's content hash is recomputed and compared (per-row invariant);
  mismatches fail the build. Without the column the hash is computed and
  stored (it then guards every later sync).
* Tokenization is an Arrow-vectorized pandas operation (north star:
  "vectorized Arrow/pandas UDFs tokenize"); no per-row Python UDFs.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark import checkpoint as ckpt
from text_indexer_spark.functions.bm25 import B, K1
from text_indexer_spark.operators.codec import BLOCK_SIZE, encode_posting_lists_bulk
from text_indexer_spark.tokenizer import (
    tokenize_postings_arrays,
    tokenize_postings_positions,
)

POSTINGS_DIR = "postings"
LISTS_DIR = "posting_lists"
CATALOG_DIR = "catalog"
STATS_DIR = "stats"
STATS_PARTIAL_DIR = "stats_partial"
METRICS_DIR = "metrics"

SORT_KEYS = ["repo", "path", "commit", "lang", "content"]

_STAGE_A_SCHEMA = (
    "shard_id int, n_docs long, n_postings long, n_tokens long, "
    "sha_mismatches long, tokenize_sec double, postings_per_sec double"
)

_STAGE_C_SCHEMA = (
    "shard_id int, n_terms long, n_postings long, bytes_ids long, bytes_tfs long, "
    "bytes_weights long, skew_ratio double, encode_sec double, postings_per_sec double"
)


def _write_shard_parquet(
    df: pd.DataFrame, directory: str, shard_id: int, schema=None
) -> None:
    import pyarrow as pa

    from text_indexer_spark import storage

    storage.makedirs(directory)
    final = storage.join(directory, f"shard_{shard_id:05d}.parquet")
    # one row group per shard file: the scan never splits a shard across
    # input partitions, which the shuffle-free query kernel relies on
    # (``schema``: pin types an EMPTY shard can't infer — e.g. a binary
    # positions column on a shard with zero postings)
    storage.write_parquet_atomic(
        pa.Table.from_pandas(df, preserve_index=False, schema=schema), final,
        row_group_size=max(len(df), 1),
    )


# \x01, not \x00: numpy's str arithmetic truncates at NUL, so a NUL
# separator silently vanishes inside the vectorized UDF. \x01 sorts
# below every printable character, so combined-string order equals
# (repo, path) tuple order for any input free of \x00/\x01 control
# bytes — and shard ids stay monotone in the catalog sort order.
_KEY_SEP = "\x01"


def _shard_of_udf(bounds: list[str]):
    """(repo, path) → shard id, as a PURE JVM expression: a balanced
    binary-search ``when()`` tree over the literal boundary keys
    (depth = ⌈log2(#shards)⌉, fully inside whole-stage codegen — a
    higher-order ``filter`` over an array literal would be interpreted
    per row, and the previous vectorized pandas UDF added an Arrow
    round trip + Python-worker spin-up to the sizing/routing passes;
    differentially micro-benchmarked, the tree needs no Python workers
    at all and keeps the wide routing stage in one codegen span).

    Collation note: Spark SQL compares strings as UTF-8 bytes
    (UTF8String), which is code-point order — the SAME order Python's
    ``sorted`` and numpy's object-string comparisons use, so boundary
    computation, this assignment, and ``sortWithinPartitions`` all
    agree for any input."""
    if not bounds:
        def shard_of_zero(repo: str, path: str):
            return F.lit(0).cast("int")

        return shard_of_zero

    def shard_of(repo: str, path: str):
        key = F.concat(
            F.coalesce(F.col(repo), F.lit("")),
            F.lit(_KEY_SEP),
            F.coalesce(F.col(path), F.lit("")),
        )

        # shard id = right-bisect(bounds, key): key < bounds[mid] → id
        # in [lo, mid], else [mid+1, hi]
        def tree(lo: int, hi: int):
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(key < F.lit(bounds[mid]), tree(lo, mid)).otherwise(
                tree(mid + 1, hi)
            )

        return tree(0, len(bounds)).cast("int")

    return shard_of


def _compute_boundaries(corpus: DataFrame, num_shards: int) -> list[str]:
    """num_shards-1 range-boundary keys over (repo, path), from a
    DETERMINISTIC bottom-k-by-hash sample of the PRUNED key columns.

    This replaces ``repartitionByRange``'s sampling job, which
    re-executes the full child plan (reading `content` a second time —
    2× the scan I/O at 100 TB). Here the sample scan reads only two
    string columns (column pruning reaches the parquet reader), runs as
    ONE job (per-partition top-k + driver merge — no row count needed),
    and the boundaries are a pure function of the data, so reruns at any
    parallelism shard identically. Bottom-k over the key hash is a
    uniform sample of DISTINCT keys (duplicates share a hash).

    The sample size stays BELOW spark.sql.execution.topKSortFallbackThreshold
    (default 10000): above it, ``orderBy().limit()`` silently degrades
    from TakeOrderedAndProject (per-partition heaps + driver merge) to a
    FULL global sort of every key — measured as ~10 s of flat, parallel-
    insensitive cost on a 2 M-doc corpus. At the default shard cap (256)
    the floor is ≥32 uniform samples per boundary — relative shard-size
    error ~1/√32 ≈ 18 % worst case, well inside what the collision-free
    routing + per-shard checkpointing tolerate (shard size only gates
    memory headroom, not correctness)."""
    target = min(num_shards * 256, 8192)
    r0 = F.coalesce(F.col("repo"), F.lit(""))
    p0 = F.coalesce(F.col("path"), F.lit(""))
    sampled = (
        corpus.select(
            F.concat(r0, F.lit(_KEY_SEP), p0).alias("k"),
            F.xxhash64(r0, p0).alias("h"),
        )
        .orderBy("h")
        .limit(target)
        .collect()
    )
    uniq = sorted({r["k"] for r in sampled})
    if len(uniq) < 2:
        return []
    bounds = []
    for i in range(1, num_shards):
        b = uniq[min(int(round(i * len(uniq) / num_shards)), len(uniq) - 1)]
        bounds.append(b)
    # strictly increasing boundaries (duplicates would create dead shards
    # in the middle of the range — collapse instead)
    out: list[str] = []
    for b in bounds:
        if not out or b > out[-1]:
            out.append(b)
    return out


def _murmur3_hash_int(value: int, seed: int = 42) -> int:
    """Spark's ``F.hash`` on one INT column: Murmur3_x86_32.hashInt
    (seed 42), reimplemented so routing tokens are computed on the
    DRIVER with zero Spark jobs. Returns the signed 32-bit hash. If
    this ever disagreed with the JVM, stage A's mixed-partition
    invariant check fails the build loudly (and a pytest compares it
    against ``F.hash`` directly)."""
    m = 0xFFFFFFFF
    k1 = (value * 0xCC9E2D51) & m
    k1 = ((k1 << 15) | (k1 >> 17)) & m
    k1 = (k1 * 0x1B873593) & m
    h1 = seed ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & m
    h1 = (h1 * 5 + 0xE6546B64) & m
    # fmix(h1, 4)
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _route_tokens(spark: SparkSession, num_shards: int) -> list[int]:
    """For each shard id k, an int token whose Murmur3 hash lands in
    partition slot k of a ``repartition(num_shards, ...)`` exchange —
    collision-free shard→partition routing without a range exchange
    (hash routing alone would map ~1/e of the slots empty and stack
    multiple shards on one task: a straggler at any scale). Computed
    driver-locally (``_murmur3_hash_int`` ≡ JVM ``F.hash``/``pmod``
    for n > 0, where Java's ((h%n)+n)%n equals Python's h%n), so the
    sizing phase spends no Spark jobs on it."""
    route: dict[int, int] = {}
    token = 0
    while len(route) < num_shards:
        route.setdefault(_murmur3_hash_int(token) % num_shards, token)
        token += 1
    return [route[k] for k in range(num_shards)]


def _sharded_sorted(
    corpus: DataFrame,
    bounds: list[str],
    route: list[int],
    skip_pids: list[int] | None = None,
) -> DataFrame:
    """Corpus → one physical partition per shard, sorted by SORT_KEYS.

    ``_pid`` is a binary search over the broadcast boundary keys
    (vectorized, Arrow-batched); ``_route`` translates it to a value the
    hash exchange sends to exactly partition ``_pid``. ONE wide shuffle,
    one materialization of `content`."""
    shard_of = _shard_of_udf(bounds)
    n = len(route)
    route_col = F.element_at(
        F.array(*[F.lit(int(t)) for t in route]), F.col("_pid") + 1
    )
    with_pid = corpus.withColumn("_pid", shard_of("repo", "path"))
    if skip_pids:
        with_pid = with_pid.filter(~F.col("_pid").isin(skip_pids))
    return (
        with_pid.withColumn("_route", route_col)
        .repartition(n, "_route")
        .drop("_route")
        .sortWithinPartitions(*[c for c in SORT_KEYS if c in corpus.columns])
    )


def _dedup_batch(batch: pd.DataFrame, carry_key: tuple | None):
    """Within sorted data, keep the LAST row of each (repo, path) run —
    deterministic 'greatest commit wins' (≙ dedup_corpus). Returns the
    kept rows of this batch that are SAFE to emit (all but the final run,
    which may continue into the next batch) plus the pending last row."""
    if not len(batch):
        return batch, carry_key
    repo = batch["repo"].to_numpy()
    path = batch["path"].to_numpy()
    keep = np.ones(len(batch), dtype=bool)
    keep[:-1] = ~((repo[:-1] == repo[1:]) & (path[:-1] == path[1:]))
    return batch[keep], (repo[-1], path[-1])


def encode_shards(
    spark: SparkSession,
    index_dir: str,
    shard_ids: list[int],
    n_docs: int,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list:
    """Stage C: encode compressed posting lists for the given shards.

    Zero-shuffle: the postings layout IS the partitioning. One task per
    shard reads its own postings file with pyarrow (no JVM round-trip of
    10^x posting rows), looks up term df in the broadcast stats dict,
    encodes (delta-gap + varbyte + block-max, BM25 weights baked from
    the supplied global stats), writes. This is the distributed-
    compaction pattern: work ships to data, nothing reshuffles. Falls
    back to a join + groupBy when the vocabulary is too large to
    broadcast (stats rows > 5M). Also reused by the incremental
    index-directory sync, which re-encodes only what changed.
    """
    postings_dir = os.path.join(index_dir, POSTINGS_DIR)
    stats_dir = os.path.join(index_dir, STATS_DIR)
    lists_dir = os.path.join(index_dir, LISTS_DIR)
    n_docs_b, avgdl_b = float(n_docs), float(avgdl)

    def encode_arrays(
        shard_id: int,
        terms: np.ndarray,
        doc_ids: np.ndarray,
        tfs: np.ndarray,
        dfs: np.ndarray,
        t0: float,
        pos_bytes: np.ndarray | None = None,
    ) -> pd.DataFrame:
        """Shared encode kernel: sorted-by-(term, doc_id) numpy arrays →
        encoded shard file + metrics row. Fully vectorized up to the
        per-term slice loop (term count per shard is vocabulary-bounded)."""
        tf_f = tfs.astype(np.float64)
        idf = np.log(1.0 + (n_docs_b - dfs + 0.5) / (dfs + 0.5))
        # per-doc length from in-shard postings (complete by sharding)
        _, inv = np.unique(doc_ids, return_inverse=True)
        dl_sums = np.bincount(inv, weights=tf_f)[inv]
        w = idf * tf_f * (K1 + 1.0) / (tf_f + K1 * (1.0 - B + B * dl_sums / avgdl_b))
        out = encode_posting_lists_bulk(
            terms, doc_ids, tfs, w, block_size, pos_bytes=pos_bytes
        )
        out.insert(0, "shard_id", np.int32(shard_id))
        _write_shard_parquet(out, lists_dir, shard_id)
        secs = time.time() - t0
        n_post = int(out["df"].sum()) if len(out) else 0
        dfs_arr = out["df"].to_numpy() if len(out) else np.array([0])
        skew = float(dfs_arr.max() / max(dfs_arr.mean(), 1e-9)) if len(out) else 0.0
        b_ids = int(out["doc_ids_delta_varbyte"].str.len().sum()) if len(out) else 0
        b_tfs = int(out["tfs_varbyte"].str.len().sum()) if len(out) else 0
        b_w = int(out["weights_f64"].str.len().sum()) if len(out) else 0
        ckpt.write_marker(
            index_dir, "lists", shard_id,
            n_terms=int(len(out)), n_postings=n_post,
            bytes_ids=b_ids, bytes_tfs=b_tfs, skew_ratio=skew,
        )
        return pd.DataFrame(
            [{
                "shard_id": shard_id, "n_terms": len(out), "n_postings": n_post,
                "bytes_ids": b_ids, "bytes_tfs": b_tfs, "bytes_weights": b_w,
                "skew_ratio": skew, "encode_sec": secs,
                "postings_per_sec": (n_post / secs) if secs > 0 else 0.0,
            }]
        )

    if not shard_ids:
        return []
    # vocabulary size from parquet FOOTERS (pyarrow metadata) — no Spark
    # job for a single scalar the files already store
    import pyarrow.parquet as pq_meta

    from text_indexer_spark import storage as _st

    stats_count = 0
    for name in _st.listdir(stats_dir):
        if name.endswith(".parquet"):
            fs, fp = _st.resolve(_st.join(stats_dir, name))
            stats_count += pq_meta.ParquetFile(fp, filesystem=fs).metadata.num_rows
    if stats_count <= 5_000_000:
        df_rows = spark.read.parquet(stats_dir).collect()
        bdf = spark.sparkContext.broadcast({r["term"]: r["df"] for r in df_rows})

        def encode_from_file(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pyarrow as pa
            import pyarrow.parquet as pq

            # one OS thread per task: pyarrow defaults its pool to the
            # MACHINE's cpu count, so K concurrent tasks on a K-core
            # executor would spawn K×machine_cpus threads — pure
            # oversubscription (measured: drags the pinned small-core
            # scaling configs). Parallelism comes from Spark tasks.
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
            for b in batches:
                for _, row in b.iterrows():
                    t0 = time.time()
                    shard_id = int(row["shard_id"])
                    tbl = pq.read_table(row["path"])
                    terms = tbl.column("term").to_numpy(zero_copy_only=False)
                    doc_ids = tbl.column("doc_id").to_numpy()
                    tfs = tbl.column("tf").to_numpy()
                    pos_col = (
                        tbl.column("positions").to_numpy(zero_copy_only=False)
                        if "positions" in tbl.column_names
                        else None
                    )
                    # int-code sort instead of an object-string lexsort;
                    # df lookup once per unique term. sort=True makes the
                    # written list order CANONICAL (term-ascending),
                    # independent of postings-file row order — the
                    # optimize ≡ fresh-rebuild byte-equality differential
                    # (test_index_optimize.py) relies on this.
                    codes, uniq_vals = pd.factorize(terms, sort=True)
                    idx = np.lexsort((doc_ids, codes))
                    terms, doc_ids, tfs = terms[idx], doc_ids[idx], tfs[idx]
                    dmap = bdf.value
                    df_per_code = np.fromiter(
                        (dmap[t] for t in uniq_vals),
                        dtype=np.float64, count=len(uniq_vals),
                    )
                    dfs = df_per_code[codes[idx]]
                    yield encode_arrays(
                        shard_id, terms, doc_ids, tfs, dfs, t0,
                        pos_bytes=None if pos_col is None else pos_col[idx],
                    )

        shard_rows = [
            (s, os.path.join(postings_dir, f"shard_{s:05d}.parquet"))
            for s in shard_ids
            if os.path.exists(os.path.join(postings_dir, f"shard_{s:05d}.parquet"))
        ]
        if not shard_rows:
            return []
        shards_df = spark.createDataFrame(
            shard_rows, "shard_id int, path string"
        ).repartition(len(shard_rows))
        return shards_df.mapInPandas(encode_from_file, _STAGE_C_SCHEMA).collect()

    postings_all = spark.read.parquet(postings_dir).withColumn(
        "shard_id",
        F.regexp_extract(F.input_file_name(), r"shard_(\d+)\.parquet", 1).cast("int"),
    ).filter(F.col("shard_id").isin([int(s) for s in shard_ids]))
    term_df = spark.read.parquet(stats_dir)
    joined = postings_all.join(term_df, "term")

    def encode_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        shard_id = int(pdf["shard_id"].iloc[0])
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dfs = pdf["df"].to_numpy(dtype=np.float64)
        codes, _ = pd.factorize(terms, sort=True)  # canonical term order
        idx = np.lexsort((doc_ids, codes))
        pos = (
            pdf["positions"].to_numpy()[idx]
            if "positions" in pdf.columns
            else None
        )
        return encode_arrays(
            shard_id, terms[idx], doc_ids[idx], tfs[idx], dfs[idx], t0,
            pos_bytes=pos,
        )

    return (
        joined.groupBy("shard_id").applyInPandas(encode_shard, _STAGE_C_SCHEMA).collect()
    )


# Stride between shard id-spaces when ``dense_ids=False``: doc_id =
# shard_id * ID_STRIDE + local_rank. 2^40 docs per shard (a 10^12-doc
# corpus across 256 shards uses < 0.4 % of it); stage A fails loudly on
# overflow. Global order still holds: shard k's ids all precede shard
# k+1's, and within a shard ranks follow the (repo, path) sort.
ID_STRIDE = 1 << 40


def build_index(
    corpus: DataFrame,
    index_dir: str,
    num_shards: int | None = None,
    verify_sha: bool | None = None,
    resume: bool = True,
    block_size: int = BLOCK_SIZE,
    dense_ids: bool = False,
    with_positions: bool = False,
) -> dict:
    """Run the full build; returns the committed manifest dict.

    ``with_positions``: also store token positions per posting
    (delta-varbyte, self-contained per posting) in the postings shards
    and the encoded lists — enables phrase / proximity queries served
    from the committed index (``phrase.phrase_match_index``). Adds ~one
    varbyte value per token of payload; tf-only builds are unchanged
    byte-for-byte. A resumed build must pass the same value as the run
    that wrote the checkpoints.

    ``dense_ids``: False (default) assigns ``shard * ID_STRIDE + rank``
    — id order still equals global (repo, path) order, but NO counting
    pass is needed, which deletes an entire shuffle of every (repo,
    path) key (at 10^12 files that exchange alone moves ~10^14 bytes).
    True restores gapless 0..N-1 ids via a per-shard countDistinct —
    only worth it when downstream storage wants ids as array indexes.
    The delta-varbyte codec absorbs the stride as one ~6-byte absolute
    first-id per (term, shard) list; every later gap is intra-shard.
    A resumed build must pass the same ``dense_ids`` value as the run
    that wrote the checkpoints (ids of completed shards are final)."""
    spark = corpus.sparkSession
    os.makedirs(index_dir, exist_ok=True)
    t_start = time.time()
    if verify_sha is None:
        verify_sha = "content_sha256" in corpus.columns
    has_expected = "content_sha256" in corpus.columns

    # Normalize NULL keys to "" ONCE at the input: every downstream
    # accounting path (boundary sampling, per-shard countDistinct sizing,
    # stage-A dedup, _shard_of_udf's fillna) must agree on the key of a
    # NULL-repo/path row, or doc-id offsets diverge from the rows stage A
    # actually assigns and ids collide across shards.
    corpus = corpus.withColumn(
        "repo", F.coalesce(F.col("repo"), F.lit(""))
    ).withColumn("path", F.coalesce(F.col("path"), F.lit("")))

    if num_shards is None:
        num_shards = max(1, min(spark.sparkContext.defaultParallelism * 2, 256))

    # ---- shard boundaries: cheap pruned sample, persisted for resume --
    # (a resumed build MUST shard identically or completed-shard markers
    # would describe the wrong doc ranges)
    t_sz = time.time()
    keys = corpus.select("repo", "path")
    if dense_ids:
        # cache the pruned keys across the boundary-sample job and the
        # offset-count job (sequential — counts need the boundaries —
        # but they need not scan the source twice)
        keys = keys.persist()
    build_config = {"positional": bool(with_positions), "dense_ids": bool(dense_ids)}
    persisted = ckpt.read_boundaries(index_dir) if resume else None
    if persisted is not None:
        num_shards, bounds = persisted
        prev_config = ckpt.read_build_config(index_dir) or {}
        for key, val in build_config.items():
            if key in prev_config and bool(prev_config[key]) != val:
                raise ValueError(
                    f"resume mismatch: checkpointed build has {key}="
                    f"{prev_config[key]}, this run passed {key}={val} — "
                    "finished shards would mix layouts; pass resume=False "
                    "(fresh dir) or the original flags"
                )
    else:
        bounds = _compute_boundaries(keys, num_shards)
        ckpt.write_boundaries(index_dir, num_shards, bounds, config=build_config)
    t_bounds = time.time() - t_sz
    route = _route_tokens(spark, num_shards)
    shard_of = _shard_of_udf(bounds)
    if dense_ids:
        # gapless deterministic doc-id offsets from a PRUNED key
        # aggregation: two string columns cross this shuffle, never
        # `content`. Runs over the full corpus even on resume so
        # offsets reproduce exactly.
        sizes_rows = (
            keys
            .withColumn("_pid", shard_of("repo", "path"))
            .groupBy("_pid")
            .agg(F.countDistinct("repo", "path").alias("n"))
            .collect()
        )
        keys.unpersist()
        sizes = {r["_pid"]: r["n"] for r in sizes_rows}
        n_docs = int(sum(sizes.values()))
        offsets, acc = {}, 0
        for pid in sorted(sizes):
            offsets[pid] = acc
            acc += sizes[pid]
        id_capacity = None
        run_stage_a = n_docs > 0
    else:
        # stride ids: offsets are a pure function of the shard id — no
        # counting job, no key shuffle, corpus size learned from stage
        # A's own lineage markers after the fact
        offsets = {pid: pid * ID_STRIDE for pid in range(num_shards)}
        id_capacity = ID_STRIDE
        run_stage_a = True
    boff = spark.sparkContext.broadcast(offsets)
    t_sizing = time.time() - t_sz

    # ---- stage A ------------------------------------------------------
    done_a = ckpt.done_shards(index_dir, "postings") if resume else set()
    postings_dir = os.path.join(index_dir, POSTINGS_DIR)
    catalog_dir = os.path.join(index_dir, CATALOG_DIR)
    stats_partial_dir = os.path.join(index_dir, STATS_PARTIAL_DIR)

    def stage_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        pa.set_cpu_count(1)  # see encode_from_file: task = one thread
        pa.set_io_thread_count(2)
        t0 = time.time()
        pid = None
        pending: pd.DataFrame | None = None  # last run's candidate row
        cat_parts: list[pd.DataFrame] = []
        post_parts: list[pd.DataFrame] = []
        counter = 0
        mismatches = 0
        n_tokens = 0

        def process(rows: pd.DataFrame) -> None:
            nonlocal counter, mismatches, n_tokens
            if rows.empty:
                return
            content = rows["content"].fillna("")
            sha = content.map(lambda s: hashlib.sha256(s.encode("utf-8")).hexdigest())
            if verify_sha and has_expected:
                mismatches += int((sha != rows["content_sha256"]).sum())
            if with_positions:
                p_doc, p_term, p_tf, doc_lens, p_pos = (
                    tokenize_postings_positions(content)
                )
            else:
                p_doc, p_term, p_tf, doc_lens = tokenize_postings_arrays(content)
            doc_ids = np.arange(counter, counter + len(rows), dtype=np.int64) + boff.value[pid]
            counter += len(rows)
            n_tokens += int(doc_lens.sum())
            cat_parts.append(
                pd.DataFrame(
                    {
                        "doc_id": doc_ids,
                        "repo": rows["repo"].values,
                        "path": rows["path"].values,
                        "commit": rows["commit"].values,
                        "lang": rows["lang"].values,
                        "content_sha256": sha.values,
                        "doc_len": doc_lens,
                        # provenance pass-through (registry.py is the
                        # state machine); path-shape is only the default
                        # for provenance-less corpora
                        "is_nested": (
                            rows["is_nested"].fillna(False).to_numpy(dtype=bool)
                            if "is_nested" in rows.columns
                            else rows["path"].str.contains("/").values
                        ),
                        "source_root": (
                            rows["source_root"].values
                            if "source_root" in rows.columns
                            else rows["repo"].values
                        ),
                    }
                )
            )
            if p_doc.size:
                part = {"term": p_term, "doc_id": doc_ids[p_doc], "tf": p_tf}
                if with_positions:
                    from text_indexer_spark.operators.codec import (
                        encode_positions_grouped,
                    )

                    buf, per = encode_positions_grouped(p_pos, p_tf)
                    pcs = np.concatenate([[0], np.cumsum(per)])
                    mv = memoryview(buf)
                    part["positions"] = [
                        bytes(mv[s:e]) for s, e in zip(pcs[:-1], pcs[1:])
                    ]
                post_parts.append(pd.DataFrame(part))

        carry_key = None
        for b in batches:
            if b.empty:
                continue
            # one shard per physical partition is a hard invariant (doc
            # ids, markers and shard files all key on it) — fail loud if
            # the routing exchange ever delivers a mixed partition
            bpids = b["_pid"].to_numpy()
            if pid is not None and bpids[0] != pid or (bpids != bpids[0]).any():
                raise RuntimeError(
                    f"mixed shard ids in one partition: {pid} vs {set(bpids.tolist())}"
                )
            pid = int(bpids[0])
            b = b.drop(columns=["_pid"])
            if pending is not None:
                first_key = (b["repo"].iloc[0], b["path"].iloc[0])
                if first_key != carry_key:
                    process(pending)  # run ended at batch boundary
                pending = None
            kept, carry_key = _dedup_batch(b, carry_key)
            if len(kept):
                last_key = (kept["repo"].iloc[-1], kept["path"].iloc[-1])
                if last_key == carry_key:
                    pending = kept.iloc[[-1]]
                    kept = kept.iloc[:-1]
            process(kept)
        if pending is not None:
            process(pending)
        if pid is None:
            return
        if id_capacity is not None and counter > id_capacity:
            raise RuntimeError(
                f"shard {pid} exceeded its id stride ({counter} > {id_capacity}); "
                "increase num_shards or build with dense_ids=True"
            )
        cat = (
            pd.concat(cat_parts, ignore_index=True)
            if cat_parts
            else pd.DataFrame(
                columns=["doc_id", "repo", "path", "commit", "lang",
                         "content_sha256", "doc_len", "is_nested", "source_root"]
            )
        )
        empty_post = {"term": pd.Series(dtype="object"),
                      "doc_id": pd.Series(dtype="int64"),
                      "tf": pd.Series(dtype="int64")}
        if with_positions:
            empty_post["positions"] = pd.Series(dtype="object")
        post = (
            pd.concat(post_parts, ignore_index=True)
            if post_parts
            else pd.DataFrame(empty_post)
        )
        _write_shard_parquet(cat, catalog_dir, pid)
        post_schema = None
        if with_positions:
            import pyarrow as pa

            post_schema = pa.schema(
                [("term", pa.string()), ("doc_id", pa.int64()),
                 ("tf", pa.int64()), ("positions", pa.binary())]
            )
        _write_shard_parquet(post, postings_dir, pid, schema=post_schema)
        # per-shard term-df PARTIAL, map-side-combined here so stage B
        # aggregates Σ(per-shard vocab) rows instead of rescanning every
        # posting (at 100 TB: ~shards×|vocab∩shard| vs 10^12 rows)
        if len(post):
            part = post.groupby("term", sort=False).size().reset_index(name="df")
            part["df"] = part["df"].astype("int64")
        else:
            part = pd.DataFrame(
                {"term": pd.Series(dtype="object"), "df": pd.Series(dtype="int64")}
            )
        _write_shard_parquet(part, stats_partial_dir, pid)
        secs = time.time() - t0
        ckpt.write_marker(
            index_dir, "postings", pid,
            n_docs=int(len(cat)), n_postings=int(len(post)),
            n_tokens=n_tokens, sha_mismatches=mismatches,
        )
        yield pd.DataFrame(
            [{
                "shard_id": pid, "n_docs": len(cat), "n_postings": len(post),
                "n_tokens": n_tokens, "sha_mismatches": mismatches,
                "tokenize_sec": secs,
                "postings_per_sec": (len(post) / secs) if secs > 0 else 0.0,
            }]
        )

    pre = corpus
    if not has_expected:
        pre = pre.withColumn("content_sha256", F.lit(None).cast("string"))
    # completed shards are dropped BEFORE the exchange: a resumed build
    # neither reads nor shuffles their bytes (map-side skip)
    a_input = _sharded_sorted(pre, bounds, route, skip_pids=sorted(done_a))
    a_metrics = []
    t_a0 = time.time()
    if run_stage_a:
        a_metrics = a_input.mapInPandas(stage_a, _STAGE_A_SCHEMA).collect()
    t_stage_a = time.time() - t_a0
    total_mismatch = sum(r["sha_mismatches"] for r in a_metrics)
    if verify_sha and total_mismatch:
        raise ValueError(f"sha256 verification failed for {total_mismatch} rows")

    # ---- stage B: global stats ---------------------------------------
    # N and avgdl use CATALOG semantics (empty docs count, length 0) so
    # the compressed path scores identically to the DataFrame scorer.
    stats_dir = os.path.join(index_dir, STATS_DIR)
    lineage = [ckpt.read_marker(index_dir, "postings", s) for s in range(num_shards)]
    total_tokens = sum(m["n_tokens"] for m in lineage if m)
    n_docs_committed = sum(m["n_docs"] for m in lineage if m)
    avgdl = (total_tokens / n_docs_committed) if n_docs_committed else 0.0
    t_b0 = time.time()
    stats_marker = ckpt.read_marker(index_dir, "stats") if resume else None
    if n_docs_committed and (
        stats_marker is None or stats_marker.get("n_docs") != n_docs_committed
    ):
        # stage A wrote a per-shard (term, df) PARTIAL alongside each
        # postings shard (map-side combine fused into the tokenize pass),
        # so the stats job scans Σ(per-shard vocab) rows, not one row per
        # posting. Indexes built before partials existed (resume across
        # versions) fall back to the postings scan, whose hash agg still
        # map-side-combines to per-partition vocab before the shuffle.
        done_now = ckpt.done_shards(index_dir, "postings")
        have_partials = all(
            os.path.exists(
                os.path.join(stats_partial_dir, f"shard_{s:05d}.parquet")
            )
            for s in done_now
        ) and bool(done_now)
        if have_partials:
            term_src = (
                spark.read.parquet(stats_partial_dir)
                .groupBy("term")
                .agg(F.sum("df").cast("long").alias("df"))
            )
        else:
            term_src = (
                spark.read.parquet(postings_dir)
                .groupBy("term")
                .agg(F.count("*").cast("long").alias("df"))
            )
        term_src.write.mode("overwrite").parquet(stats_dir)
        ckpt.write_marker(
            index_dir, "stats",
            n_docs=n_docs_committed, total_tokens=total_tokens, avgdl=avgdl,
        )

    t_stage_b = time.time() - t_b0

    # ---- stage C: encode compressed posting lists per shard -----------
    t_c0 = time.time()
    done_c = ckpt.done_shards(index_dir, "lists") if resume else set()
    todo_c = sorted(set(range(num_shards)) - done_c) if n_docs_committed else []
    c_metrics = encode_shards(
        spark, index_dir, todo_c,
        n_docs=n_docs_committed, avgdl=avgdl, block_size=block_size,
    )
    t_stage_c = time.time() - t_c0

    # ---- metrics + manifest commit ------------------------------------
    # metrics rows are already ON the driver (collected stage outputs) —
    # a driver-side pyarrow write costs zero Spark jobs; a
    # createDataFrame().write here would spin up a whole job for a few
    # dozen rows (visible fixed cost in the pinned scaling runs)
    metrics_rows = [r.asDict() for r in a_metrics] + [r.asDict() for r in c_metrics]
    if metrics_rows:
        import pyarrow as pa
        import uuid as _uuid

        from text_indexer_spark import storage as _storage

        # explicit UNION schema over the stage-A and stage-C row shapes:
        # from_pylist would otherwise infer from the first row and drop
        # the other stage's columns
        metrics_schema = pa.schema([
            ("shard_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_postings", pa.int64()),
            ("n_tokens", pa.int64()),
            ("sha_mismatches", pa.int64()),
            ("tokenize_sec", pa.float64()),
            ("n_terms", pa.int64()),
            ("bytes_ids", pa.int64()),
            ("bytes_tfs", pa.int64()),
            ("bytes_weights", pa.int64()),
            ("skew_ratio", pa.float64()),
            ("encode_sec", pa.float64()),
            ("postings_per_sec", pa.float64()),
        ])
        mdir = os.path.join(index_dir, METRICS_DIR)
        _storage.makedirs(mdir)
        _storage.write_parquet_atomic(
            pa.Table.from_pylist(metrics_rows, schema=metrics_schema),
            _storage.join(mdir, f"metrics_{_uuid.uuid4().hex}.parquet"),
        )
    manifest = {
        "version": 1,
        "n_docs": n_docs_committed,
        "num_shards": num_shards,
        "shard_size": (
            max(1, -(-n_docs_committed // num_shards)) if n_docs_committed else 1
        ),
        "dense_ids": dense_ids,
        "positional": bool(with_positions),
        "avgdl": avgdl,
        "total_tokens": total_tokens,
        "block_size": block_size,
        "built_sec": time.time() - t_start,
        "stage_sec": {
            "sizing": round(t_sizing, 3),
            "tokenize_postings": round(t_stage_a, 3),
            "stats": round(t_stage_b, 3),
            "encode_lists": round(t_stage_c, 3),
        },
        "sizing_sec": {
            "boundary_sample": round(t_bounds, 3),
            "offset_counts": round(t_sizing - t_bounds, 3),
        },
        "stages": {
            "postings_shards": sorted(ckpt.done_shards(index_dir, "postings")),
            "lists_shards": sorted(ckpt.done_shards(index_dir, "lists")),
        },
    }
    ckpt.commit_manifest(index_dir, manifest)
    return manifest


def load_posting_lists(spark: SparkSession, index_dir: str) -> DataFrame:
    if ckpt.read_manifest(index_dir) is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    return spark.read.parquet(os.path.join(index_dir, LISTS_DIR))


def load_catalog(spark: SparkSession, index_dir: str) -> DataFrame:
    if ckpt.read_manifest(index_dir) is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    return spark.read.parquet(os.path.join(index_dir, CATALOG_DIR))
