"""Incremental sync of a COMMITTED index directory.

The DataFrame-level sync (``operators/sync.py``) answers "what changed
and what do the new catalog/postings look like"; this module applies a
change set to the persisted sharded index produced by
``index_build.build_index`` while touching only what changed:

* the snapshot diff (full outer join, ≙ ``IndexedFileManager.kt:83-143``)
  is delta-sized after the unchanged-row filter;
* changed documents are tokenized — NOTHING ELSE is re-tokenized and no
  corpus content is re-shuffled (at 100 TB, tokenize + the wide shuffle
  are ~the entire build cost; a sync touching 0.1% of docs re-reads
  ~0.1% of content);
* each AFFECTED shard merges its postings/catalog file in ONE task that
  reads the old file locally (work ships to data, no shuffle of
  unchanged postings); unaffected shards are hard-linked into the new
  index version (the local stand-in for object-store manifest reuse);
* BM25 weights are baked into the compressed lists, and global stats
  (N, avgdl, per-term df) move whenever the corpus changes, so lists are
  re-encoded from the merged postings with the NEW stats — scores stay
  EXACTLY equal to a from-scratch rebuild (differential-tested). When
  stats happen not to change, only affected shards re-encode.

Identity rules follow the reference's registry (``IndexedDocuments.kt:
42-66``): an existing path keeps its doc_id on re-index; new paths mint
fresh ids above the current max (deterministic rank of (repo, path)
among the added rows). Unchanged docs keep ids, so unaffected shard
files stay byte-identical.

The new index version is written to ``out_dir`` and committed with its
own manifest (lineage points at the parent); the old version stays
readable throughout — snapshot isolation, the engine's replacement for
the reference's single mutex (``DocumentsIndexer.kt:29``).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_indexer_spark import checkpoint as ckpt
from text_indexer_spark import storage
from text_indexer_spark.operators.index_build import (
    CATALOG_DIR,
    LISTS_DIR,
    POSTINGS_DIR,
    STATS_DIR,
    _shard_of_udf,
    _write_shard_parquet,
    encode_shards,
    load_catalog,
)
from text_indexer_spark.operators.postings import dedup_corpus
from text_indexer_spark.operators.sync import diff_snapshots
from text_indexer_spark.tokenizer import tokenize_column

_CAT_COLS = [
    "doc_id", "repo", "path", "commit", "lang", "content_sha256",
    "doc_len", "is_nested", "source_root",
]

_MERGE_POST_SCHEMA = "shard int, n_docs_removed long, n_postings long"
_MERGE_CAT_SCHEMA = "shard int, n_docs long, n_tokens long"


def _encode_pos_batch(pos_lists: pd.Series) -> pd.Series:
    """array<int> sorted positions → the per-posting delta-varbyte
    payload (one self-contained slice per posting — the same encoding
    the bulk build writes). Arrow-batched: the whole batch encodes in
    one vectorized pass, then slices per row. Wrapped into a pandas_udf
    lazily (UDF construction needs an active session — this module also
    imports inside Python workers)."""
    from text_indexer_spark.operators.codec import encode_positions_grouped

    tfs = np.fromiter((len(x) for x in pos_lists), dtype=np.int64,
                      count=len(pos_lists))
    if tfs.sum() == 0:
        return pd.Series([b""] * len(pos_lists))
    flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pos_lists])
    buf, per = encode_positions_grouped(flat, tfs)
    csum = np.concatenate([[0], np.cumsum(per)]).astype(np.int64)
    mv = memoryview(buf)
    return pd.Series(
        [bytes(mv[s:e]) for s, e in zip(csum[:-1], csum[1:])]
    )


def _link_or_copy(src: str, dst: str) -> None:
    """Zero-copy shard carry-over via ``storage.link_or_copy``:
    hard link on local filesystems, stream copy elsewhere. Idempotent —
    a re-run after a partial failure may find the link already in
    place."""
    from text_indexer_spark import storage

    storage.link_or_copy(src, dst)


def _shard_file(base: str, sub: str, shard: int) -> str:
    from text_indexer_spark import storage

    return storage.join(base, sub, f"shard_{shard:05d}.parquet")


def upserts_as_snapshot(
    spark: SparkSession, index_dir: str, batch: DataFrame
) -> DataFrame:
    """Turn an UPSERT FEED micro-batch into the full source snapshot
    ``sync_index_dir`` diffs against — without retaining any corpus
    content for unchanged documents.

    The diff reads only ``commit`` for rows it classifies unchanged, so
    the synthesized snapshot is: catalog keys (commit carried, content
    NULL) for every doc NOT in the batch, plus the batch's own rows.
    A batch row with ``deleted = true`` (optional column) is a tombstone:
    its key is simply absent from the snapshot → classified 'remove'.
    This is how a CDC/Kafka feed drives the same exact-sync machinery as
    snapshot diffs (stream ≡ batch, tested)."""
    cat = load_catalog(spark, index_dir).select(
        "repo", "path", "commit", "lang",
        F.lit(None).cast("string").alias("content"),
    )
    if "deleted" in batch.columns:
        tombstones = batch.filter(F.col("deleted") == True)  # noqa: E712
        ups = batch.filter(
            (F.col("deleted").isNull()) | (F.col("deleted") == False)  # noqa: E712
        )
    else:
        tombstones = batch.limit(0)
        ups = batch
    ups = dedup_corpus(ups.select("repo", "path", "commit", "lang", "content"))
    touched = ups.select("repo", "path").unionByName(
        tombstones.select("repo", "path")
    )
    untouched = cat.join(touched, ["repo", "path"], "left_anti")
    return untouched.unionByName(ups)


def sync_index_dir(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame,
    out_dir: str,
) -> dict:
    """Apply the (source − index) change set; returns the new manifest."""
    t0 = time.time()
    manifest = ckpt.read_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    persisted = ckpt.read_boundaries(index_dir)
    if persisted is None:
        raise FileNotFoundError(f"no shard boundaries at {index_dir}")
    num_shards, bounds = persisted
    block_size = int(manifest.get("block_size", 128))
    positional = bool(manifest.get("positional", False))
    os.makedirs(out_dir, exist_ok=True)

    catalog = load_catalog(spark, index_dir)
    src = dedup_corpus(source)
    shard_of = _shard_of_udf(bounds)
    diff = (
        diff_snapshots(catalog, src)
        .withColumn("shard", shard_of("repo", "path"))
        .cache()
    )
    change_counts = {
        r["change"]: r["n"]
        for r in diff.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    affected = sorted(
        r["shard"] for r in diff.select("shard").distinct().collect()
    )

    # ---- new/updated documents: the ONLY content that gets tokenized --
    delta_cat = None
    delta_post = None
    if change_counts.get("add") or change_counts.get("reindex"):
        keys = ["repo", "path"]
        upserts = src.join(
            diff.filter(F.col("change").isin("add", "reindex")).select(*keys),
            keys, "left_semi",
        )
        reidx = diff.filter(F.col("change") == "reindex").select(
            *keys, F.col("doc_id").alias("old_id")
        )
        max_id = catalog.agg(F.max("doc_id")).first()[0] or 0
        # deterministic fresh ids for adds WITHOUT a single-reducer
        # window: global rank = per-shard offset + rank within shard
        # (window partitioned by shard runs parallel; offsets come from
        # a tiny per-shard count collect). Survives a mass-add sync.
        adds_only = upserts.join(reidx, keys, "left_anti").withColumn(
            "shard", shard_of("repo", "path")
        )
        add_counts = {
            r["shard"]: r["n"]
            for r in adds_only.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        add_offsets, acc = {}, int(max_id) + 1
        for s in sorted(add_counts):
            add_offsets[s] = acc
            acc += add_counts[s]
        if add_offsets:
            off_map = F.create_map(
                *[x for s, o in add_offsets.items()
                  for x in (F.lit(int(s)), F.lit(int(o)))]
            )
            w = Window.partitionBy("shard").orderBy("repo", "path")
            adds_with_ids = adds_only.withColumn(
                "doc_id",
                (F.row_number().over(w) - 1 + off_map[F.col("shard")]).cast("long"),
            ).drop("shard")
        else:
            adds_with_ids = adds_only.drop("shard").withColumn(
                "doc_id", F.lit(None).cast("long")
            ).limit(0)
        reindexed = upserts.join(reidx, keys, "inner").withColumn(
            "doc_id", F.col("old_id")
        ).drop("old_id")
        with_ids = adds_with_ids.unionByName(reindexed)
        enriched = (
            with_ids.withColumn(
                "content_sha256",
                F.sha2(F.coalesce(F.col("content"), F.lit("")), 256),
            )
            .withColumn("_toks", tokenize_column(F.coalesce(F.col("content"), F.lit(""))))
            .withColumn("doc_len", F.size("_toks").cast("long"))
            .withColumn(
                "is_nested",
                F.col("is_nested") if "is_nested" in with_ids.columns
                else F.col("path").contains("/"),
            )
            .withColumn(
                "source_root",
                F.col("source_root") if "source_root" in with_ids.columns
                else F.col("repo"),
            )
            .withColumn("shard", shard_of("repo", "path"))
            .cache()
        )
        delta_cat = enriched.select("shard", *_CAT_COLS)
        if positional:
            # positional index: fresh docs carry their per-posting
            # position payload through the merge (same self-contained
            # delta-varbyte encoding the build writes)
            delta_post = (
                enriched.select(
                    "shard", "doc_id",
                    F.posexplode("_toks").alias("pos", "term"),
                )
                .groupBy("shard", "doc_id", "term")
                .agg(
                    F.count("*").cast("long").alias("tf"),
                    F.sort_array(F.collect_list("pos")).alias("_pos"),
                )
                .withColumn(
                    "positions",
                    F.pandas_udf(_encode_pos_batch, "binary")(F.col("_pos")),
                )
                .drop("_pos")
            )
        else:
            delta_post = (
                enriched.select("shard", "doc_id", F.explode("_toks").alias("term"))
                .groupBy("shard", "doc_id", "term")
                .agg(F.count("*").cast("long").alias("tf"))
            )

    if not affected:
        # nothing changed: new version is a pure link of the old one
        for sub in (POSTINGS_DIR, CATALOG_DIR, LISTS_DIR):
            for s in range(num_shards):
                p = _shard_file(index_dir, sub, s)
                if storage.exists(p):
                    _link_or_copy(p, _shard_file(out_dir, sub, s))
        if os.path.isdir(os.path.join(index_dir, STATS_DIR)):
            shutil.copytree(
                os.path.join(index_dir, STATS_DIR),
                os.path.join(out_dir, STATS_DIR),
                dirs_exist_ok=True,
            )
        shutil.copytree(
            os.path.join(index_dir, "checkpoints"),
            os.path.join(out_dir, "checkpoints"),
            dirs_exist_ok=True,
        )
        ckpt.write_boundaries(out_dir, num_shards, bounds)
        new_manifest = dict(manifest)
        new_manifest.update(
            version=manifest.get("version", 1) + 1,
            parent=index_dir,
            synced={"add": 0, "remove": 0, "reindex": 0},
            built_sec=time.time() - t0,
        )
        ckpt.commit_manifest(out_dir, new_manifest)
        diff.unpersist()
        return new_manifest

    # ---- per-affected-shard merge: one task reads old file + delta ----
    stale = diff.filter(F.col("change").isin("remove", "reindex")).select(
        "shard", "doc_id"
    )
    pos_cols = (
        [F.lit(None).cast("binary").alias("positions")] if positional else []
    )
    post_in = stale.select(
        "shard", "doc_id", F.lit(None).cast("string").alias("term"),
        F.lit(0).cast("long").alias("tf"), F.lit("del").alias("op"), *pos_cols,
    )
    # anchor row per affected shard: a shard whose only change is an
    # empty-content add would otherwise get no merge task (and no
    # output file)
    post_in = post_in.unionByName(
        diff.select("shard").distinct().select(
            "shard", F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("long").alias("tf"), F.lit("noop").alias("op"),
            *pos_cols,
        )
    )
    if delta_post is not None:
        add_cols = ["shard", "doc_id", "term", "tf"]
        post_in = post_in.unionByName(
            delta_post.select(
                *add_cols, F.lit("add").alias("op"),
                *(["positions"] if positional else []),
            )
        )

    def merge_postings(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        shard = int(pdf["shard"].iloc[0])
        dels = set(
            pdf.loc[pdf["op"] == "del", "doc_id"].astype("int64").tolist()
        )
        pdf = pdf[pdf["op"] != "noop"]
        post_cols = ["term", "doc_id", "tf"] + (
            ["positions"] if positional else []
        )
        adds = pdf.loc[pdf["op"] == "add", post_cols]
        old_path = _shard_file(index_dir, POSTINGS_DIR, shard)
        if storage.exists(old_path):
            _fs, _fp = storage.resolve(old_path)
            old = pq.read_table(_fp, filesystem=_fs).to_pandas()
        else:
            empty = {"term": pd.Series(dtype="object"),
                     "doc_id": pd.Series(dtype="int64"),
                     "tf": pd.Series(dtype="int64")}
            if positional:
                empty["positions"] = pd.Series(dtype="object")
            old = pd.DataFrame(empty)
        # drop BOTH removed and reindexed ids, then append the fresh rows
        # of reindexed/added docs (replace semantics, Index.kt:15-23)
        kept = old[~old["doc_id"].isin(dels)] if dels else old
        merged = pd.concat([kept, adds], ignore_index=True)
        merged = merged.sort_values(["doc_id", "term"], kind="stable").reset_index(drop=True)
        out_schema = None
        if positional:
            import pyarrow as pa

            out_schema = pa.schema(
                [("term", pa.string()), ("doc_id", pa.int64()),
                 ("tf", pa.int64()), ("positions", pa.binary())]
            )
        _write_shard_parquet(
            merged[post_cols], os.path.join(out_dir, POSTINGS_DIR), shard,
            schema=out_schema,
        )
        return pd.DataFrame(
            [{"shard": shard, "n_docs_removed": len(dels), "n_postings": len(merged)}]
        )

    post_metrics = {
        r["shard"]: r
        for r in post_in.groupBy("shard")
        .applyInPandas(merge_postings, _MERGE_POST_SCHEMA)
        .collect()
    }

    stale_keys = diff.filter(F.col("change").isin("remove", "reindex")).select(
        "shard", "repo", "path"
    )
    cat_in = stale_keys.select(
        "shard", "repo", "path", F.lit("del").alias("op"),
        *[F.lit(None).cast(t).alias(c) for c, t in (
            ("doc_id", "long"), ("commit", "string"), ("lang", "string"),
            ("content_sha256", "string"), ("doc_len", "long"),
            ("is_nested", "boolean"), ("source_root", "string"),
        )],
    )
    if delta_cat is not None:
        cat_in = cat_in.unionByName(
            delta_cat.select(
                "shard", "repo", "path", F.lit("add").alias("op"),
                "doc_id", "commit", "lang", "content_sha256", "doc_len",
                "is_nested", "source_root",
            )
        )

    def merge_catalog(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        shard = int(pdf["shard"].iloc[0])
        del_keys = set(
            map(tuple, pdf.loc[pdf["op"] == "del", ["repo", "path"]].to_numpy())
        )
        adds = pdf.loc[pdf["op"] == "add", _CAT_COLS]
        old_path = _shard_file(index_dir, CATALOG_DIR, shard)
        if storage.exists(old_path):
            _fs, _fp = storage.resolve(old_path)
            old = pq.read_table(_fp, filesystem=_fs).to_pandas()
        else:
            old = pd.DataFrame(columns=_CAT_COLS)
        if del_keys:
            mask = [
                (r, p) not in del_keys
                for r, p in zip(old["repo"], old["path"])
            ]
            old = old[mask]
        merged = pd.concat([old, adds], ignore_index=True)
        merged = merged.sort_values(["repo", "path"], kind="stable").reset_index(drop=True)
        merged["doc_id"] = merged["doc_id"].astype("int64")
        merged["doc_len"] = merged["doc_len"].astype("int64")
        _write_shard_parquet(
            merged[_CAT_COLS], os.path.join(out_dir, CATALOG_DIR), shard
        )
        return pd.DataFrame(
            [{"shard": shard, "n_docs": len(merged),
              "n_tokens": int(merged["doc_len"].sum())}]
        )

    cat_metrics = (
        cat_in.groupBy("shard").applyInPandas(merge_catalog, _MERGE_CAT_SCHEMA).collect()
    )
    for r in cat_metrics:  # lineage markers for the rebuilt shards
        pm = post_metrics.get(r["shard"])
        ckpt.write_marker(
            out_dir, "postings", int(r["shard"]),
            n_docs=int(r["n_docs"]),
            n_postings=int(pm["n_postings"]) if pm else 0,
            n_tokens=int(r["n_tokens"]), sha_mismatches=0,
        )

    # ---- unaffected shards: link files + carry markers forward --------
    affected_set = set(affected)
    for s in range(num_shards):
        if s in affected_set:
            continue
        for sub in (POSTINGS_DIR, CATALOG_DIR):
            p = _shard_file(index_dir, sub, s)
            if storage.exists(p):
                _link_or_copy(p, _shard_file(out_dir, sub, s))
        m = ckpt.read_marker(index_dir, "postings", s)
        if m:
            ckpt.write_marker(
                out_dir, "postings", s,
                **{k: v for k, v in m.items() if k not in ("stage", "shard_id", "ts")},
            )
    ckpt.write_boundaries(out_dir, num_shards, bounds)

    # ---- global stats over the merged postings (stage B semantics) ----
    lineage = [ckpt.read_marker(out_dir, "postings", s) for s in range(num_shards)]
    total_tokens = sum(m["n_tokens"] for m in lineage if m)
    n_docs = sum(m["n_docs"] for m in lineage if m)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    new_stats = (
        spark.read.parquet(os.path.join(out_dir, POSTINGS_DIR))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    new_stats.write.mode("overwrite").parquet(os.path.join(out_dir, STATS_DIR))
    ckpt.write_marker(
        out_dir, "stats", n_docs=n_docs, total_tokens=total_tokens, avgdl=avgdl
    )

    # ---- re-encode: affected shards always; every shard only if the
    # baked-weight inputs (N, avgdl, any term df) actually moved --------
    stats_changed = (
        n_docs != manifest.get("n_docs")
        or abs(avgdl - manifest.get("avgdl", 0.0)) > 1e-12
    )
    if not stats_changed:
        old_stats = spark.read.parquet(os.path.join(index_dir, STATS_DIR))
        drifted = (
            new_stats.alias("n")
            .join(old_stats.alias("o"), "term", "full_outer")
            .filter(
                F.col("n.df").isNull()
                | F.col("o.df").isNull()
                | (F.col("n.df") != F.col("o.df"))
            )
            .limit(1)
            .count()
        )
        stats_changed = drifted > 0
    todo = list(range(num_shards)) if stats_changed else affected
    if stats_changed:
        reused_lists = []
    else:
        reused_lists = [s for s in range(num_shards) if s not in affected_set]
    for s in reused_lists:
        p = _shard_file(index_dir, LISTS_DIR, s)
        if storage.exists(p):
            _link_or_copy(p, _shard_file(out_dir, LISTS_DIR, s))
        m = ckpt.read_marker(index_dir, "lists", s)
        if m:
            ckpt.write_marker(
                out_dir, "lists", s,
                **{k: v for k, v in m.items() if k not in ("stage", "shard_id", "ts")},
            )
    encode_shards(
        spark, out_dir, todo, n_docs=n_docs, avgdl=avgdl, block_size=block_size
    )

    new_manifest = {
        "version": manifest.get("version", 1) + 1,
        "parent": index_dir,
        "n_docs": n_docs,
        "num_shards": num_shards,
        "shard_size": manifest.get("shard_size"),
        "avgdl": avgdl,
        "total_tokens": total_tokens,
        "block_size": block_size,
        "positional": positional,
        "dense_ids": manifest.get("dense_ids"),
        "built_sec": time.time() - t0,
        "synced": {
            "add": int(change_counts.get("add", 0)),
            "remove": int(change_counts.get("remove", 0)),
            "reindex": int(change_counts.get("reindex", 0)),
            "affected_shards": affected,
            "reencoded_shards": todo,
            "stats_changed": bool(stats_changed),
        },
        "stages": {
            "postings_shards": sorted(ckpt.done_shards(out_dir, "postings")),
            "lists_shards": sorted(ckpt.done_shards(out_dir, "lists")),
        },
    }
    ckpt.commit_manifest(out_dir, new_manifest)
    diff.unpersist()
    return new_manifest


def vacuum_versions(versions_dir: str, keep_last: int = 2) -> list[str]:
    """Retention for the immutable version chain: delete all but the
    newest ``keep_last`` COMMITTED versions under ``versions_dir`` (the
    ``v<N>`` directories the streaming maintenance writes).

    Safety properties:

    * uncommitted directories (no ``_MANIFEST.json`` — a writer may be
      mid-commit) are never touched;
    * surviving versions stay fully readable: locally, carried-over
      shard files are hard links (deleting one directory's entry never
      frees a file another version still links); on object stores the
      carry-over was a copy, so versions share nothing;
    * idempotent — re-running after a partial delete just removes the
      remainder.

    Returns the removed version paths (oldest first).
    """
    import re

    committed: list[tuple[int, str]] = []
    for name in storage.listdir(versions_dir):
        m = re.fullmatch(r"v(\d+)", name)
        p = storage.join(versions_dir, name)
        if m and ckpt.read_manifest(p) is not None:
            committed.append((int(m.group(1)), p))
    committed.sort()
    doomed = committed[: max(0, len(committed) - max(keep_last, 1))]
    for _, p in doomed:
        storage.rmtree(p)
    return [p for _, p in doomed]
