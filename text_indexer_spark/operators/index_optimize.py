"""Index optimization (compaction): restore the bulk build's doc-id
layout after any number of incremental syncs.

``index_sync.sync_index_dir`` mints fresh doc ids ABOVE the global max
for added documents (the reference's registry rule,
``IndexedDocuments.kt:42-66``), regardless of which shard the key
routes to. After many syncs each shard's id set is a union of its
original contiguous range plus scattered high ids, which costs real
money at serving time:

* scoped WAND falls off the contiguous-interval fast path onto the
  degraded multi-interval scope (``wand.scope_ranges``);
* delta-gap compression pays one near-2^40 gap per late-added doc
  (stride layout) instead of small intra-shard gaps;
* block-max pruning loses selectivity because late ids interleave
  whole id ranges at the list tail.

``optimize_index`` is the Lucene-``forceMerge`` analogue re-expressed
for this engine: re-rank every shard's ids back to the build invariant
``doc_id = shard_offset + rank(repo, path) within shard`` and re-encode
the compressed lists. Crucially it does this WITHOUT re-tokenizing and
WITHOUT a shuffle:

* one task per shard reads its OWN old catalog + postings files,
  translates ids through an in-task map, rewrites both (work ships to
  data — the same distributed-compaction shape as stage C);
* renumbering changes no term's df and no document's length, so the
  global stats (N, avgdl, per-term df) are carried over verbatim and
  the baked BM25 weights come out bit-identical;
* the result is equal, list for list, to a FROM-SCRATCH rebuild of the
  same corpus over the same shard boundaries (differential-tested in
  ``tests/test_index_optimize.py``) — at ~0.1% of the cost, because
  tokenize + the content shuffle (the ~entire build cost at 100 TB)
  never run.

The optimized index is a new committed version (parent lineage in the
manifest); the input version stays readable throughout, like every
other writer in this engine.
"""

from __future__ import annotations

import os
import shutil
import time

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from text_indexer_spark import checkpoint as ckpt
from text_indexer_spark import storage
from text_indexer_spark.operators.index_build import (
    CATALOG_DIR,
    ID_STRIDE,
    LISTS_DIR,
    POSTINGS_DIR,
    STATS_DIR,
    _write_shard_parquet,
    encode_shards,
)
from text_indexer_spark.operators.index_sync import _CAT_COLS, _shard_file

_OPT_SCHEMA = "shard int, n_docs long, n_postings long, n_tokens long"


def _shard_doc_counts(index_dir: str, num_shards: int) -> dict[int, int]:
    """Per-shard document counts WITHOUT scanning data: lineage markers
    first (both the build and the sync write ``n_docs`` per shard),
    parquet footer metadata as the fallback — driver-side, O(num_shards)
    tiny reads."""
    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    for s in range(num_shards):
        m = ckpt.read_marker(index_dir, "postings", s)
        if m and "n_docs" in m:
            counts[s] = int(m["n_docs"])
            continue
        p = _shard_file(index_dir, CATALOG_DIR, s)
        if storage.exists(p):
            fs, fp = storage.resolve(p)
            counts[s] = int(pq.read_metadata(fp, filesystem=fs).num_rows)
        else:
            counts[s] = 0
    return counts


def optimize_index(spark: SparkSession, index_dir: str, out_dir: str) -> dict:
    """Re-rank doc ids to the build invariant and re-encode; returns the
    new committed manifest. Zero shuffles: per-shard local rewrite tasks
    plus the (already shuffle-free) stage-C re-encode."""
    t0 = time.time()
    manifest = ckpt.read_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    persisted = ckpt.read_boundaries(index_dir)
    if persisted is None:
        raise FileNotFoundError(f"no shard boundaries at {index_dir}")
    num_shards, bounds = persisted
    positional = bool(manifest.get("positional", False))
    dense_ids = bool(manifest.get("dense_ids", False))
    block_size = int(manifest.get("block_size", 128))
    os.makedirs(out_dir, exist_ok=True)

    # new id offsets exactly as build_index computes them: stride ids
    # are a pure function of the shard; dense ids cumulate shard sizes
    # in shard order (counts from lineage markers, no data scan)
    if dense_ids:
        sizes = _shard_doc_counts(index_dir, num_shards)
        offsets, acc = {}, 0
        for s in range(num_shards):
            offsets[s] = acc
            acc += sizes.get(s, 0)
    else:
        offsets = {s: s * ID_STRIDE for s in range(num_shards)}

    post_cols = ["term", "doc_id", "tf"] + (["positions"] if positional else [])

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        shard = int(pdf["shard"].iloc[0])
        offset = int(pdf["offset"].iloc[0])
        cat_path = _shard_file(index_dir, CATALOG_DIR, shard)
        if not storage.exists(cat_path):
            return pd.DataFrame(
                [{"shard": shard, "n_docs": 0, "n_postings": 0, "n_tokens": 0}]
            )
        fs, fp = storage.resolve(cat_path)
        cat = pq.read_table(fp, filesystem=fs).to_pandas()
        # the catalog sort order IS the id order of a fresh build:
        # (repo, path) code-point ascending (index_build._KEY_SEP note)
        cat = cat.sort_values(["repo", "path"], kind="stable").reset_index(drop=True)
        if not dense_ids and len(cat) > ID_STRIDE:
            raise ValueError(
                f"shard {shard} holds {len(cat)} docs > ID_STRIDE; "
                "rebuild with dense_ids=True or more shards"
            )
        new_ids = np.arange(len(cat), dtype=np.int64) + offset
        id_map = dict(zip(cat["doc_id"].astype("int64"), new_ids))
        cat["doc_id"] = new_ids
        _write_shard_parquet(cat[_CAT_COLS], os.path.join(out_dir, CATALOG_DIR), shard)

        post_path = _shard_file(index_dir, POSTINGS_DIR, shard)
        if storage.exists(post_path):
            fs2, fp2 = storage.resolve(post_path)
            post = pq.read_table(fp2, filesystem=fs2).to_pandas()
        else:
            post = pd.DataFrame({c: pd.Series(dtype=t) for c, t in (
                ("term", "object"), ("doc_id", "int64"), ("tf", "int64"),
            ) if c in post_cols})
            if positional:
                post["positions"] = pd.Series(dtype="object")
        if len(post):
            post["doc_id"] = post["doc_id"].astype("int64").map(id_map)
            if post["doc_id"].isna().any():
                raise ValueError(
                    f"shard {shard}: postings reference doc ids absent "
                    "from the catalog — index is corrupt"
                )
            post["doc_id"] = post["doc_id"].astype("int64")
            post = post.sort_values(["doc_id", "term"], kind="stable")
        out_schema = None
        if positional:
            out_schema = pa.schema(
                [("term", pa.string()), ("doc_id", pa.int64()),
                 ("tf", pa.int64()), ("positions", pa.binary())]
            )
        _write_shard_parquet(
            post[post_cols].reset_index(drop=True),
            os.path.join(out_dir, POSTINGS_DIR), shard, schema=out_schema,
        )
        return pd.DataFrame([{
            "shard": shard,
            "n_docs": len(cat),
            "n_postings": len(post),
            "n_tokens": int(cat["doc_len"].sum()) if len(cat) else 0,
        }])

    shards_df = spark.createDataFrame(
        [(s, offsets[s]) for s in range(num_shards)], "shard int, offset long"
    )
    metrics = (
        shards_df.groupBy("shard").applyInPandas(rewrite, _OPT_SCHEMA).collect()
    )
    for r in metrics:
        ckpt.write_marker(
            out_dir, "postings", int(r["shard"]),
            n_docs=int(r["n_docs"]), n_postings=int(r["n_postings"]),
            n_tokens=int(r["n_tokens"]), sha_mismatches=0,
        )
    ckpt.write_boundaries(
        out_dir, num_shards, bounds,
        config={"positional": positional, "dense_ids": dense_ids},
    )

    # renumbering changes no df / N / avgdl: stats carry over verbatim
    if os.path.isdir(os.path.join(index_dir, STATS_DIR)):
        shutil.copytree(
            os.path.join(index_dir, STATS_DIR),
            os.path.join(out_dir, STATS_DIR),
            dirs_exist_ok=True,
        )
    n_docs = sum(int(r["n_docs"]) for r in metrics)
    total_tokens = sum(int(r["n_tokens"]) for r in metrics)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    ckpt.write_marker(
        out_dir, "stats", n_docs=n_docs, total_tokens=total_tokens, avgdl=avgdl
    )
    encode_shards(
        spark, out_dir, list(range(num_shards)),
        n_docs=n_docs, avgdl=avgdl, block_size=block_size,
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
        "dense_ids": dense_ids,
        "optimized": True,
        "built_sec": time.time() - t0,
        "stages": {
            "postings_shards": sorted(ckpt.done_shards(out_dir, "postings")),
            "lists_shards": sorted(ckpt.done_shards(out_dir, "lists")),
        },
    }
    ckpt.commit_manifest(out_dir, new_manifest)
    return new_manifest
