"""The resumable index-build job: corpus → persisted index directory.

Replaces the reference's in-memory bulk build (``DocumentsIndexer.kt:
100-130``: per-file coroutines + one index actor) with a three-stage
pipeline whose resume unit is the **doc-range shard**:

    stage A  tokenize + per-doc tf        → postings/shard=K (+ marker)
    stage B  global stats (df, N, avgdl)  → stats/ (+ marker)
    stage C  encode compressed lists      → posting_lists/shard=K (+ marker)
    commit   _MANIFEST.json               → index becomes visible

Scale design:

* **Sharding by doc-id range** (not by term) means every document's
  postings are co-located, so (a) per-doc stats are computable locally,
  (b) the query path can intersect lists doc-at-a-time per shard, and
  (c) a stop-word term's 10^9-entry posting list is structurally split
  across all shards — the explicit skew handling the north rule asks
  for: no single reducer ever sees a whole hot term. Skew ratio per
  shard (hottest term's in-shard df vs mean) is logged to metrics.
* **Per-shard executor-side writes** (pyarrow parquet + tmp-rename) give
  checkpoint granularity = shard; a killed build reuses every completed
  shard because doc-id assignment is deterministic (rank of
  (repo, path, commit) — see ``postings.assign_doc_ids``).
* **sha256 verification**: every row's content hash is recomputed and
  checked against the source table's expected hash during stage A
  (per-row invariant from the baseline input hint); mismatches fail the
  build.
* Tokenization is an Arrow-vectorized pandas operation inside
  applyInPandas (north star: "vectorized Arrow/pandas UDFs tokenize");
  no per-row Python UDFs anywhere.
"""

from __future__ import annotations

import math
import os
import time
import uuid
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark import checkpoint as ckpt
from text_indexer_spark.functions.bm25 import B, K1
from text_indexer_spark.operators.codec import BLOCK_SIZE, encode_posting_list
from text_indexer_spark.operators.postings import build_catalog
from text_indexer_spark.tokenizer import tokenize_series

POSTINGS_DIR = "postings"
LISTS_DIR = "posting_lists"
CATALOG_DIR = "catalog"
STATS_DIR = "stats"
METRICS_DIR = "metrics"

_POSTINGS_OUT_SCHEMA = (
    "shard_id int, n_docs long, n_postings long, n_tokens long, "
    "sha_mismatches long, tokenize_sec double, postings_per_sec double"
)

_LISTS_OUT_SCHEMA = (
    "shard_id int, n_terms long, n_postings long, bytes_ids long, bytes_tfs long, "
    "bytes_weights long, skew_ratio double, encode_sec double, postings_per_sec double"
)

LIST_COLS_SQL = (
    "term string, df long, doc_ids_delta_varbyte binary, tfs_varbyte binary, "
    "weights_f64 binary, block_last_id array<long>, block_max_tf array<long>, "
    "block_max_w array<double>, block_id_off array<long>, block_tf_off array<long>"
)


def _write_shard_parquet(df: pd.DataFrame, directory: str, shard_id: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(directory, exist_ok=True)
    final = os.path.join(directory, f"shard_{shard_id:05d}.parquet")
    tmp = f"{final}.tmp.{uuid.uuid4().hex}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.rename(tmp, final)


def shard_of(doc_id_col, shard_size: int):
    return (doc_id_col / F.lit(shard_size)).cast("int")


def build_index(
    corpus: DataFrame,
    index_dir: str,
    num_shards: int | None = None,
    verify_sha: bool = True,
    resume: bool = True,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Run the full build; returns the committed manifest dict."""
    spark = corpus.sparkSession
    os.makedirs(index_dir, exist_ok=True)
    t_start = time.time()

    # ---- catalog (doc-id authority; deterministic, cheap) -----------
    catalog = build_catalog(corpus).cache()
    n_docs = catalog.count()
    if num_shards is None:
        num_shards = max(1, min(spark.sparkContext.defaultParallelism * 2, 256))
    shard_size = max(1, math.ceil(n_docs / num_shards))
    num_shards = math.ceil(n_docs / shard_size) if n_docs else 1

    cat_marker = ckpt.read_marker(index_dir, "catalog") if resume else None
    if cat_marker is None or cat_marker.get("n_docs") != n_docs:
        catalog.drop("content").write.mode("overwrite").parquet(
            os.path.join(index_dir, CATALOG_DIR)
        )
        ckpt.write_marker(index_dir, "catalog", n_docs=n_docs, shard_size=shard_size)

    # ---- stage A: tokenize → postings per shard ---------------------
    done_a = ckpt.done_shards(index_dir, "postings") if resume else set()
    postings_dir = os.path.join(index_dir, POSTINGS_DIR)
    todo = catalog.withColumn("shard_id", shard_of(F.col("doc_id"), shard_size))
    if done_a:
        todo = todo.filter(~F.col("shard_id").isin(sorted(done_a)))

    def tokenize_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        shard_id = int(pdf["shard_id"].iloc[0])
        content = pdf["content"].fillna("")
        mismatches = 0
        if verify_sha:
            import hashlib

            actual = content.map(lambda s: hashlib.sha256(s.encode("utf-8")).hexdigest())
            mismatches = int((actual != pdf["content_sha256"]).sum())
        toks = tokenize_series(content)
        lens = toks.str.len()
        exploded = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].repeat(lens).values,
                "term": [t for doc in toks for t in doc],
            }
        )
        if exploded.empty:
            tf = pd.DataFrame({"term": [], "doc_id": [], "tf": []}).astype(
                {"term": "object", "doc_id": "int64", "tf": "int64"}
            )
        else:
            tf = (
                exploded.groupby(["term", "doc_id"], sort=False)
                .size()
                .rename("tf")
                .reset_index()
            )
        _write_shard_parquet(tf[["term", "doc_id", "tf"]], postings_dir, shard_id)
        secs = time.time() - t0
        ckpt.write_marker(
            index_dir,
            "postings",
            shard_id,
            n_docs=int(len(pdf)),
            n_postings=int(len(tf)),
            n_tokens=int(lens.sum()),
            sha_mismatches=mismatches,
        )
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id,
                    "n_docs": len(pdf),
                    "n_postings": len(tf),
                    "n_tokens": int(lens.sum()),
                    "sha_mismatches": mismatches,
                    "tokenize_sec": secs,
                    "postings_per_sec": (len(tf) / secs) if secs > 0 else 0.0,
                }
            ]
        )

    a_metrics = []
    if n_docs:
        a_metrics = (
            todo.select("shard_id", "doc_id", "content", "content_sha256")
            .groupBy("shard_id")
            .applyInPandas(tokenize_shard, _POSTINGS_OUT_SCHEMA)
            .collect()
        )
    total_mismatch = sum(r["sha_mismatches"] for r in a_metrics)
    if verify_sha and total_mismatch:
        raise ValueError(f"sha256 verification failed for {total_mismatch} rows")

    # ---- stage B: global stats --------------------------------------
    # N and avgdl use CATALOG semantics (empty docs count, length 0) so
    # the compressed path scores identically to the DataFrame scorer.
    stats_marker = ckpt.read_marker(index_dir, "stats") if resume else None
    stats_dir = os.path.join(index_dir, STATS_DIR)
    shard_lineage = [
        ckpt.read_marker(index_dir, "postings", s) for s in range(num_shards)
    ]
    total_tokens = sum(m["n_tokens"] for m in shard_lineage if m)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    if stats_marker is None or stats_marker.get("n_docs") != n_docs:
        postings_all = spark.read.parquet(postings_dir)
        postings_all.groupBy("term").agg(
            F.count("*").cast("long").alias("df")
        ).write.mode("overwrite").parquet(stats_dir)
        ckpt.write_marker(
            index_dir, "stats", n_docs=n_docs, total_tokens=total_tokens, avgdl=avgdl
        )

    # ---- stage C: encode compressed posting lists per shard ---------
    done_c = ckpt.done_shards(index_dir, "lists") if resume else set()
    lists_dir = os.path.join(index_dir, LISTS_DIR)
    postings_all = spark.read.parquet(postings_dir).withColumn(
        "shard_id", shard_of(F.col("doc_id"), shard_size)
    )
    if done_c:
        postings_all = postings_all.filter(~F.col("shard_id").isin(sorted(done_c)))
    term_df = spark.read.parquet(stats_dir)
    joined = postings_all.join(term_df, "term")  # AQE broadcasts small stats
    n_docs_b, avgdl_b = float(n_docs), float(avgdl)

    def encode_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        shard_id = int(pdf["shard_id"].iloc[0])
        # per-doc length from in-shard postings (complete by sharding)
        dl = pdf.groupby("doc_id")["tf"].sum()
        dl_of = pdf["doc_id"].map(dl).astype("float64")
        tf = pdf["tf"].astype("float64")
        idf = np.log(1.0 + (n_docs_b - pdf["df"] + 0.5) / (pdf["df"] + 0.5))
        w = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl_of / avgdl_b))
        pdf = pdf.assign(w=w)
        rows = []
        for term, g in pdf.groupby("term", sort=True):
            enc = encode_posting_list(
                g["doc_id"].to_numpy(),
                g["tf"].to_numpy(),
                g["w"].to_numpy(),
                block_size,
            )
            enc["term"] = term
            rows.append(enc)
        out = pd.DataFrame(
            rows,
            columns=[
                "term", "df", "doc_ids_delta_varbyte", "tfs_varbyte", "weights_f64",
                "block_last_id", "block_max_tf", "block_max_w", "block_id_off",
                "block_tf_off",
            ],
        )
        out.insert(0, "shard_id", np.int32(shard_id))
        _write_shard_parquet(out, lists_dir, shard_id)
        secs = time.time() - t0
        n_post = int(out["df"].sum()) if len(out) else 0
        dfs = out["df"].to_numpy() if len(out) else np.array([0])
        skew = float(dfs.max() / max(dfs.mean(), 1e-9)) if len(out) else 0.0
        bytes_ids = int(out["doc_ids_delta_varbyte"].str.len().sum()) if len(out) else 0
        bytes_tfs = int(out["tfs_varbyte"].str.len().sum()) if len(out) else 0
        bytes_w = int(out["weights_f64"].str.len().sum()) if len(out) else 0
        ckpt.write_marker(
            index_dir, "lists", shard_id,
            n_terms=int(len(out)), n_postings=n_post,
            bytes_ids=bytes_ids, bytes_tfs=bytes_tfs, skew_ratio=skew,
        )
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id, "n_terms": len(out), "n_postings": n_post,
                    "bytes_ids": bytes_ids, "bytes_tfs": bytes_tfs,
                    "bytes_weights": bytes_w, "skew_ratio": skew, "encode_sec": secs,
                    "postings_per_sec": (n_post / secs) if secs > 0 else 0.0,
                }
            ]
        )

    c_metrics = []
    if n_docs:
        c_metrics = (
            joined.groupBy("shard_id").applyInPandas(encode_shard, _LISTS_OUT_SCHEMA).collect()
        )

    # ---- metrics + manifest commit ----------------------------------
    metrics_rows = [r.asDict() for r in a_metrics] + [r.asDict() for r in c_metrics]
    if metrics_rows:
        spark.createDataFrame(metrics_rows).write.mode("append").parquet(
            os.path.join(index_dir, METRICS_DIR)
        )
    manifest = {
        "version": 1,
        "n_docs": n_docs,
        "num_shards": num_shards,
        "shard_size": shard_size,
        "avgdl": avgdl,
        "total_tokens": total_tokens,
        "block_size": block_size,
        "built_sec": time.time() - t_start,
        "stages": {
            "postings_shards": sorted(ckpt.done_shards(index_dir, "postings")),
            "lists_shards": sorted(ckpt.done_shards(index_dir, "lists")),
        },
    }
    ckpt.commit_manifest(index_dir, manifest)
    catalog.unpersist()
    return manifest


def load_posting_lists(spark: SparkSession, index_dir: str) -> DataFrame:
    manifest = ckpt.read_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    df = spark.read.parquet(os.path.join(index_dir, LISTS_DIR))
    return df


def load_catalog(spark: SparkSession, index_dir: str) -> DataFrame:
    if ckpt.read_manifest(index_dir) is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    return spark.read.parquet(os.path.join(index_dir, CATALOG_DIR))
