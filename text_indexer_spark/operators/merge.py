"""Salted two-phase merge: per-shard posting lists → global term-major
posting lists.

The north rule calls for per-partition sorted posting lists "merged via
salted repartitioning (explicit skew handling for stop-word-like hot
terms)". In this engine the SALT IS THE DOC-RANGE SHARD:

* phase 1 (= build stage C) groups by (term, shard) — a stop-word term's
  postings are split across all shards, so no reducer ever materializes
  a whole hot list;
* phase 2 (this module) groups by term and CONCATENATES the pre-encoded
  shard chunks in shard order. Because shards are disjoint, ascending
  doc-id ranges, the concatenation of sorted chunks is already globally
  sorted — the merge moves only compressed bytes and never re-encodes a
  posting. The shuffle row count for the hottest term is num_shards
  rows, not df rows: the skew is structurally capped.

The only fix-up needed is at chunk boundaries: each chunk's first block
stores its first doc id absolutely (block-restart encoding), so chunks
splice losslessly; block metadata offsets are shifted by the preceding
chunks' byte lengths.

Term-major layout serves workloads that want whole posting lists per
term (index shipping, term statistics export, boolean set algebra on
full lists); the sharded layout remains the one the doc-at-a-time WAND
query path uses.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGED_SCHEMA = (
    "term string, df long, n_chunks int, doc_ids_delta_varbyte binary, "
    "tfs_varbyte binary, weights_f64 binary, block_last_id array<long>, "
    "block_max_tf array<long>, block_max_w array<double>, "
    "block_id_off array<long>, block_tf_off array<long>"
)


def merge_term_major(posting_lists: DataFrame) -> DataFrame:
    """Sharded posting lists → one row per term (global list).

    One shuffle keyed by term, carrying already-compressed chunks
    (num_shards rows per term, each ~KBs) — this IS the salted merge:
    phase-1 salt = shard, phase-2 concat. applyInPandas per term splices
    chunks without decoding.

    Chunk order: a freshly built index guarantees shard order == doc-id
    order, but a SYNCED index does not — ``index_sync`` mints added-doc
    ids above the global max regardless of which shard they land in. So
    chunks are ordered by their actual first doc id (one varbyte decode
    per chunk, the block-restart value), the doc-id ranges are checked
    for monotonicity, and only a term whose chunk ranges genuinely
    overlap pays a decode → merge-sort → re-encode; disjoint-range terms
    (all of a fresh build, most of a synced one) still splice pure
    bytes.
    """
    from text_indexer_spark.operators.codec import (
        decode_posting_list,
        encode_posting_list,
        varbyte_decode,
    )

    def _reencode(pdf: pd.DataFrame) -> pd.DataFrame:
        ids_all, tf_all, w_all = [], [], []
        for _, r in pdf.iterrows():
            ids, tfs, w = decode_posting_list(r)
            ids_all.append(ids)
            tf_all.append(tfs)
            w_all.append(w)
        ids = np.concatenate(ids_all)
        enc = encode_posting_list(
            ids, np.concatenate(tf_all), np.concatenate(w_all)
        )
        enc["term"] = pdf["term"].iloc[0]
        enc["n_chunks"] = 1
        return pd.DataFrame([enc])

    def splice(pdf: pd.DataFrame) -> pd.DataFrame:
        first_ids = [
            int(varbyte_decode(memoryview(bytes(b)), 1)[0]) if len(b) else -1
            for b in pdf["doc_ids_delta_varbyte"]
        ]
        pdf = (
            pdf.assign(_first_id=first_ids)
            .sort_values("_first_id")
            .drop(columns=["_first_id"])
        )
        last_ids = [
            int(r[-1]) if len(r) else -1 for r in pdf["block_last_id"]
        ]
        firsts_sorted = sorted(first_ids)
        if any(
            firsts_sorted[i + 1] <= last_ids[i]
            for i in range(len(last_ids) - 1)
        ):
            return _reencode(pdf)  # interleaved ranges (synced index)
        ids_parts, tf_parts, w_parts = [], [], []
        last_id, max_tf, max_w, id_off, tf_off = [], [], [], [], []
        id_base = 0
        tf_base = 0
        df_total = 0
        for _, r in pdf.iterrows():
            ids_b = bytes(r["doc_ids_delta_varbyte"])
            tfs_b = bytes(r["tfs_varbyte"])
            ids_parts.append(ids_b)
            tf_parts.append(tfs_b)
            w_parts.append(bytes(r["weights_f64"]))
            last_id.extend(int(x) for x in r["block_last_id"])
            max_tf.extend(int(x) for x in r["block_max_tf"])
            max_w.extend(float(x) for x in r["block_max_w"])
            id_off.extend(id_base + int(x) for x in r["block_id_off"])
            tf_off.extend(tf_base + int(x) for x in r["block_tf_off"])
            id_base += len(ids_b)
            tf_base += len(tfs_b)
            df_total += int(r["df"])
        return pd.DataFrame(
            [{
                "term": pdf["term"].iloc[0],
                "df": df_total,
                "n_chunks": len(pdf),
                "doc_ids_delta_varbyte": b"".join(ids_parts),
                "tfs_varbyte": b"".join(tf_parts),
                "weights_f64": b"".join(w_parts),
                "block_last_id": last_id,
                "block_max_tf": max_tf,
                "block_max_w": max_w,
                "block_id_off": id_off,
                "block_tf_off": tf_off,
            }]
        )

    return posting_lists.groupBy("term").applyInPandas(splice, MERGED_SCHEMA)


def decode_merged(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a merged term-major row → (doc_ids, tfs, weights).

    Blocks are decoded via their stored byte offsets; a merged list's
    blocks may be shorter than BLOCK_SIZE at chunk boundaries, so block
    lengths are derived from consecutive offsets, not assumed."""
    from text_indexer_spark.operators.codec import varbyte_decode

    n_blocks = len(row["block_id_off"])
    ids_data = memoryview(row["doc_ids_delta_varbyte"])
    tf_data = memoryview(row["tfs_varbyte"])
    w = np.frombuffer(row["weights_f64"], dtype=np.float64)
    n = int(row["df"])

    # per-block posting counts: decode greedily block by block using the
    # byte spans between offsets
    ids_out, tfs_out = [], []
    consumed = 0
    for b in range(n_blocks):
        start = row["block_id_off"][b]
        end = row["block_id_off"][b + 1] if b + 1 < n_blocks else len(ids_data)
        # count of values in the span = number of terminator bytes
        span = np.frombuffer(ids_data[start:end], dtype=np.uint8)
        cnt = int(((span & 0x80) == 0).sum())
        gaps = varbyte_decode(ids_data[start:], cnt)
        ids_out.append(np.cumsum(gaps, dtype=np.uint64))
        t_start = row["block_tf_off"][b]
        tfs_out.append(varbyte_decode(tf_data[t_start:], cnt))
        consumed += cnt
    assert consumed == n, (consumed, n)
    return (
        np.concatenate(ids_out).astype(np.int64),
        np.concatenate(tfs_out).astype(np.int64),
        w,
    )


def term_major_stats(merged: DataFrame) -> DataFrame:
    """Per-term compressed-size accounting over the merged layout —
    bytes per posting is the storage-efficiency metric at 100 TB."""
    return merged.select(
        "term",
        "df",
        "n_chunks",
        F.octet_length("doc_ids_delta_varbyte").alias("bytes_ids"),
        F.octet_length("tfs_varbyte").alias("bytes_tfs"),
        (
            (F.octet_length("doc_ids_delta_varbyte") + F.octet_length("tfs_varbyte"))
            / F.col("df")
        ).alias("bytes_per_posting"),
    )
