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

# positional indexes carry the per-posting position payload through the
# merge: per-posting encodings are self-contained, so chunks concatenate
# byte-for-byte exactly like the doc-id stream
MERGED_SCHEMA_POS = (
    MERGED_SCHEMA + ", positions_varbyte binary, block_pos_off array<long>"
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
        BLOCK_SIZE,
        decode_positions,
        decode_posting_list,
        encode_positions_grouped,
        encode_posting_list,
        varbyte_decode,
    )

    has_pos = "positions_varbyte" in posting_lists.columns
    schema = MERGED_SCHEMA_POS if has_pos else MERGED_SCHEMA

    def _reencode(pdf: pd.DataFrame) -> pd.DataFrame:
        ids_all, tf_all, w_all, pos_all = [], [], [], []
        for _, r in pdf.iterrows():
            ids, tfs, w = decode_posting_list(r)
            ids_all.append(ids)
            tf_all.append(tfs)
            w_all.append(w)
            if has_pos:
                pf, po = decode_positions(r["positions_varbyte"], tfs)
                pos_all.append((pf, po))
        ids = np.concatenate(ids_all)
        tfs = np.concatenate(tf_all)
        enc = encode_posting_list(ids, tfs, np.concatenate(w_all))
        enc["term"] = pdf["term"].iloc[0]
        enc["n_chunks"] = 1
        if has_pos:
            # reorder the per-posting position slices by the SAME stable
            # doc-id sort encode_posting_list applies
            order = np.argsort(ids, kind="stable")
            flat = (
                np.concatenate([pf for pf, _ in pos_all])
                if pos_all else np.empty(0, dtype=np.int64)
            )
            offs = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
            n = ids.size
            sorted_tfs = tfs[order]
            seg = np.repeat(np.cumsum(sorted_tfs) - sorted_tfs, sorted_tfs)
            gather = (
                np.repeat(offs[:-1][order], sorted_tfs)
                + (np.arange(int(sorted_tfs.sum())) - seg)
            )
            buf, per = encode_positions_grouped(flat[gather], sorted_tfs)
            csum = np.concatenate([[0], np.cumsum(per)]).astype(np.int64)
            enc["positions_varbyte"] = buf
            enc["block_pos_off"] = [
                int(csum[b]) for b in range(0, n, BLOCK_SIZE)
            ]
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
        ids_parts, tf_parts, w_parts, pos_parts = [], [], [], []
        last_id, max_tf, max_w, id_off, tf_off, pos_off = [], [], [], [], [], []
        id_base = 0
        tf_base = 0
        pos_base = 0
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
            if has_pos:
                pos_b = bytes(r["positions_varbyte"])
                pos_parts.append(pos_b)
                pos_off.extend(pos_base + int(x) for x in r["block_pos_off"])
                pos_base += len(pos_b)
        out = {
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
        }
        if has_pos:
            out["positions_varbyte"] = b"".join(pos_parts)
            out["block_pos_off"] = pos_off
        return pd.DataFrame([out])

    return posting_lists.groupBy("term").applyInPandas(splice, schema)


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


def decode_merged_positions(
    row: dict,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode a merged POSITIONAL term-major row →
    (doc_ids, tfs, positions, offsets). Works for spliced chunks (block
    boundaries at chunk joins) and re-encoded rows alike: per-block
    posting counts come from the id stream, per-block position bytes
    from ``block_pos_off``."""
    from text_indexer_spark.operators.codec import decode_positions, varbyte_decode

    n_blocks = len(row["block_id_off"])
    ids_data = memoryview(row["doc_ids_delta_varbyte"])
    pos_data = memoryview(row["positions_varbyte"])
    tf_data = memoryview(row["tfs_varbyte"])
    ids_out, tfs_out, pos_out = [], [], []
    for b in range(n_blocks):
        start = row["block_id_off"][b]
        end = row["block_id_off"][b + 1] if b + 1 < n_blocks else len(ids_data)
        span = np.frombuffer(ids_data[start:end], dtype=np.uint8)
        cnt = int(((span & 0x80) == 0).sum())
        gaps = varbyte_decode(ids_data[start:], cnt)
        ids_out.append(np.cumsum(gaps, dtype=np.uint64))
        tfs_b = varbyte_decode(tf_data[row["block_tf_off"][b]:], cnt).astype(np.int64)
        tfs_out.append(tfs_b)
        pf, _ = decode_positions(pos_data[row["block_pos_off"][b]:], tfs_b)
        pos_out.append(pf)
    ids = np.concatenate(ids_out).astype(np.int64) if ids_out else np.empty(0, np.int64)
    tfs = np.concatenate(tfs_out) if tfs_out else np.empty(0, np.int64)
    pos = np.concatenate(pos_out) if pos_out else np.empty(0, np.int64)
    offsets = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
    return ids, tfs, pos, offsets
