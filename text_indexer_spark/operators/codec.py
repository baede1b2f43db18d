"""Posting-list codec: block-restart delta-gap + varbyte doc-ids,
varbyte tfs, exact float64 weights, block-max metadata with byte
offsets. Pure numpy — runs inside applyInPandas executors on Arrow
batches; varbyte packing is vectorized via byte-slot masks (no Python
per-element loops).

The reference keeps raw ``MutableSet<Int>`` posting sets in heap memory
(``Index.kt:9``); at 10^12-doc scale posting lists must be compressed
AND skippable. Encoding per (term, doc_shard), blocks of 128 postings:

* doc-ids: per block the first id is absolute, the rest are gaps —
  varbyte 7-bit little-endian groups, MSB = continuation. Block restarts
  + per-block byte offsets make single-block decode possible, so the
  query path skips blocks that cannot contain intersection candidates.
* tfs: varbyte, same block offsets scheme.
* weights: exact BM25 per-posting weights, float64 — the compressed
  query path must reproduce the uncompressed scorer bit-for-bit (a
  production index would quantize to 8 bits; exactness is a correctness
  requirement here: rank-identical scores). Addressed by position, no
  offsets needed.
* per-block metadata: last doc id (skip pointer), max tf, max weight
  (block-max bound for WAND-style pruning).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varbyte encode; returns (bytes, per-value byte counts)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = v.copy()
    for slot in range(int(nbytes.max())):
        mask = nbytes > slot
        if not mask.any():
            break
        idx = starts[mask] + slot
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = nbytes[mask] == slot + 1
        byte = np.where(is_last, byte, byte | np.uint8(0x80))
        out[idx] = byte
        rem[mask] >>= np.uint64(7)
    return out.tobytes(), nbytes


def varbyte_decode(data: bytes | memoryview, n: int) -> np.ndarray:
    """Decode ``n`` values from the head of ``data``; vectorized."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    # stop after the n-th terminated value (data may hold later blocks)
    ends = np.flatnonzero(is_last)
    raw = raw[: ends[n - 1] + 1]
    is_last = is_last[: raw.size]
    vidx = np.zeros(raw.shape, dtype=np.int64)
    vidx[1:] = np.cumsum(is_last[:-1])
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    bpos = np.arange(raw.size, dtype=np.int64) - starts[vidx]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(
        vals,
        vidx,
        (raw & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * bpos.astype(np.uint64)),
    )
    return vals


def block_restart_deltas(sorted_ids: np.ndarray, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Gaps with an absolute restart at every block boundary."""
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    restarts = np.arange(0, ids.size, block_size)
    gaps[restarts] = ids[restarts]
    return gaps


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    weights: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Sorted-unique doc_ids (+ tfs, weights) → encoded row fields."""
    order = np.argsort(doc_ids, kind="stable")
    ids = np.asarray(doc_ids, dtype=np.uint64)[order]
    tf = np.asarray(tfs, dtype=np.uint64)[order]
    w = np.asarray(weights, dtype=np.float64)[order]
    n = ids.size

    id_bytes, id_sizes = varbyte_encode(block_restart_deltas(ids, block_size))
    tf_bytes, tf_sizes = varbyte_encode(tf)

    starts = np.arange(0, n, block_size)
    ends = np.minimum(starts + block_size, n)
    id_csum = np.concatenate([[0], np.cumsum(id_sizes)])
    tf_csum = np.concatenate([[0], np.cumsum(tf_sizes)])
    return {
        "df": int(n),
        "doc_ids_delta_varbyte": id_bytes,
        "tfs_varbyte": tf_bytes,
        "weights_f64": w.tobytes(),
        "block_last_id": [int(ids[e - 1]) for e in ends],
        "block_max_tf": [int(tf[s:e].max()) for s, e in zip(starts, ends)],
        "block_max_w": [float(w[s:e].max()) for s, e in zip(starts, ends)],
        "block_id_off": [int(id_csum[s]) for s in starts],
        "block_tf_off": [int(tf_csum[s]) for s in starts],
    }


def decode_block_ids(
    row: dict, block_idx: np.ndarray, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the selected blocks' doc ids.

    Returns (doc_ids, global_positions): positions index into the
    logical posting list (and thus the weights array) — this is the
    skip-read the block offsets exist for.
    """
    n = int(row["df"])
    offs = row["block_id_off"]
    data = memoryview(row["doc_ids_delta_varbyte"])
    ids_out, pos_out = [], []
    for b in np.asarray(block_idx, dtype=np.int64):
        s = int(b) * block_size
        cnt = min(block_size, n - s)
        gaps = varbyte_decode(data[offs[int(b)]:], cnt)
        ids_out.append(np.cumsum(gaps, dtype=np.uint64))
        pos_out.append(np.arange(s, s + cnt, dtype=np.int64))
    if not ids_out:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return (
        np.concatenate(ids_out).astype(np.int64),
        np.concatenate(pos_out),
    )


def decode_posting_list(row: dict, block_size: int = BLOCK_SIZE) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode → (doc_ids, tfs, weights)."""
    n = int(row["df"])
    nblocks = (n + block_size - 1) // block_size
    ids, _ = decode_block_ids(row, np.arange(nblocks), block_size)
    tfs = varbyte_decode(row["tfs_varbyte"], n).astype(np.int64)
    w = np.frombuffer(row["weights_f64"], dtype=np.float64)
    return ids, tfs, w
