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


def encode_posting_lists_bulk(
    terms: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    weights: np.ndarray,
    block_size: int = BLOCK_SIZE,
    pos_bytes: np.ndarray | None = None,
) -> "pd.DataFrame":
    """Encode EVERY term of a shard in one vectorized pass.

    Input arrays must be GROUPED by term (all rows of a term adjacent)
    with doc_ids ascending within each group — any (term, doc_id) sort
    satisfies this. Produces rows byte-identical to per-term
    :func:`encode_posting_list` (asserted in tests), but the delta-gap/
    varbyte/block-max work is done over the whole shard at once — the
    per-term Python work shrinks to slicing the shared buffers, which is
    what makes stage C throughput-bound instead of interpreter-bound at
    10^12 postings.
    """
    import pandas as pd

    cols = [
        "term", "df", "doc_ids_delta_varbyte", "tfs_varbyte", "weights_f64",
        "block_last_id", "block_max_tf", "block_max_w", "block_id_off",
        "block_tf_off",
    ]
    if pos_bytes is not None:
        cols += ["positions_varbyte", "block_pos_off"]
    n = len(terms)
    if n == 0:
        return pd.DataFrame(columns=cols)
    ids = np.asarray(doc_ids, dtype=np.uint64)
    tf = np.asarray(tfs, dtype=np.uint64)
    w = np.asarray(weights, dtype=np.float64)

    # term run boundaries: change-point scan, no re-sort of the strings
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(terms[1:], terms[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    uniq = np.asarray(terms, dtype=object)[starts]
    ends = np.append(starts[1:], n)

    # global gaps with absolute restarts at every per-term block boundary
    term_start_of = np.repeat(starts, ends - starts)
    rel = np.arange(n, dtype=np.int64) - term_start_of
    restart = (rel % block_size) == 0
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[restart] = ids[restart]

    id_buf, id_sizes = varbyte_encode(gaps)
    tf_buf, tf_sizes = varbyte_encode(tf)
    id_csum = np.concatenate([[0], np.cumsum(id_sizes)])
    tf_csum = np.concatenate([[0], np.cumsum(tf_sizes)])

    # per-block metadata over the whole shard (blocks never cross terms
    # because every term start is a restart)
    bstart = np.flatnonzero(restart)
    bend = np.append(bstart[1:], n)
    blk_last = ids[bend - 1].astype(np.int64)
    blk_max_tf = np.maximum.reduceat(tf, bstart).astype(np.int64)
    blk_max_w = np.maximum.reduceat(w, bstart)
    blk_term_start = term_start_of[bstart]
    blk_id_off = (id_csum[bstart] - id_csum[blk_term_start]).astype(np.int64)
    blk_tf_off = (tf_csum[bstart] - tf_csum[blk_term_start]).astype(np.int64)
    first_blk = np.searchsorted(bstart, starts)
    last_blk = np.append(first_blk[1:], len(bstart))

    id_mv, tf_mv = memoryview(id_buf), memoryview(tf_buf)
    w_bytes_all = w.tobytes()
    rows = {
        "term": uniq,
        "df": (ends - starts).astype(np.int64),
        "doc_ids_delta_varbyte": [
            bytes(id_mv[id_csum[s]:id_csum[e]]) for s, e in zip(starts, ends)
        ],
        "tfs_varbyte": [
            bytes(tf_mv[tf_csum[s]:tf_csum[e]]) for s, e in zip(starts, ends)
        ],
        "weights_f64": [w_bytes_all[8 * s:8 * e] for s, e in zip(starts, ends)],
        "block_last_id": [blk_last[a:b].tolist() for a, b in zip(first_blk, last_blk)],
        "block_max_tf": [blk_max_tf[a:b].tolist() for a, b in zip(first_blk, last_blk)],
        "block_max_w": [blk_max_w[a:b].tolist() for a, b in zip(first_blk, last_blk)],
        "block_id_off": [blk_id_off[a:b].tolist() for a, b in zip(first_blk, last_blk)],
        "block_tf_off": [blk_tf_off[a:b].tolist() for a, b in zip(first_blk, last_blk)],
    }
    if pos_bytes is not None:
        # per-posting self-contained encodings: a term's positional
        # payload is the pure byte concat of its postings' slices, and
        # a block's skip offset is the cumulative byte count at the
        # block's first posting (relative to the term start)
        plens = np.fromiter((len(b) for b in pos_bytes), dtype=np.int64, count=n)
        p_csum = np.concatenate([[0], np.cumsum(plens)])
        blk_pos_off = (p_csum[bstart] - p_csum[blk_term_start]).astype(np.int64)
        joined = b"".join(pos_bytes)
        p_mv = memoryview(joined)
        rows["positions_varbyte"] = [
            bytes(p_mv[p_csum[s]:p_csum[e]]) for s, e in zip(starts, ends)
        ]
        rows["block_pos_off"] = [
            blk_pos_off[a:b].tolist() for a, b in zip(first_blk, last_blk)
        ]
    return pd.DataFrame(rows, columns=cols)


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


# ---------------------------------------------------------------------
# Positional payload (phrase / proximity queries over the committed
# index). Token positions per posting, delta-encoded WITHIN the posting
# (first position absolute, then gaps) and varbyte-packed. Because each
# posting's encoding is self-contained, per-posting byte slices
# concatenate losslessly — shard chunks splice in the term-major merge
# exactly like the doc-id stream, and block-granular skip reads work
# from a byte offset per block (cumulative position-bytes at each
# block's first posting).
# ---------------------------------------------------------------------

def encode_positions_grouped(
    positions: np.ndarray, tfs: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Flattened per-posting position lists → (bytes, bytes-per-posting).

    ``positions``: ascending within each posting, concatenated in
    posting order; ``tfs``: the posting lengths (Σ tfs == len). Delta
    restart at every posting boundary, one vectorized varbyte pass.
    """
    pos = np.asarray(positions, dtype=np.uint64)
    tf = np.asarray(tfs, dtype=np.int64)
    n = pos.size
    if n == 0:
        return b"", np.zeros(tf.size, dtype=np.int64)
    gaps = np.empty_like(pos)
    gaps[0] = pos[0]
    np.subtract(pos[1:], pos[:-1], out=gaps[1:])
    starts = np.concatenate([[0], np.cumsum(tf)[:-1]]).astype(np.int64)
    gaps[starts] = pos[starts]
    buf, sizes = varbyte_encode(gaps)
    csum = np.concatenate([[0], np.cumsum(sizes)])
    per_posting = (csum[np.cumsum(tf)] - csum[starts]).astype(np.int64)
    return buf, per_posting


def decode_positions(
    data: bytes | memoryview, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_positions_grouped`.

    Returns (positions, offsets): flattened absolute positions plus the
    per-posting start offsets (len = len(tfs) + 1), so posting i's
    positions are ``positions[offsets[i]:offsets[i+1]]``.
    """
    tf = np.asarray(tfs, dtype=np.int64)
    total = int(tf.sum())
    offsets = np.concatenate([[0], np.cumsum(tf)]).astype(np.int64)
    if total == 0:
        return np.empty(0, dtype=np.int64), offsets
    gaps = varbyte_decode(data, total).astype(np.int64)
    csum = np.cumsum(gaps)
    starts = offsets[:-1][tf > 0]
    # subtract each posting's carried-in prefix so restarts are absolute
    carry = np.zeros(total, dtype=np.int64)
    carry[starts] = csum[starts] - gaps[starts]
    # per-element carry: repeat each posting's carry across its run
    runs = np.repeat(carry[starts], tf[tf > 0])
    return csum - runs, offsets


def decode_posting_positions(
    row: dict, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full positional decode of one encoded list row →
    (doc_ids, positions, offsets): posting i (doc ``doc_ids[i]``) holds
    ``positions[offsets[i]:offsets[i+1]]``.
    """
    ids, tfs, _ = decode_posting_list(row, block_size)
    pos, offsets = decode_positions(row["positions_varbyte"], tfs)
    return ids, pos, offsets
