"""Codec roundtrip properties (hypothesis) + block-skip correctness."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_indexer_spark.operators.codec import (
    BLOCK_SIZE,
    decode_block_ids,
    decode_posting_list,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    data, sizes = varbyte_encode(arr)
    assert np.array_equal(varbyte_decode(data, arr.size), arr)
    assert int(sizes.sum()) == len(data)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=1000),
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
        ),
        min_size=1,
        max_size=500,
    )
)
@settings(max_examples=100, deadline=None)
def test_posting_list_roundtrip(postings):
    seen, rows = set(), []
    for d, tf, w in postings:
        if d not in seen:
            seen.add(d)
            rows.append((d, tf, w))
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    ws = np.array([r[2] for r in rows], dtype=np.float64)
    enc = encode_posting_list(ids, tfs, ws)
    di, dt, dw = decode_posting_list(enc)
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(di, ids[order])
    assert np.array_equal(dt, tfs[order])
    assert np.array_equal(dw, ws[order])  # exact float64 roundtrip
    assert enc["df"] == len(rows)


def test_block_meta_and_selective_decode():
    n = 1000
    rng = np.random.default_rng(42)
    ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, size=n).astype(np.int64)
    ws = rng.random(n) * 10
    enc = encode_posting_list(ids, tfs, ws)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_last_id"]) == nblocks
    for bi in range(nblocks):
        s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        assert enc["block_last_id"][bi] == ids[e - 1]
        assert enc["block_max_tf"][bi] == tfs[s:e].max()
        assert enc["block_max_w"][bi] >= ws[s:e].max() - 1e-12
    # skip-decode: only blocks 2 and 5
    got_ids, got_pos = decode_block_ids(enc, np.array([2, 5]))
    exp_ids = np.concatenate([ids[256:384], ids[640:768]])
    exp_pos = np.concatenate([np.arange(256, 384), np.arange(640, 768)])
    assert np.array_equal(got_ids, exp_ids)
    assert np.array_equal(got_pos, exp_pos)
    # positions index the weights array correctly
    assert np.array_equal(ws[got_pos], np.concatenate([ws[256:384], ws[640:768]]))


def test_compression_ratio():
    """Dense sorted ids compress to ~1 byte/posting (gap 3)."""
    ids = np.arange(0, 200_000, 3, dtype=np.int64)
    tfs = np.ones_like(ids)
    ws = np.ones(ids.size)
    enc = encode_posting_list(ids, tfs, ws)
    # every gap fits 7 bits except block restarts (absolute values)
    nblocks = (ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["doc_ids_delta_varbyte"]) <= ids.size + nblocks * 3


def test_bulk_encode_matches_per_term():
    """encode_posting_lists_bulk must be byte-identical to per-term
    encode_posting_list for every field (the shard encoder relies on it)."""
    from text_indexer_spark.operators.codec import encode_posting_lists_bulk

    rng = np.random.default_rng(7)
    terms_list, ids_list, tfs_list, ws_list = [], [], [], []
    for t in ["alpha", "beta", "gamma", "delta", "epsilon_longterm"]:
        n = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
        terms_list.append(np.repeat(t, n))
        ids_list.append(ids)
        tfs_list.append(rng.integers(1, 50, size=n).astype(np.int64))
        ws_list.append(rng.random(n) * 8)
    terms = np.concatenate(terms_list).astype(object)
    ids = np.concatenate(ids_list)
    tfs = np.concatenate(tfs_list)
    ws = np.concatenate(ws_list)

    out = encode_posting_lists_bulk(terms, ids, tfs, ws)
    assert list(out["term"]) == ["alpha", "beta", "gamma", "delta", "epsilon_longterm"]
    for i, (t, tids, ttfs, tws) in enumerate(
        zip(["alpha", "beta", "gamma", "delta", "epsilon_longterm"],
            ids_list, tfs_list, ws_list)
    ):
        exp = encode_posting_list(tids, ttfs, tws)
        row = out.iloc[i]
        assert row["df"] == exp["df"]
        assert bytes(row["doc_ids_delta_varbyte"]) == bytes(exp["doc_ids_delta_varbyte"])
        assert bytes(row["tfs_varbyte"]) == bytes(exp["tfs_varbyte"])
        assert bytes(row["weights_f64"]) == bytes(exp["weights_f64"])
        assert list(row["block_last_id"]) == list(exp["block_last_id"])
        assert list(row["block_max_tf"]) == list(exp["block_max_tf"])
        assert list(row["block_max_w"]) == list(exp["block_max_w"])
        assert list(row["block_id_off"]) == list(exp["block_id_off"])
        assert list(row["block_tf_off"]) == list(exp["block_tf_off"])


def test_bulk_encode_empty():
    from text_indexer_spark.operators.codec import encode_posting_lists_bulk

    out = encode_posting_lists_bulk(
        np.array([], dtype=object), np.array([], dtype=np.int64),
        np.array([], dtype=np.int64), np.array([], dtype=np.float64),
    )
    assert len(out) == 0 and "doc_ids_delta_varbyte" in out.columns
