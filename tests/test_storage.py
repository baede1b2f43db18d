"""Storage abstraction: local default byte-identical to the old direct
os calls; URI resolution; non-hardlink fallback path."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_indexer_spark import storage


def test_json_roundtrip_plain_and_uri(tmp_path):
    p = str(tmp_path / "a" / "m.json")
    storage.makedirs(str(tmp_path / "a"))
    storage.write_json_atomic(p, {"x": 1, "y": [1, 2]})
    assert storage.read_json(p) == {"x": 1, "y": [1, 2]}
    # same file via file:// URI resolution (pyarrow.fs.from_uri path)
    assert storage.read_json("file://" + p) == {"x": 1, "y": [1, 2]}
    storage.write_json_atomic("file://" + str(tmp_path / "a" / "u.json"), {"z": 3})
    with open(tmp_path / "a" / "u.json") as f:
        assert json.load(f) == {"z": 3}


def test_atomic_write_leaves_no_tmp(tmp_path):
    p = str(tmp_path / "f.bin")
    storage.write_bytes_atomic(p, b"abc")
    assert storage.read_bytes(p) == b"abc"
    assert [n for n in os.listdir(tmp_path) if ".tmp." in n] == []


def test_exists_listdir_missing(tmp_path):
    assert storage.read_json(str(tmp_path / "nope.json")) is None
    assert storage.listdir(str(tmp_path / "nodir")) == []
    assert not storage.exists(str(tmp_path / "nope"))
    storage.write_bytes_atomic(str(tmp_path / "one"), b"1")
    assert storage.listdir(str(tmp_path)) == ["one"]
    assert storage.isdir(str(tmp_path)) and not storage.isdir(str(tmp_path / "one"))


def test_parquet_atomic_roundtrip(tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = str(tmp_path / "t.parquet")
    storage.write_parquet_atomic(t, p, row_group_size=3)
    got = pq.read_table(p)
    assert got.equals(t)
    assert got.num_rows == 3


def test_link_or_copy_hardlink_and_idempotent(tmp_path):
    src = str(tmp_path / "src.bin")
    dst = str(tmp_path / "sub" / "dst.bin")
    storage.write_bytes_atomic(src, b"shard bytes")
    storage.link_or_copy(src, dst)
    assert os.stat(src).st_ino == os.stat(dst).st_ino  # real hard link
    storage.link_or_copy(src, dst)  # idempotent re-run
    assert storage.read_bytes(dst) == b"shard bytes"


def test_link_or_copy_fallback_when_links_unsupported(tmp_path, monkeypatch):
    """EXDEV / no-link filesystems degrade to a stream copy."""
    src = str(tmp_path / "src.bin")
    dst = str(tmp_path / "dst.bin")
    storage.write_bytes_atomic(src, b"payload" * 1000)

    def no_link(*a, **k):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(os, "link", no_link)
    storage.link_or_copy(src, dst)
    assert storage.read_bytes(dst) == b"payload" * 1000
    assert os.stat(src).st_ino != os.stat(dst).st_ino


def test_checkpoint_through_storage(tmp_path):
    """checkpoint.py routed through storage keeps its contract."""
    from text_indexer_spark import checkpoint as ckpt

    d = str(tmp_path / "idx")
    ckpt.write_marker(d, "postings", 3, n_docs=7)
    ckpt.write_marker(d, "postings", 11, n_docs=9)
    ckpt.write_marker(d, "stats", n_docs=16)
    assert ckpt.done_shards(d, "postings") == {3, 11}
    assert ckpt.read_marker(d, "postings", 3)["n_docs"] == 7
    assert ckpt.read_marker(d, "postings", 4) is None
    ckpt.write_boundaries(d, 4, ["a", "b", "c"])
    assert ckpt.read_boundaries(d) == (4, ["a", "b", "c"])
    ckpt.commit_manifest(d, {"version": 1})
    assert ckpt.read_manifest(d) == {"version": 1}
