"""Incremental IVF vector-store maintenance (operators/vecstore.py):
upsert/delete/compact/vacuum over the committed cid-partitioned layout,
resolved-view correctness vs brute force over the LOGICAL corpus, CAS
single-writer guard, and pruning survival through maintenance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_indexer_spark import storage
from text_indexer_spark.operators.similarity import (
    cosine_topk,
    ivf_ingest,
    ivf_topk_indexed,
    ivf_topk_indexed_int8,
)
from text_indexer_spark.operators.vecstore import (
    ivf_compact,
    ivf_upsert,
    ivf_vacuum,
    resolved_vectors,
)

DIM = 8
N = 80


def _mk(spark, ids, seed_shift=0):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, DIM))
    all_vecs = {
        i: centers[i % 4] + 0.2 * rng.normal(size=DIM) for i in range(N + 40)
    }
    rows = [
        (i, [float(x + seed_shift) for x in all_vecs[i]]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture()
def store(spark, tmp_path):
    """Base ingest: ids 0..59, where ids ≡2 (mod 4) carry a STALE
    embedding (shifted) that a later upsert must replace."""
    fresh = _mk(spark, [i for i in range(60) if i % 4 != 2])
    stale = _mk(spark, [i for i in range(60) if i % 4 == 2], seed_shift=3.0)
    idx = str(tmp_path / "ivf")
    ivf_ingest(fresh.unionByName(stale), idx, DIM, n_centroids=4)
    return idx


def _logical(spark):
    """The corpus the store must serve after the test's change sets:
    ids 0..79, true embeddings, minus deletes {7, 21, 35}."""
    return _mk(spark, [i for i in range(80) if i not in (7, 21, 35)])


def _apply_changes(spark, idx):
    # v2: replace the stale vectors + insert 60..79
    ups = _mk(spark, [i for i in range(60) if i % 4 == 2] + list(range(60, 80)))
    v2 = ivf_upsert(spark, idx, ups)
    # v3: delete-only change set
    dels = spark.createDataFrame([(7,), (21,), (35,)], "vec_id long")
    v3 = ivf_upsert(spark, idx, None, dels)
    return v2, v3


def test_upsert_resolved_view_equals_logical_corpus(spark, store):
    v2, v3 = _apply_changes(spark, store)
    assert (v2, v3) == (2, 3)
    live = resolved_vectors(spark, store).select("vec_id", "embedding")
    exp = {r["vec_id"]: list(r["embedding"]) for r in _logical(spark).collect()}
    got = {r["vec_id"]: list(r["embedding"]) for r in live.collect()}
    assert got == exp  # one row per id, replaced not duplicated, deletes gone


def test_upsert_store_serves_brute_force_at_full_probe(spark, store):
    _apply_changes(spark, store)
    logical = _logical(spark)
    queries = logical.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = ivf_topk_indexed(spark, store, queries, k=5, n_probe=4)
    exp = cosine_topk(logical, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_pruning_survives_maintenance(spark, store):
    from text_indexer_spark.plans.checks import has_partition_filter

    _apply_changes(spark, store)
    queries = _mk(spark, [0]).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = ivf_topk_indexed(spark, store, queries, k=5, n_probe=2)
    # every segment scan carries the probe cid partition filter
    assert has_partition_filter(got, "cid")


def test_compact_folds_chain_and_preserves_results(spark, store):
    _apply_changes(spark, store)
    queries = _mk(spark, [0, 1]).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    before = sorted(
        map(tuple, ivf_topk_indexed(spark, store, queries, k=5, n_probe=4).collect())
    )
    v = ivf_compact(spark, store)
    assert v == 4
    m = storage.read_json(storage.join(store, "manifest_v000004.json"))
    assert list(m["segments"].keys()) == ["seg_000004"]
    assert m["tombstones"] == {}
    after = sorted(
        map(tuple, ivf_topk_indexed(spark, store, queries, k=5, n_probe=4).collect())
    )
    assert after == before
    # vacuum: everything the kept (compacted) manifest no longer
    # references goes; the live base survives
    removed = ivf_vacuum(store, keep_versions=1)
    assert "seg_000002" in removed and "ts_000002" in removed
    assert "ts_000003" in removed
    assert storage.exists(storage.join(store, "seg_000004"))
    again = sorted(
        map(tuple, ivf_topk_indexed(spark, store, queries, k=5, n_probe=4).collect())
    )
    assert again == before
    assert ivf_vacuum(store, keep_versions=1) == []  # idempotent


def test_compact_retrain_reassigns_and_preserves_full_probe(spark, store):
    _apply_changes(spark, store)
    logical = _logical(spark)
    queries = logical.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ivf_compact(spark, store, retrain=True)
    got = ivf_topk_indexed(spark, store, queries, k=5, n_probe=4)
    exp = cosine_topk(logical, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_quantized_store_upsert_serves_int8_path(spark, tmp_path):
    idx = str(tmp_path / "ivf8")
    base = _mk(spark, list(range(40)))
    ivf_ingest(base, idx, DIM, n_centroids=4, quantize=True)
    ups = _mk(spark, list(range(40, 56)))
    ivf_upsert(spark, idx, ups)
    # delta segment carries the int8 columns (mixed stores are invalid)
    seg = spark.read.parquet(storage.join(idx, "seg_000002"))
    assert {"qvec", "scale"} <= set(seg.columns)
    logical = _mk(spark, list(range(56)))
    queries = logical.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = ivf_topk_indexed_int8(spark, idx, queries, k=5, n_probe=4)
    exp = cosine_topk(logical, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    # retraining compaction on a QUANTIZED store: qvec/scale quantize
    # the vector itself (centroid-independent), so they survive the
    # reassignment and the int8 bound path still serves exactly
    ivf_compact(spark, idx, retrain=True)
    got2 = ivf_topk_indexed_int8(spark, idx, queries, k=5, n_probe=4)
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, exp.collect()))


def test_upsert_contracts(spark, store):
    dup = _mk(spark, [3]).unionByName(_mk(spark, [3]))
    with pytest.raises(ValueError, match="duplicate"):
        ivf_upsert(spark, store, dup)
    ups = _mk(spark, [3])
    dels = spark.createDataFrame([(3,)], "vec_id long")
    with pytest.raises(ValueError, match="both upserts and delete_ids"):
        ivf_upsert(spark, store, ups, dels)


def test_concurrent_commit_raises(spark, store):
    from text_indexer_spark.storage import ConcurrentCommitError

    ivf_upsert(spark, store, _mk(spark, [70]))
    # a second writer that read the store BEFORE that commit: simulate
    # by rolling the pointer forward underneath a fresh upsert's read
    ptr = storage.join(store, "LATEST")
    storage.write_bytes_atomic(ptr, b"9")
    storage.write_json_atomic(
        storage.join(store, "manifest_v000009.json"),
        {"segments": {"vectors": 1}, "tombstones": {}},
    )
    storage.write_bytes_atomic(ptr, b"2")
    # upsert reads v2, computes v3; move the pointer before its swap is
    # not interceptable here — instead verify swap_latest's guard via a
    # manifest/pointer mismatch: pointer says 2, writer expected 2 → ok;
    # so assert the guard directly
    with pytest.raises(ConcurrentCommitError):
        storage.swap_latest(store, 5, 6)


def test_legacy_layout_reads_unchanged(spark, tmp_path):
    """A never-upserted ivf_ingest store resolves to the plain base
    scan — no LATEST, no manifest required, no tombstone join."""
    idx = str(tmp_path / "legacy")
    base = _mk(spark, list(range(20)))
    ivf_ingest(base, idx, DIM, n_centroids=4)
    assert not storage.exists(storage.join(idx, "LATEST"))
    live = resolved_vectors(spark, idx)
    assert live.count() == 20
    assert "Join" not in live._jdf.queryExecution().executedPlan().toString()


def test_retrain_quantizer_is_versioned_and_crash_safe(spark, store, monkeypatch):
    """A retraining compaction must never leave probes using a
    quantizer the committed rows were not assigned with: the new
    centroids go to a VERSIONED file referenced by the manifest
    (bootstrap centroids.json immutable), committed by the same atomic
    swap as the segment — a crash before the swap leaves the old
    version serving exactly as before."""
    import text_indexer_spark.operators.vecstore as vs

    _apply_changes(spark, store)
    boot = storage.read_json(storage.join(store, "centroids.json"))
    queries = _mk(spark, [0, 1]).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    before = sorted(
        map(tuple, ivf_topk_indexed(spark, store, queries, k=5, n_probe=4).collect())
    )

    # crash window: everything written, LATEST swap never happens
    real_commit = vs._commit
    def boom(*a, **k):
        raise RuntimeError("crash before pointer swap")
    monkeypatch.setattr(vs, "_commit", boom)
    with pytest.raises(RuntimeError, match="crash before pointer swap"):
        ivf_compact(spark, store, retrain=True)
    monkeypatch.setattr(vs, "_commit", real_commit)

    # old version intact: bootstrap untouched, reader resolves the OLD
    # quantizer, served rows unchanged; the orphan centroids_v/seg_ are
    # above the pointer (never vacuumed, overwritten by the retry)
    assert storage.read_json(storage.join(store, "centroids.json")) == boot
    assert vs.current_centroids(store)["centroids"] == boot["centroids"]
    mid = sorted(
        map(tuple, ivf_topk_indexed(spark, store, queries, k=5, n_probe=4).collect())
    )
    assert mid == before

    # retry succeeds; manifest references the versioned quantizer and
    # the bootstrap file still holds the ORIGINAL ingest-time centroids
    v = ivf_compact(spark, store, retrain=True)
    m = storage.read_json(storage.join(store, f"manifest_v{v:06d}.json"))
    assert m["centroids_file"] == f"centroids_v{v:06d}.json"
    assert storage.read_json(storage.join(store, "centroids.json")) == boot
    assert (
        vs.current_centroids(store)["centroids"]
        != boot["centroids"]
    )
    after = sorted(
        map(tuple, ivf_topk_indexed(spark, store, queries, k=5, n_probe=4).collect())
    )
    assert after == before  # full probe: geometry changes nothing

    # a later upsert + plain compact carry the versioned quantizer
    # forward; vacuum keeps the referenced file, sweeps nothing above
    # the pointer, and drops it only once unreferenced
    cfile = m["centroids_file"]
    ivf_upsert(spark, store, _mk(spark, [90]))
    m2 = storage.read_json(
        storage.join(store, f"manifest_v{v + 1:06d}.json")
    )
    assert m2["centroids_file"] == cfile
    ivf_compact(spark, store)
    assert storage.read_json(
        storage.join(store, f"manifest_v{v + 2:06d}.json")
    )["centroids_file"] == cfile
    removed = ivf_vacuum(store, keep_versions=1)
    assert cfile not in removed
    assert storage.exists(storage.join(store, cfile))
    v2 = ivf_compact(spark, store, retrain=True)  # supersedes cfile
    removed = ivf_vacuum(store, keep_versions=1)
    assert cfile in removed
    assert storage.exists(
        storage.join(store, f"centroids_v{v2:06d}.json")
    )


def test_ivf_stats_reports_chain_and_balance(spark, store):
    from text_indexer_spark.operators.vecstore import ivf_stats

    _apply_changes(spark, store)
    s = ivf_stats(spark, store)
    assert s["version"] == 3
    assert s["n_segments"] == 2  # base + the v2 delta (v3 was delete-only)
    assert s["n_tombstone_lists"] == 2
    assert s["n_live"] == 77  # 80 logical ids minus 3 deletes
    # v2 tombstoned its 35 upserted ids (15 replacements ≡2 mod 4 in
    # 0..59 + 20 inserts 60..79); v3 added the 3 deletes
    assert s["n_tombstoned"] == 38
    assert s["n_cells"] >= 1 and sum(s["cell_sizes"].values()) == 77
    assert s["imbalance"] >= 1.0
    assert s["quantized"] is False
    v = ivf_compact(spark, store)
    s2 = ivf_stats(spark, store)
    assert (s2["version"], s2["n_segments"], s2["n_tombstone_lists"]) == (v, 1, 0)
    assert s2["n_live"] == 77 and s2["n_tombstoned"] == 0
