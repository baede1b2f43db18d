"""Committed trigram index: segments + tombstones + compaction
(operators/trigram.py, the LSM section)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.highlight import regex_grep
from text_indexer_spark.operators.trigram import (
    grep_trigram,
    read_committed_trigrams,
    trigram_commit,
    trigram_compact,
    trigram_postings,
)


@pytest.fixture
def tri_dir():
    d = tempfile.mkdtemp(prefix="tri_sync_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rel(df):
    return sorted((r["doc_id"], r["gram"]) for r in df.collect())


def test_initial_ingest_equals_postings(spark, tri_dir):
    docs = _docs(spark, [(1, "hello world"), (2, "worldly")])
    assert trigram_commit(docs, tri_dir) == 1
    assert _rel(read_committed_trigrams(spark, tri_dir)) == _rel(
        trigram_postings(docs)
    )


def test_add_remove_reindex_lifecycle(spark, tri_dir):
    v1 = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon")])
    trigram_commit(v1, tri_dir)
    # sync: add doc 4, remove doc 2, reindex doc 3 with new text
    adds = _docs(spark, [(4, "zeta eta"), (3, "THETA iota")])
    removed = spark.createDataFrame([(2,), (3,)], "doc_id long")
    trigram_commit(adds, tri_dir, removed_ids=removed)
    expect = _docs(
        spark, [(1, "alpha beta"), (3, "THETA iota"), (4, "zeta eta")]
    )
    assert _rel(read_committed_trigrams(spark, tri_dir)) == _rel(
        trigram_postings(expect)
    )


def test_remove_then_readd(spark, tri_dir):
    trigram_commit(_docs(spark, [(1, "first text")]), tri_dir)
    # remove entirely (empty add set still commits a segment)
    trigram_commit(
        _docs(spark, []),
        tri_dir,
        removed_ids=spark.createDataFrame([(1,)], "doc_id long"),
    )
    assert _rel(read_committed_trigrams(spark, tri_dir)) == []
    # re-add with different content: newer segment beats old tombstone
    trigram_commit(_docs(spark, [(1, "second text")]), tri_dir)
    assert _rel(read_committed_trigrams(spark, tri_dir)) == _rel(
        trigram_postings(_docs(spark, [(1, "second text")]))
    )


def test_compaction_preserves_view_and_drops_tombstones(spark, tri_dir):
    trigram_commit(_docs(spark, [(1, "aaa bbb"), (2, "ccc ddd")]), tri_dir)
    trigram_commit(
        _docs(spark, [(3, "eee fff")]),
        tri_dir,
        removed_ids=spark.createDataFrame([(1,)], "doc_id long"),
    )
    before = _rel(read_committed_trigrams(spark, tri_dir))
    v = trigram_compact(spark, tri_dir)
    after = _rel(read_committed_trigrams(spark, tri_dir))
    assert before == after
    from text_indexer_spark.operators.trigram import _tri_manifest

    ver, manifest = _tri_manifest(tri_dir)
    assert ver == v
    assert len(manifest["segments"]) == 1
    assert manifest["tombstones"] == {}


def test_grep_over_synced_index_equals_full_scan(spark, tri_dir):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "quicksilver surfer"),
            (3, "slow turtle"),
        ],
    )
    trigram_commit(docs, tri_dir)
    update = _docs(spark, [(3, "quite quick now"), (4, "quiche eater")])
    removed = spark.createDataFrame([(3,), (1,)], "doc_id long")
    trigram_commit(update, tri_dir, removed_ids=removed)
    live = _docs(
        spark,
        [
            (2, "quicksilver surfer"),
            (3, "quite quick now"),
            (4, "quiche eater"),
        ],
    )
    tri = read_committed_trigrams(spark, tri_dir)
    got = sorted(
        (r["doc_id"], r["n_matches"])
        for r in grep_trigram(live, tri, "quic[a-z]+").collect()
    )
    want = sorted(
        (r["doc_id"], r["n_matches"])
        for r in regex_grep(live, "quic[a-z]+").collect()
    )
    assert got == want and len(got) == 3


def test_read_missing_index_raises(spark, tri_dir):
    with pytest.raises(FileNotFoundError):
        read_committed_trigrams(spark, tri_dir)


def test_driver_gate_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    sdf = entry.queries()["trigram_sync_postings"](spark, sf)
    got = sorted((r["doc_id"], r["gram"]) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        (a, b)
        for a, b in con.execute(
            entry.oracle_sql()["trigram_sync_postings"]
        ).fetchall()
    )
    assert got == want


def test_randomized_lifecycle_differential(spark, tri_dir):
    """Random op sequence (add / remove / reindex / compact) replayed
    against a driver-side truth dict: after EVERY commit the live view
    must equal trigram postings over the truth corpus."""
    import random

    from text_indexer_spark.operators.trigram import trigram_postings

    rng = random.Random(42)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf"]

    def text():
        return " ".join(rng.choice(words) for _ in range(rng.randrange(2, 7)))

    truth: dict[int, str] = {}
    next_id = 0
    for step in range(12):
        op = rng.choice(["add", "add", "remove", "reindex", "compact"])
        if op == "compact":
            if not _tri_exists(tri_dir):
                continue
            trigram_compact(spark, tri_dir)
        else:
            adds: list[tuple[int, str]] = []
            removed: list[int] = []
            if op == "add" or not truth:
                for _ in range(rng.randrange(1, 4)):
                    adds.append((next_id, text()))
                    next_id += 1
            elif op == "remove":
                for doc in rng.sample(sorted(truth), min(2, len(truth))):
                    removed.append(doc)
                    del truth[doc]
            else:  # reindex: replace content of existing docs
                for doc in rng.sample(sorted(truth), min(2, len(truth))):
                    adds.append((doc, text()))
                    removed.append(doc)
            for doc, t in adds:
                truth[doc] = t
            trigram_commit(
                _docs(spark, adds),
                tri_dir,
                removed_ids=(
                    spark.createDataFrame([(d,) for d in removed], "doc_id long")
                    if removed
                    else None
                ),
            )
        want = _rel(trigram_postings(_docs(spark, sorted(truth.items()))))
        got = _rel(read_committed_trigrams(spark, tri_dir))
        assert got == want, f"step {step} op {op}"


def _tri_exists(tri_dir: str) -> bool:
    from text_indexer_spark.operators.trigram import _tri_manifest

    return _tri_manifest(tri_dir)[0] > 0


def test_concurrent_commit_detected(spark, tri_dir):
    """A writer whose manifest base was overtaken by another commit must
    fail with ConcurrentCommitError, not silently shadow the winner
    (advice r3: unguarded read-modify-write of the LATEST pointer)."""
    from text_indexer_spark import storage
    from text_indexer_spark.operators.trigram import _tri_commit

    trigram_commit(_docs(spark, [(1, "first text")]), tri_dir)  # v1
    # simulate writer B landing v2 after writer A read the v1 manifest:
    # A's commit (also targeting v2) must now fail the pointer swap
    storage.write_bytes_atomic(storage.join(tri_dir, "LATEST"), b"2")
    with pytest.raises(storage.ConcurrentCommitError, match="v2, expected v1"):
        _tri_commit(tri_dir, 2, {"segments": ["seg_000002"], "tombstones": {}})
    # the winner's pointer is untouched
    assert storage.read_bytes(storage.join(tri_dir, "LATEST")) == b"2"


def test_registry_concurrent_save_detected(spark, tri_dir):
    from text_indexer_spark import storage
    from text_indexer_spark.operators import registry

    state = registry.empty_state(spark)
    assert registry.save_state(state, tri_dir) == 1
    # another writer advances the pointer between this writer's version
    # read and its swap: emulate by racing two saves off the same read
    storage.write_bytes_atomic(storage.join(tri_dir, "LATEST"), b"5")
    # save_state re-reads (sees 5) and commits 6 cleanly...
    assert registry.save_state(state, tri_dir) == 6
    # ...but a stale swap fails loudly
    with pytest.raises(storage.ConcurrentCommitError):
        storage.swap_latest(tri_dir, 4, 5)


def test_trigram_vacuum_reachability(spark, tri_dir):
    """trigram_vacuum deletes exactly what no kept manifest references:
    after a compaction, the pre-compaction segments/tombstones and old
    manifests go; the live view is unchanged; still-referenced old
    segments and above-pointer in-flight files survive; idempotent."""
    import os

    from text_indexer_spark.operators.trigram import trigram_vacuum

    trigram_commit(_docs(spark, [(1, "aaa bbb"), (2, "ccc ddd")]), tri_dir)
    trigram_commit(
        _docs(spark, [(3, "eee fff")]),
        tri_dir,
        removed_ids=spark.createDataFrame([(1,)], "doc_id long"),
    )
    # v1/v2 segments are still referenced by LATEST: vacuum removes only
    # the superseded manifest(s), never a live segment
    removed = trigram_vacuum(tri_dir)
    assert removed == ["manifest_v000001.json"]
    view_before = _rel(read_committed_trigrams(spark, tri_dir))

    v = trigram_compact(spark, tri_dir)  # v3: one fresh segment
    # simulate an in-flight commit: a segment of version cur+1 exists
    # before its manifest/pointer — vacuum must not touch it
    orphan = os.path.join(tri_dir, f"seg_{v + 1:06d}")
    _docs(spark, [(9, "zzz")]).write.parquet(orphan)

    removed = trigram_vacuum(tri_dir)
    assert removed == [
        "manifest_v000002.json", "seg_000001", "seg_000002", "ts_000002",
    ]
    assert os.path.exists(orphan)
    assert os.path.exists(os.path.join(tri_dir, f"seg_{v:06d}"))
    assert _rel(read_committed_trigrams(spark, tri_dir)) == view_before
    assert trigram_vacuum(tri_dir) == []  # idempotent
