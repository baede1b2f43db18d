"""Registry state machine vs the reference's DocumentsIndexerTest
semantics (DocumentsIndexerTest.kt:18-126, IndexedDocumentsTest
behaviors): ANY vs SOURCES_ONLY listings across add-file / add-dir /
remove-file / remove-dir sequences, with provenance (not path shape)
deciding nested-ness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import registry as R


def _files(spark, rows):
    return spark.createDataFrame(rows, "repo string, path string, doc_id long")


def _dirs(spark, rows):
    return spark.createDataFrame(rows, "repo string, path string")


def _listing(state, sources_only=False):
    return [
        (r["path"], r["kind"], r["is_nested"])
        for r in R.list_indexed(state, sources_only).collect()
    ]


@pytest.fixture()
def texts_state(spark):
    """The reference fixture: one dir source 'texts' swept with three
    files, one of them inside a subdirectory (texts/mark-manson/…) —
    mirroring textsDirectory with fightclub/starwars at top and
    practical-guide under mark-manson."""
    s = R.empty_state(spark)
    s = R.add_dir_source(
        s,
        _dirs(spark, [("fs", "texts")]),
        _files(
            spark,
            [
                ("fs", "texts/fight-club.txt", 0),
                ("fs", "texts/mark-manson/practical-guide.txt", 1),
                ("fs", "texts/star-wars.txt", 2),
            ],
        ),
    )
    return s.cache()


def test_any_listing_lists_dir_and_nested_files(texts_state):
    # shouldUpdateIndexWithAsync / shouldGetAllIndexedItems: ANY lists
    # the source dir + every file as nested; the fresh subdir
    # (mark-manson) materialized NotIndexed is transparent
    got = _listing(texts_state)
    assert ("texts", "dir", False) in got
    files = [(p, n) for p, k, n in got if k == "file"]
    assert files == [
        ("texts/fight-club.txt", True),
        ("texts/mark-manson/practical-guide.txt", True),
        ("texts/star-wars.txt", True),
    ]
    assert ("texts/mark-manson", "dir", False) not in got
    # top-level = just the source dir (files hang under it)
    tops = [r["path"] for r in R.top_level_items(R.list_indexed(texts_state)).collect()]
    assert tops == ["texts"]


def test_sources_only_listing(texts_state):
    # shouldGetSourceOnlyIndexedItems: only the dir, no files
    got = _listing(texts_state, sources_only=True)
    assert got == [("texts", "dir", False)]


def test_remove_file(spark, texts_state):
    # shouldRemoveFileAsync: fight-club gone (no longer on disk → no
    # dir demotion), others and the dir remain
    s = R.remove_items(
        texts_state,
        files_to_remove=spark.createDataFrame(
            [("fs", "texts/fight-club.txt", False)],
            "repo string, path string, still_exists boolean",
        ),
    )
    got = _listing(s)
    assert ("texts/fight-club.txt", "file", True) not in got
    assert ("texts", "dir", False) in got
    assert ("texts/star-wars.txt", "file", True) in got


def test_remove_dir_subtree(spark, texts_state):
    # shouldRemoveDirAsync: removing texts/mark-manson drops only the
    # file beneath it
    s = R.remove_items(
        texts_state,
        dirs_to_remove=spark.createDataFrame(
            [("fs", "texts/mark-manson", False)],
            "repo string, path string, contains_any_file boolean",
        ),
    )
    got = _listing(s)
    paths = [p for p, k, n in got if k == "file"]
    assert paths == ["texts/fight-club.txt", "texts/star-wars.txt"]


def test_remove_still_existing_file_demotes_dir_chain(spark, texts_state):
    # IndexedFileManager.kt:36-58: removing a file that STILL EXISTS on
    # the source demotes its indexed ancestor dirs to NotIndexed, so
    # the dir disappears from listings while other files remain
    s = R.remove_items(
        texts_state,
        files_to_remove=spark.createDataFrame(
            [("fs", "texts/fight-club.txt", True)],
            "repo string, path string, still_exists boolean",
        ),
    )
    got = _listing(s)
    assert ("texts", "dir", False) not in got  # demoted
    files = [p for p, k, n in got if k == "file"]
    assert files == [
        "texts/mark-manson/practical-guide.txt",
        "texts/star-wars.txt",
    ]
    # SOURCES_ONLY now empty: no independent item left
    assert _listing(s, sources_only=True) == []


def test_explicit_add_promotes_nested_file(spark, texts_state):
    # IndexedDocuments.kt:57-59: explicit add of an already-nested file
    # flips it to independent; a later sweep does NOT downgrade it
    s = R.add_file_sources(
        texts_state, _files(spark, [("fs", "texts/star-wars.txt", 2)])
    )
    got = dict(((p, k), n) for p, k, n in _listing(s))
    assert got[("texts/star-wars.txt", "file")] is False  # independent now
    assert _listing(s, sources_only=True) == [
        ("texts", "dir", False),
        ("texts/star-wars.txt", "file", False),
    ]
    # re-sweep the dir: promotion survives (never downgrade)
    s2 = R.add_dir_source(
        s,
        _dirs(spark, [("fs", "texts")]),
        _files(spark, [("fs", "texts/star-wars.txt", 2)]),
    )
    got2 = dict(((p, k), n) for p, k, n in _listing(s2))
    assert got2[("texts/star-wars.txt", "file")] is False


def test_dir_add_promotes_existing_subdir_not_fresh_one(spark):
    # Node.kt:83-91 + DocumentsIndexer.kt:113 ordering: a subdir that
    # EXISTS at dir-add time becomes AS_NESTED (listed under ANY);
    # subdirs materialized by the sweep's own files stay NotIndexed
    s = R.empty_state(spark)
    # 'root/sub' exists already because a file source under it was added
    s = R.add_file_sources(s, _files(spark, [("fs", "root/sub/a.txt", 0)]))
    s = R.add_dir_source(
        s,
        _dirs(spark, [("fs", "root")]),
        _files(spark, [("fs", "root/fresh/b.txt", 1), ("fs", "root/sub/a.txt", 0)]),
    )
    got = _listing(s)
    assert ("root", "dir", False) in got
    assert ("root/sub", "dir", True) in got          # promoted to nested
    assert ("root/fresh", "dir", False) not in got   # fresh → NotIndexed
    nested = dict(((p, k), n) for p, k, n in got)
    assert nested[("root/sub/a.txt", "file")] is False  # file stays independent


def test_prune_empty_not_indexed_chain(spark):
    # DepthFirstSearch.kt:125-131: removing the only file under a deep
    # not-indexed chain prunes the chain entirely
    s = R.empty_state(spark)
    s = R.add_file_sources(s, _files(spark, [("fs", "a/b/c/d.txt", 0)]))
    s = R.remove_items(
        s,
        files_to_remove=spark.createDataFrame(
            [("fs", "a/b/c/d.txt", False)],
            "repo string, path string, still_exists boolean",
        ),
    )
    assert s.count() == 0


def test_determinism_across_partitionings(spark, texts_state):
    a = R.list_indexed(texts_state).collect()
    b = R.list_indexed(
        texts_state.repartition(7)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_catalog_consumes_registry_provenance(spark):
    """build_catalog prefers corpus-supplied provenance columns over the
    path-shape default: an explicitly-added file in a subdirectory stays
    independent in the catalog."""
    from text_indexer_spark.operators.postings import build_catalog

    corpus = spark.createDataFrame(
        [
            ("fs", "texts/explicit.txt", "c1", "txt", "explicit body", False, "texts/explicit.txt"),
            ("fs", "texts/swept.txt", "c1", "txt", "swept body", True, "texts"),
        ],
        "repo string, path string, commit string, lang string, content string, "
        "is_nested boolean, source_root string",
    )
    cat = {r["path"]: r for r in build_catalog(corpus).collect()}
    assert cat["texts/explicit.txt"]["is_nested"] is False
    assert cat["texts/explicit.txt"]["source_root"] == "texts/explicit.txt"
    assert cat["texts/swept.txt"]["is_nested"] is True
    assert cat["texts/swept.txt"]["source_root"] == "texts"
    # without provenance columns, path shape is the documented default
    cat2 = {
        r["path"]: r
        for r in build_catalog(corpus.drop("is_nested", "source_root")).collect()
    }
    assert cat2["texts/explicit.txt"]["is_nested"] is True  # fallback heuristic


def test_registry_state_persist_roundtrip(spark, tmp_path):
    """Durable catalog API: save → load across 'sessions' is exact, the
    LATEST pointer swaps atomically, and stale versions stay readable."""
    from text_indexer_spark.operators.registry import (
        add_file_sources,
        empty_state,
        load_state,
        load_state_version,
        remove_items,
        save_state,
    )

    sd = str(tmp_path / "registry_state")
    assert load_state_version(sd) == 0
    assert load_state(spark, sd).count() == 0

    files = spark.createDataFrame(
        [("r", "a/b/f1.txt", 1), ("r", "a/f2.txt", 2)],
        "repo string, path string, doc_id long",
    )
    s1 = add_file_sources(empty_state(spark), files)
    assert save_state(s1, sd) == 1
    got = load_state(spark, sd)
    key = lambda df: sorted(
        (r["repo"], r["path"], r["kind"], r["doc_id"], r["status"])
        for r in df.collect()
    )
    assert key(got) == key(s1)

    removed = spark.createDataFrame(
        [("r", "a/b/f1.txt", False)],
        "repo string, path string, still_exists boolean",
    )
    s2 = remove_items(got, removed)
    assert save_state(s2, sd) == 2
    assert load_state_version(sd) == 2
    assert key(load_state(spark, sd)) == key(s2)


def test_registry_durable_multi_op_survives_restart(spark, tmp_path):
    """Opt-in durable mode: a chained op sequence with ``persist_dir``
    commits one parquet version per op, produces the same state as the
    in-memory sequence, and a FRESH session resumes from LATEST (no
    lineage back to the session that wrote it)."""
    from text_indexer_spark.operators.registry import (
        add_dir_source,
        add_file_sources,
        empty_state,
        load_state,
        load_state_version,
        remove_items,
    )

    sd = str(tmp_path / "durable_registry")
    key = lambda df: sorted(
        (r["repo"], r["path"], r["kind"], r["doc_id"], r["status"])
        for r in df.collect()
    )
    files = spark.createDataFrame(
        [("r", "a/b/f1.txt", 1)], "repo string, path string, doc_id long"
    )
    dirs = spark.createDataFrame([("r", "a")], "repo string, path string")
    swept = spark.createDataFrame(
        [("r", "a/f2.txt", 2), ("r", "a/c/f3.txt", 3)],
        "repo string, path string, doc_id long",
    )
    removed = spark.createDataFrame(
        [("r", "a/b/f1.txt", False)],
        "repo string, path string, still_exists boolean",
    )

    # durable sequence: each op loads nothing from executor memory —
    # its input is the previous committed version
    s = add_file_sources(empty_state(spark), files, persist_dir=sd)
    assert load_state_version(sd) == 1
    s = add_dir_source(s, dirs, swept, persist_dir=sd)
    assert load_state_version(sd) == 2
    s = remove_items(s, removed, persist_dir=sd)
    assert load_state_version(sd) == 3

    # reference sequence, purely in-memory
    m = add_file_sources(empty_state(spark), files)
    m = add_dir_source(m, dirs, swept)
    m = remove_items(m, removed)
    assert key(s) == key(m)

    # 'restart': a fresh session state reads LATEST from disk only
    fresh = spark.newSession()
    resumed = load_state(fresh, sd)
    assert key(resumed) == key(m)
    # and the resumed catalog supports further ops
    more = fresh.createDataFrame(
        [("r", "z/new.txt", 9)], "repo string, path string, doc_id long"
    )
    s4 = add_file_sources(resumed, more, persist_dir=sd)
    assert load_state_version(sd) == 4
    assert ("r", "z/new.txt", "file", 9, "independent") in key(s4)


def test_registry_state_vacuum_retention(spark, tmp_path):
    """vacuum_state drops all but the newest keep_last snapshot
    versions; the LATEST version survives and still loads exactly."""
    import os

    from text_indexer_spark.operators.registry import (
        add_file_sources,
        empty_state,
        load_state,
        load_state_version,
        save_state,
        vacuum_state,
    )

    sd = str(tmp_path / "rs")
    assert vacuum_state(sd) == []  # empty store: no-op
    state = empty_state(spark)
    for i in range(3):
        files = spark.createDataFrame(
            [("r", f"a/f{i}.txt", i)], "repo string, path string, doc_id long"
        )
        state = add_file_sources(load_state(spark, sd) if i else state, files)
        assert save_state(state, sd) == i + 1

    removed = vacuum_state(sd, keep_last=1)
    assert [os.path.basename(p) for p in removed] == [
        "state_v000001", "state_v000002",
    ]
    assert load_state_version(sd) == 3
    got = sorted(
        r["path"]
        for r in load_state(spark, sd).collect()
        if r["doc_id"] is not None  # registry also tracks ancestor dirs
    )
    assert got == ["a/f0.txt", "a/f1.txt", "a/f2.txt"]
    assert vacuum_state(sd, keep_last=1) == []  # idempotent
