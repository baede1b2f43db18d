"""Incremental sync over the golden snapshot sequence (FIXTURES.md §5,
mirroring reference ``DocumentsIndexerTest.kt:153-293``) plus removal
and listing semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.corpus import golden_corpus
from text_indexer_spark.operators.postings import build_catalog, build_postings
from text_indexer_spark.operators.search import conjunctive_match
from text_indexer_spark.operators.sync import (
    diff_snapshots,
    dir_summary,
    indexed_items,
    remove_dirs,
    remove_paths,
    sync_index,
)


@pytest.fixture(scope="module")
def v1(spark):
    corpus = golden_corpus(spark, snapshot=1)
    catalog = build_catalog(corpus).cache()
    postings = build_postings(catalog).cache()
    return catalog, postings


def _matches(postings, catalog, terms):
    ids = conjunctive_match(postings, terms)
    return {
        r["path"]
        for r in catalog.join(ids, "doc_id", "left_semi").select("path").collect()
    }


def test_diff_classes(spark, v1):
    catalog, _ = v1
    v2 = golden_corpus(spark, snapshot=2)  # sentinel modified
    d = {(r["path"]): r["change"] for r in diff_snapshots(catalog, v2).collect()}
    assert d == {"temp_file.txt": "reindex"}
    v3 = golden_corpus(spark, snapshot=3)  # sentinel deleted
    d = {(r["path"]): r["change"] for r in diff_snapshots(catalog, v3).collect()}
    assert d == {"temp_file.txt": "remove"}
    # add: new file in the source
    v4 = golden_corpus(spark, snapshot=1).unionByName(
        spark.createDataFrame(
            [("texts", "new/extra.txt", "c" * 40, "text", "walt whitman anew")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    d = {(r["path"]): r["change"] for r in diff_snapshots(catalog, v4).collect()}
    assert d == {"new/extra.txt": "add"}
    # no changes → empty diff
    assert diff_snapshots(catalog, golden_corpus(spark, snapshot=1)).count() == 0


def test_sync_modified_file(spark, v1):
    """shouldSyncModifiedFileAsync (:258-277): after modification,
    [walt, whitman] finds the doc; old content is replaced."""
    catalog, postings = v1
    assert _matches(postings, catalog, ["walt", "whitman"]) == set()
    cat2, post2, diff = sync_index(catalog, postings, golden_corpus(spark, snapshot=2))
    assert _matches(post2, cat2, ["walt", "whitman"]) == {"temp_file.txt"}
    # sentinel tokens still there (modification appended a line)
    assert _matches(post2, cat2, ["judgemental", "curious"]) == {"temp_file.txt"}
    # doc_id preserved on re-index (IndexedDocuments.kt:42-66)
    old_id = catalog.filter(F.col("path") == "temp_file.txt").first()["doc_id"]
    new_id = cat2.filter(F.col("path") == "temp_file.txt").first()["doc_id"]
    assert old_id == new_id
    # commit updated
    assert (
        cat2.filter(F.col("path") == "temp_file.txt").first()["commit"]
        != catalog.filter(F.col("path") == "temp_file.txt").first()["commit"]
    )


def test_sync_removed_file(spark, v1):
    """shouldSyncRemovedFileAsync (:222-246): query → empty after delete;
    postings of the doc fully pruned (Index.kt:29-39)."""
    catalog, postings = v1
    cat3, post3, _ = sync_index(catalog, postings, golden_corpus(spark, snapshot=3))
    assert _matches(post3, cat3, ["judgemental", "curious"]) == set()
    assert cat3.filter(F.col("path") == "temp_file.txt").count() == 0
    victim = catalog.filter(F.col("path") == "temp_file.txt").first()["doc_id"]
    assert post3.filter(F.col("doc_id") == victim).count() == 0


def test_sync_new_file(spark, v1):
    """shouldSyncNewFileAsync (:153-169): added file searchable, fresh id."""
    catalog, postings = v1
    v4 = golden_corpus(spark, snapshot=1).unionByName(
        spark.createDataFrame(
            [("texts", "new/extra.txt", "c" * 40, "text", "ewoks on endor celebrate")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    cat4, post4, _ = sync_index(catalog, postings, v4)
    assert _matches(post4, cat4, ["ewoks", "endor"]) == {"new/extra.txt"}
    max_old = catalog.agg(F.max("doc_id")).first()[0]
    new_id = cat4.filter(F.col("path") == "new/extra.txt").first()["doc_id"]
    assert new_id == max_old + 1
    # old docs unchanged
    assert cat4.filter(F.col("path") != "new/extra.txt").count() == catalog.count()


def test_remove_file_and_dir(spark, v1):
    """remove file / remove dir (DocumentsIndexerTest.kt:93-126)."""
    catalog, postings = v1
    paths = spark.createDataFrame([("texts", "temp_file.txt")], "repo string, path string")
    cat2, post2 = remove_paths(catalog, postings, paths)
    assert _matches(post2, cat2, ["judgemental", "curious"]) == set()
    assert cat2.count() == catalog.count() - 1

    dirs = spark.createDataFrame([("texts", "mark-manson")], "repo string, dir_prefix string")
    cat3, post3 = remove_dirs(catalog, postings, dirs)
    assert cat3.filter(F.col("path").startswith("mark-manson/")).count() == 0
    assert _matches(post3, cat3, ["happiness"]) == set()
    # untouched docs still searchable
    assert _matches(post3, cat3, ["tyler"]) == {"fight-club.txt"}


def test_indexed_items_filter(v1):
    """ANY vs SOURCES_ONLY (IndexedItemsFilter.kt:3-14)."""
    catalog, _ = v1
    all_items = indexed_items(catalog, sources_only=False).collect()
    top_only = indexed_items(catalog, sources_only=True).collect()
    assert len(all_items) == 5
    assert {r["path"] for r in all_items} - {r["path"] for r in top_only} == {
        "mark-manson/a-practical-guide-to-happiness.txt",
        "main/Example.kt",
    }
    paths = [(r["repo"], r["path"]) for r in all_items]
    assert paths == sorted(paths)


def test_dir_summary(v1):
    catalog, _ = v1
    rows = {r["repo"]: r for r in dir_summary(catalog).collect()}
    assert rows["texts"]["n_docs"] == 4
    assert rows["src"]["n_docs"] == 1
    assert rows["texts"]["n_nested"] == 1


def test_table_snapshot_parquet_rejects_time_travel(spark):
    """Parquet dirs have no snapshot history: time-travel options must
    fail loudly, plain reads pass through to load_table."""
    import pytest as _pytest

    from text_indexer_spark.sources.tables import table_snapshot

    sf = "/root/testdata/sf0.001"
    assert table_snapshot(spark, sf, "documents").count() > 0
    with _pytest.raises(ValueError):
        table_snapshot(spark, sf, "documents", snapshot_id=123)
    with _pytest.raises(ValueError):
        table_snapshot(spark, sf, "documents", as_of_ms=1700000000000)


def test_assign_doc_ids_edge_shapes(spark):
    """Degenerate inputs through the boundary-based rank: empty corpus,
    one distinct key (no boundaries), and rank == sorted (repo, path)."""
    from text_indexer_spark.operators.postings import assign_doc_ids

    schema = "repo string, path string, commit string, lang string, content string"
    empty = spark.createDataFrame([], schema)
    assert assign_doc_ids(empty).count() == 0

    one = spark.createDataFrame([("r", "p", "c", "l", "x")], schema)
    assert [r["doc_id"] for r in assign_doc_ids(one).collect()] == [0]

    rows = [(f"r{i%3}", f"p{i}", "c", "l", "x") for i in range(40)]
    df = spark.createDataFrame(rows, schema)
    got = sorted((r["repo"], r["path"], r["doc_id"]) for r in assign_doc_ids(df).collect())
    expected_order = sorted((r, p) for r, p, *_ in rows)
    assert [(r, p) for r, p, _ in got] == expected_order
    assert [i for *_, i in got] == list(range(40))  # dense global rank
