"""Incremental sync, removal, and catalog listing.

Reference semantics re-expressed as joins:

* ``diff_snapshots`` — the whole of ``IndexedFileManager.defineItemsToSync``
  (``IndexedFileManager.kt:83-143`` + ``DirDiff`` :145-192) as ONE full
  outer join of the indexed catalog vs the current source snapshot on
  (repo, path):
    - right-only               → add        (new \\ old, :158-168)
    - left-only                → remove     (old \\ new, :189-191)
    - both, version differs    → re-index   (outdated, :170-187 — the
      reference compares mtime, ``IndexedItem.kt:49-51``; we compare the
      stronger content identity the reference's own comment recommends:
      commit / sha256)
* ``apply_diff_to_postings`` — replace semantics (``Index.kt:15-23``,
  ``DocumentsIndexer.kt:161-167``): anti-join out changed+removed docs,
  union freshly built postings. Empty posting lists vanish by
  construction (group-by semantics ≙ ``Index.kt:37-39`` pruning).
* ``remove_paths`` / ``remove_dirs`` — targeted deletion incl. dir-prefix
  sweep (``DocumentsIndexer.kt:227-261``, ``DepthFirstSearch.kt:56-132``):
  a dir removal is a path-prefix predicate, served by partition pruning
  on ``repo`` at scale.
* ``indexed_items`` — catalog listing with the ANY vs SOURCES_ONLY
  filter (``IndexedItemsFilter.kt:3-14``: SOURCES_ONLY hides files swept
  up as nested).

Every function is a pure DataFrame program: no driver-side loops, no
collected state. At 10^12 scale each is one or two shuffles, all joins
on (repo, path) — co-partitionable by bucketing the catalog on repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ["repo", "path"]


def diff_snapshots(catalog: DataFrame, source: DataFrame) -> DataFrame:
    """Full-outer-join diff → (repo, path, change, doc_id, commit).

    ``change`` ∈ {'add', 'remove', 'reindex'}; unchanged rows are
    filtered out early (the common case at 10^12 scale — predicate
    evaluated before anything wide happens).
    """
    cat = catalog.select(
        "repo", "path", F.col("doc_id").alias("old_doc_id"),
        F.col("commit").alias("old_commit"),
    )
    src = source.select("repo", "path", F.col("commit").alias("new_commit"))
    j = cat.join(src, KEYS, "full_outer")
    return (
        j.withColumn(
            "change",
            F.when(F.col("old_commit").isNull(), F.lit("add"))
            .when(F.col("new_commit").isNull(), F.lit("remove"))
            .when(F.col("old_commit") != F.col("new_commit"), F.lit("reindex"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("change").isNotNull())
        .select(
            "repo", "path", "change",
            F.col("old_doc_id").alias("doc_id"),
            F.coalesce("new_commit", "old_commit").alias("commit"),
        )
    )


def apply_diff_to_postings(
    postings: DataFrame, diff: DataFrame, new_postings: DataFrame
) -> DataFrame:
    """Replace-on-reindex + delete: old postings of changed/removed docs
    are anti-joined out, new postings unioned in (``Index.kt:15-23``)."""
    stale_ids = diff.filter(F.col("change").isin("remove", "reindex")).select(
        F.col("doc_id")
    ).dropna()
    # no broadcast hint: a sync diff is usually tiny (AQE will
    # broadcast it), but a mass rewrite can be corpus-sized.
    kept = postings.join(stale_ids, "doc_id", "left_anti")
    return kept.unionByName(new_postings)


def apply_diff_to_catalog(
    catalog: DataFrame, diff: DataFrame, new_catalog_rows: DataFrame
) -> DataFrame:
    """Catalog after a sync: drop removed/changed rows, add new ones."""
    stale = diff.filter(F.col("change").isin("remove", "reindex")).select(*KEYS)
    kept = catalog.join(stale, KEYS, "left_anti")
    return kept.unionByName(new_catalog_rows.select(*catalog.columns))


def remove_paths(catalog: DataFrame, postings: DataFrame, paths: DataFrame):
    """Remove explicit files: ``paths`` is a (repo, path) frame.

    Returns (catalog', postings'). ≙ ``DocumentsIndexer.remove`` file
    branch (``DocumentsIndexer.kt:227-243``)."""
    victims = catalog.join(F.broadcast(paths.select(*KEYS)), KEYS, "left_semi")
    ids = victims.select("doc_id")
    return (
        catalog.join(F.broadcast(paths.select(*KEYS)), KEYS, "left_anti"),
        postings.join(F.broadcast(ids), "doc_id", "left_anti"),
    )


def remove_dirs(catalog: DataFrame, postings: DataFrame, dirs: DataFrame):
    """Remove whole directories: ``dirs`` is a (repo, dir_prefix) frame;
    every doc whose path sits under the prefix goes (trie DFS prune,
    ``DepthFirstSearch.kt:56-132`` → one LIKE-prefix semi-join)."""
    d = dirs.select(
        F.col("repo").alias("d_repo"), F.col("dir_prefix").alias("d_prefix")
    )
    hit = (
        catalog.join(
            F.broadcast(d),
            (F.col("repo") == F.col("d_repo"))
            & (
                F.col("path").startswith(F.concat(F.col("d_prefix"), F.lit("/")))
                | (F.col("path") == F.col("d_prefix"))
            ),
            "left_semi",
        )
    )
    ids = hit.select("doc_id")
    keys = hit.select(*KEYS)
    return (
        catalog.join(F.broadcast(keys), KEYS, "left_anti"),
        postings.join(F.broadcast(ids), "doc_id", "left_anti"),
    )


def sync_index(catalog: DataFrame, postings: DataFrame, source: DataFrame):
    """One full incremental sync round → (catalog', postings', diff).

    ≙ ``DocumentsIndexer.syncIndexedItemsAsync`` (``DocumentsIndexer.kt:
    263-324``): diff, re-index adds/changes, drop removals. Identity
    rules follow the reference's registry (``IndexedDocuments.kt:42-66``):
    an existing path keeps its doc_id on re-index (only metadata/postings
    are replaced); brand-new paths mint fresh ids above the current max.
    New-id assignment is deterministic (rank of (repo, path, commit) among
    the added rows, offset by max existing id + 1).
    """
    from text_indexer_spark.operators.postings import (
        assign_doc_ids,
        build_postings,
        dedup_corpus,
    )
    from text_indexer_spark.tokenizer import tokenize_column

    if "content" in catalog.columns:  # persisted catalogs carry no content
        catalog = catalog.drop("content")
    diff = diff_snapshots(catalog, source).cache()

    def enrich(rows: DataFrame) -> DataFrame:
        return rows.withColumn(
            "content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
        ).withColumn(
            "doc_len", F.size(tokenize_column(F.coalesce(F.col("content"), F.lit(""))))
        ).withColumn("is_nested", F.col("path").contains("/")).withColumn(
            "source_root", F.col("repo")
        )

    src = dedup_corpus(source)
    adds = src.join(diff.filter(F.col("change") == "add").select(*KEYS), KEYS, "left_semi")
    max_id = catalog.agg(F.max("doc_id")).first()[0]
    start = (max_id + 1) if max_id is not None else 0
    adds_with_ids = assign_doc_ids(adds).withColumn("doc_id", F.col("doc_id") + F.lit(start))

    reidx_keys = diff.filter(F.col("change") == "reindex").select(*KEYS, "doc_id")
    reindexed = src.join(reidx_keys, KEYS, "inner")  # keeps old doc_id

    new_rows = enrich(adds_with_ids.unionByName(reindexed))
    new_postings = build_postings(new_rows.select("doc_id", "content"))

    catalog2 = apply_diff_to_catalog(catalog, diff, new_rows.drop("content"))
    postings2 = apply_diff_to_postings(postings, diff, new_postings)
    return catalog2, postings2, diff


def indexed_items(catalog: DataFrame, sources_only: bool = False) -> DataFrame:
    """Catalog listing, sorted like the trie traversal (``Node.kt:79-81``).

    ``sources_only=True`` ≙ IndexedItemsFilter.SOURCES_ONLY: hide files
    that were indexed as nested under a parent dir."""
    out = catalog.select("doc_id", "repo", "path", "is_nested", "source_root")
    if sources_only:
        out = out.filter(~F.col("is_nested"))
    return out.orderBy("repo", "path")


def dir_summary(catalog: DataFrame) -> DataFrame:
    """Per-source-root rollup (the UI tree's dir grouping,
    ``DepthFirstSearch.kt:16-54`` fold): doc count + total length."""
    return (
        catalog.groupBy("repo")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_len").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("is_nested"), 1).otherwise(0)).cast("long").alias("n_nested"),
        )
        .orderBy("repo")
    )
