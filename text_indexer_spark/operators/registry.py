"""Document-registry state machine: nested/independent source provenance.

The reference tracks HOW each item entered the index, not just where it
lives (``IndexedItem.kt:13-22``): a file added explicitly is an
INDEPENDENT source; a file swept up by a directory add is NESTED; a
directory is ``NotIndexed | Indexed(AS_NESTED) | Indexed(INDEPENDENTLY)``
(``Node.kt:126-135``). Round 1 approximated ``is_nested`` from path
shape — wrong for "add a file explicitly, then sweep its parent dir":
provenance is an event property, not a path property. This module is
the faithful relational port; the state is ONE DataFrame:

    items(repo, path, kind: 'file'|'dir', doc_id: long|null,
          status: 'independent'|'nested'|'not_indexed')

Reference rules reproduced (each cited at its operator):

* dir add marks the dir INDEPENDENTLY (always overriding —
  ``Node.kt:105-107`` ``setIsIndexedAsIndependentSource``) and promotes
  existing NOT-INDEXED descendant dirs to AS_NESTED, never downgrading
  INDEPENDENTLY (``Node.kt:83-91`` ``setIndexedAsNested`` returns early
  when already indexed; swept via ``DepthFirstSearch.kt:134-151``).
* intermediate dirs materialize NotIndexed (``IndexedDocuments.kt:
  100-113`` ``computeDirNode``) — they are invisible in listings.
* file add: explicit add promotes an existing nested file to
  independent; a sweep never downgrades (``IndexedDocuments.kt:42-66``).
* remove: dirs whose removed files still exist on the source must be
  DEMOTED to NotIndexed rather than deleted, so future syncs stop
  sweeping them (``IndexedFileManager.kt:36-58``
  ``defineDirsToMarkAsNotIndexed``: ancestor chains of still-existing
  removed files ∪ removed-dirs-that-still-contain-files, intersected
  with currently indexed dirs); empty non-indexed dir chains are pruned
  (``DepthFirstSearch.kt:125-131`` post-remove sweep).
* listing: DFS emits a file when filter is ANY or the file is
  independent, a dir when it is indexed and (ANY or independent)
  (``DepthFirstSearch.kt:16-54``, ``IndexedItemsFilter.kt:3-6``).

Scale shape: every operation is joins + an ancestor explode bounded by
path DEPTH (not corpus size); no collect, no driver-side tree walk —
the trie the reference walks in memory is exactly what does not survive
10^12 files, its QUERIES do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITEM_SCHEMA = "repo string, path string, kind string, doc_id long, status string"

INDEPENDENT = "independent"
NESTED = "nested"
NOT_INDEXED = "not_indexed"


def empty_state(spark) -> DataFrame:
    return spark.createDataFrame([], ITEM_SCHEMA)


def _commit(state: DataFrame, persist_dir: str | None = None) -> DataFrame:
    """Materialize the new state and cut lineage. Every public op ends
    here: an op references its input state several times, so N chained
    ops WITHOUT a cut would recompute the state O(k^N) times (the same
    blow-up ``cluster.connected_components`` cuts per round).

    Two modes, same single materialization either way:

    * default — ``localCheckpoint`` (executor-memory-resident): right
      for a sequence of ops inside one job/session;
    * ``persist_dir`` — the durable mode for long-lived catalogs: the
      new state is committed as the next parquet version under
      ``persist_dir`` (``save_state``'s guarded LATEST swap) and the op
      returns the frame READ BACK from that version, so the parquet
      write doubles as the lineage cut, chained ops build on committed
      bytes rather than executor memory, and a crash/restart resumes
      from LATEST with nothing lost."""
    if persist_dir is not None:
        save_state(state, persist_dir)
        return load_state(state.sparkSession, persist_dir)
    return state.localCheckpoint(eager=True)


def _ancestor_dirs(df: DataFrame, include_self: bool = False) -> DataFrame:
    """(repo, path) → exploded (repo, path=ancestor dir). Ancestors of
    'a/b/c' are 'a', 'a/b' (+ itself when include_self)."""
    parts = F.split(F.col("path"), "/")
    hi = F.size(parts) if include_self else F.size(parts) - 1
    anc = F.when(
        hi >= 1,
        F.transform(
            F.sequence(F.lit(1), hi),
            lambda i: F.array_join(F.slice(parts, 1, i), "/"),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select("repo", F.explode(anc).alias("path")).distinct()


def _upsert(state: DataFrame, rows: DataFrame) -> DataFrame:
    """Replace state rows whose (repo, path) appears in ``rows``."""
    return state.join(rows.select("repo", "path"), ["repo", "path"], "left_anti").unionByName(rows)


def _materialize_parents(state: DataFrame, keys: DataFrame) -> DataFrame:
    """Create NotIndexed dir rows for every missing ancestor of ``keys``
    (``IndexedDocuments.kt:100-113`` computeDirNode)."""
    parents = _ancestor_dirs(keys).select(
        "repo", "path", F.lit("dir").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"), F.lit(NOT_INDEXED).alias("status"),
    )
    missing = parents.join(state.select("repo", "path"), ["repo", "path"], "left_anti")
    return state.unionByName(missing)


def add_file_sources(
    state: DataFrame, files: DataFrame, persist_dir: str | None = None
) -> DataFrame:
    """Explicit file adds: new or existing files become INDEPENDENT
    (``IndexedDocuments.kt:57-59`` promotes on explicit add)."""
    f = files.select(
        "repo", "path", F.lit("file").alias("kind"),
        F.col("doc_id").cast("long"), F.lit(INDEPENDENT).alias("status"),
    )
    return _commit(_materialize_parents(_upsert(state, f), f), persist_dir)


def add_dir_source(
    state: DataFrame, dirs: DataFrame, swept_files: DataFrame,
    persist_dir: str | None = None,
) -> DataFrame:
    """Add directories as independent sources sweeping ``swept_files``.

    Order mirrors ``DocumentsIndexer.kt:113`` (dirs marked BEFORE files
    index): descendant-dir promotion sees only dirs that already exist,
    so fresh subdirectories materialized by the swept files stay
    NotIndexed — exactly why a fresh sweep lists its files directly
    under the source dir."""
    d = dirs.select(
        "repo", "path", F.lit("dir").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"), F.lit(INDEPENDENT).alias("status"),
    )
    # promote EXISTING not-indexed proper-descendant dirs to nested
    # (Node.kt:83-91: never downgrades an indexed dir)
    dir_rows = state.filter(F.col("kind") == "dir")
    parts = F.split(F.col("path"), "/")
    with_anc = dir_rows.select(
        "repo", "path", "status",
        F.explode(
            F.when(
                F.size(parts) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(parts) - 1),
                    lambda i: F.array_join(F.slice(parts, 1, i), "/"),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("anc"),
    )
    promote = (
        with_anc.join(
            d.select("repo", F.col("path").alias("anc")), ["repo", "anc"], "left_semi"
        )
        .filter(F.col("status") == NOT_INDEXED)
        .select("repo", "path")
        .distinct()
    )
    promoted = dir_rows.join(promote, ["repo", "path"], "left_semi").select(
        "repo", "path", "kind", "doc_id", F.lit(NESTED).alias("status")
    )
    state = _upsert(state, promoted)
    state = _materialize_parents(_upsert(state, d), d)

    # swept files: keep existing status (sweep never downgrades,
    # IndexedDocuments.kt:42-66), new files come in NESTED
    f = swept_files.select(
        "repo", "path", F.lit("file").alias("kind"),
        F.col("doc_id").cast("long"), F.lit(NESTED).alias("status"),
    )
    new_files = f.join(state.select("repo", "path"), ["repo", "path"], "left_anti")
    return _commit(
        _materialize_parents(state.unionByName(new_files), f), persist_dir
    )


def remove_items(
    state: DataFrame,
    files_to_remove: DataFrame | None = None,
    dirs_to_remove: DataFrame | None = None,
    persist_dir: str | None = None,
) -> DataFrame:
    """Remove files/dirs from the registry.

    ``files_to_remove(repo, path, still_exists: boolean)`` /
    ``dirs_to_remove(repo, path, contains_any_file: boolean)`` — the two
    booleans are the reference's filesystem probes
    (``IndexedFileManager.kt:45-56``): a removed item that still exists
    on the source demotes its ancestor-dir chain to NotIndexed so sync
    stops sweeping it; dirs with nothing left and no indexed status are
    pruned (``DepthFirstSearch.kt:125-131``)."""
    spark = state.sparkSession
    if files_to_remove is None:
        files_to_remove = spark.createDataFrame([], "repo string, path string, still_exists boolean")
    if dirs_to_remove is None:
        dirs_to_remove = spark.createDataFrame([], "repo string, path string, contains_any_file boolean")

    # dirs to DEMOTE: ancestor chains of still-existing removed files ∪
    # (self + ancestors) of removed dirs still containing files,
    # intersected with currently INDEXED dirs
    mark_src = _ancestor_dirs(
        files_to_remove.filter(F.col("still_exists")), include_self=False
    ).unionByName(
        _ancestor_dirs(
            dirs_to_remove.filter(F.col("contains_any_file")), include_self=True
        )
    )
    to_mark = mark_src.join(
        state.filter((F.col("kind") == "dir") & (F.col("status") != NOT_INDEXED))
        .select("repo", "path"),
        ["repo", "path"],
        "left_semi",
    )

    # drop removed FILES (a files_to_remove key naming a dir is a no-op,
    # mirroring the reference: ToRemove.containsFileByAbsolutePath is
    # only consulted at File nodes) and everything under removed DIRS
    # (a dirs_to_remove key naming a file likewise only contributes its
    # ancestor chain to the demotion set above)
    removed_file_keys = files_to_remove.select("repo", "path").join(
        state.filter(F.col("kind") == "file").select("repo", "path"),
        ["repo", "path"],
        "left_semi",
    )
    survivors = state.join(removed_file_keys, ["repo", "path"], "left_anti")
    effective_dir_rm = dirs_to_remove.select("repo", "path").join(
        state.filter(F.col("kind") == "dir").select("repo", "path"),
        ["repo", "path"],
        "left_semi",
    )
    victims_self = survivors.join(
        effective_dir_rm, ["repo", "path"], "left_semi"
    ).select("repo", "path")
    parts = F.split(F.col("path"), "/")
    anc_of_items = survivors.select(
        "repo", "path",
        F.when(
            F.size(parts) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(parts) - 1),
                lambda i: F.array_join(F.slice(parts, 1, i), "/"),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("ancs"),
    )
    under_removed = (
        anc_of_items.select("repo", "path", F.explode("ancs").alias("anc"))
        .join(
            effective_dir_rm.select("repo", F.col("path").alias("anc")),
            ["repo", "anc"],
            "left_semi",
        )
        .select("repo", "path")
        .distinct()
        .unionByName(victims_self)
    )
    survivors = survivors.join(under_removed, ["repo", "path"], "left_anti")

    # demote marked dirs
    demoted = survivors.join(to_mark, ["repo", "path"], "left_semi").filter(
        F.col("kind") == "dir"
    ).select("repo", "path", "kind", "doc_id", F.lit(NOT_INDEXED).alias("status"))
    survivors = _upsert(survivors, demoted)

    # prune: a dir survives iff it is indexed, or some surviving file /
    # indexed dir lives strictly beneath it (closure of the reference's
    # bottom-up !isIndexed && !hasAnyChild sweep)
    keepers = survivors.filter(
        (F.col("kind") == "file") | (F.col("status") != NOT_INDEXED)
    )
    live_anc = _ancestor_dirs(keepers, include_self=False)
    dead = (
        survivors.filter((F.col("kind") == "dir") & (F.col("status") == NOT_INDEXED))
        .join(live_anc, ["repo", "path"], "left_anti")
        .select("repo", "path")
    )
    return _commit(
        survivors.join(dead, ["repo", "path"], "left_anti"), persist_dir
    )


def list_indexed(state: DataFrame, sources_only: bool = False) -> DataFrame:
    """The DFS listing, flat: files pass when ANY or independent; dirs
    pass when indexed and (ANY or independent)
    (``DepthFirstSearch.kt:16-54``). Sorted by (repo, path) — the
    reference's sorted-children traversal order."""
    files = state.filter(F.col("kind") == "file")
    dirs = state.filter((F.col("kind") == "dir") & (F.col("status") != NOT_INDEXED))
    if sources_only:
        files = files.filter(F.col("status") == INDEPENDENT)
        dirs = dirs.filter(F.col("status") == INDEPENDENT)
    return (
        files.unionByName(dirs)
        .select("repo", "path", "kind", "doc_id", (F.col("status") == NESTED).alias("is_nested"))
        .orderBy("repo", "path")
    )


def top_level_items(listing: DataFrame) -> DataFrame:
    """Items with no LISTED dir strictly above them — the reference's
    ``finalIndexedItems`` roots (nested items hang under these)."""
    parts = F.split(F.col("path"), "/")
    with_anc = listing.select(
        "repo", "path", "kind",
        F.when(
            F.size(parts) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(parts) - 1),
                lambda i: F.array_join(F.slice(parts, 1, i), "/"),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("ancs"),
    )
    covered = (
        with_anc.select("repo", "path", F.explode("ancs").alias("anc"))
        .join(
            listing.filter(F.col("kind") == "dir").select(
                "repo", F.col("path").alias("anc")
            ),
            ["repo", "anc"],
            "left_semi",
        )
        .select("repo", "path")
        .distinct()
    )
    return listing.join(covered, ["repo", "path"], "left_anti").orderBy("repo", "path")


# ------------------------------------------------------- durable state
# Long-lived catalogs should not live in executor memory between ops
# (``_commit``'s localCheckpoint is the right lineage cut WITHIN a
# session, not a persistence story). These two functions are the
# deployment API: versioned parquet snapshots with an atomically
# swapped LATEST pointer — crash-safe (a torn write never becomes
# LATEST), storage-abstracted (local/object-store via ``storage``), and
# the same pattern the index manifest uses (``checkpoint.py``).

def save_state(state: DataFrame, state_dir: str) -> int:
    """Persist registry state as the next version under ``state_dir``;
    returns the committed version number."""
    from text_indexer_spark import storage

    cur = load_state_version(state_dir)
    version = cur + 1
    vdir = storage.join(state_dir, f"state_v{version:06d}")
    state.write.mode("overwrite").parquet(vdir)
    # guarded pointer swap: a concurrent save_state against the same dir
    # fails loudly instead of silently shadowing this version — see
    # storage.swap_latest for the single-writer contract
    storage.swap_latest(state_dir, cur, version)
    return version


def load_state_version(state_dir: str) -> int:
    """Committed version under ``state_dir`` (0 if none)."""
    from text_indexer_spark import storage

    ptr = storage.join(state_dir, "LATEST")
    if not storage.exists(ptr):
        return 0
    return int(storage.read_bytes(ptr).decode().strip())


def load_state(spark, state_dir: str) -> DataFrame:
    """Load the committed registry state (empty state if none yet)."""
    from text_indexer_spark import storage

    version = load_state_version(state_dir)
    if version == 0:
        return empty_state(spark)
    return spark.read.parquet(
        storage.join(state_dir, f"state_v{version:06d}")
    )


def vacuum_state(state_dir: str, keep_last: int = 2) -> list[str]:
    """Retention for the registry snapshot chain: each ``save_state``
    writes a FULL state table, so the chain grows O(saves × state
    size).  Drops all but the newest ``keep_last`` committed versions;
    the LATEST version and above-pointer crash orphans are never
    touched (``storage.vacuum_versioned`` semantics, shared with the
    line-count store).  Returns removed dirs, oldest first."""
    from text_indexer_spark import storage

    return storage.vacuum_versioned(state_dir, "state_v", keep_last=keep_last)
