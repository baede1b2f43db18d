"""Incremental index-directory sync: only changed shards touched, and
the synced index is EXACTLY equivalent to a from-scratch rebuild of the
new snapshot (scores, stats, catalog) — the persisted-storage analogue
of the reference's sync (``DocumentsIndexer.kt:263-324``)."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.corpus import synthetic_corpus
from text_indexer_spark.operators.index_build import (
    build_index,
    load_catalog,
    load_posting_lists,
)
from text_indexer_spark.operators.index_sync import sync_index_dir
from text_indexer_spark.operators.wand import wand_topk

QUERIES = [["the"], ["the", "data"], ["spark", "join"], ["dup"]]


def _file_sha(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _results_by_path(spark, index_dir, terms, k=10):
    """Global top-k keyed by (repo, path): doc ids differ between a
    synced index and a fresh rebuild, so the cross-index-comparable
    identity is the path + the score."""
    lists = load_posting_lists(spark, index_dir)
    cat = load_catalog(spark, index_dir).select("doc_id", "repo", "path")
    hits = wand_topk(lists, terms, k=k, global_topk=False)
    rows = (
        hits.join(cat, "doc_id")
        .select("repo", "path", F.round("score", 6).alias("score"))
        .collect()
    )
    ranked = sorted(
        ((r["repo"], r["path"], r["score"]) for r in rows),
        key=lambda t: (-t[2], t[0], t[1]),
    )
    return ranked[:k]


@pytest.fixture(scope="module")
def v1(spark, tmp_path_factory):
    corpus = synthetic_corpus(spark, n_docs=120, avg_tokens=40, n_repos=12).cache()
    idx = str(tmp_path_factory.mktemp("sync_idx") / "v1")
    m = build_index(corpus, idx, num_shards=8, resume=False)
    return corpus, idx, m


def _snapshot2(spark, corpus):
    """Concentrated change set (range sharding → few shards touched):
    inside ONE repo, delete some docs and modify the rest; add one new
    doc in a new repo at the top of the key range."""
    target = corpus.select("repo").orderBy("repo").limit(1).collect()[0]["repo"]
    kept = corpus.filter(
        (F.col("repo") != target) | (F.pmod(F.xxhash64("path"), F.lit(3)) != 0)
    )
    modified = kept.withColumn(
        "content",
        F.when(
            F.col("repo") == target,
            F.concat(F.col("content"), F.lit(" zmarker zmarker")),
        ).otherwise(F.col("content")),
    ).withColumn(
        "commit",
        F.when(
            F.col("repo") == target,
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256),
        ).otherwise(F.col("commit")),
    )
    added = spark.createDataFrame(
        [("zz/new-repo", "docs/new_1.txt", "c-new", "txt",
          "zmarker fresh added doc the data")],
        "repo string, path string, commit string, lang string, content string",
    )
    return modified.unionByName(added)


def test_synced_index_equals_full_rebuild(spark, v1, tmp_path):
    corpus, idx1, m1 = v1
    src2 = _snapshot2(spark, corpus).cache()
    out = str(tmp_path / "v2")
    m2 = sync_index_dir(spark, idx1, src2, out)
    assert m2["version"] == m1.get("version", 1) + 1
    assert m2["synced"]["remove"] > 0 and m2["synced"]["reindex"] > 0
    assert m2["synced"]["add"] >= 1

    ref_dir = str(tmp_path / "ref")
    build_index(src2, ref_dir, num_shards=8, resume=False)

    # catalog equivalence on content identity (ids may differ for adds)
    def cat_set(d):
        return {
            (r["repo"], r["path"], r["content_sha256"], r["doc_len"])
            for r in load_catalog(spark, d).collect()
        }

    assert cat_set(out) == cat_set(ref_dir)

    # stats equivalence: same term -> df map
    def stats_map(d):
        return {
            r["term"]: r["df"]
            for r in spark.read.parquet(os.path.join(d, "stats")).collect()
        }

    assert stats_map(out) == stats_map(ref_dir)

    # score equivalence: BM25 results identical by (repo, path, score)
    for terms in QUERIES:
        assert _results_by_path(spark, out, terms) == _results_by_path(
            spark, ref_dir, terms
        ), terms
    # the modified marker token is searchable in the synced index
    hits = _results_by_path(spark, out, ["zmarker"], k=50)
    assert any(p == "docs/new_1.txt" for _, p, _ in hits)


def test_unaffected_shards_are_untouched(spark, v1, tmp_path):
    corpus, idx1, m1 = v1
    src2 = _snapshot2(spark, corpus)
    out = str(tmp_path / "v2b")
    m2 = sync_index_dir(spark, idx1, src2, out)
    affected = set(m2["synced"]["affected_shards"])
    untouched = [s for s in range(m2["num_shards"]) if s not in affected]
    assert untouched, "test corpus should leave some shards unaffected"
    for s in untouched:
        for sub in ("postings", "catalog"):
            a = os.path.join(idx1, sub, f"shard_{s:05d}.parquet")
            b = os.path.join(out, sub, f"shard_{s:05d}.parquet")
            if os.path.exists(a):
                assert _file_sha(a) == _file_sha(b), (sub, s)


def test_noop_sync_is_pure_link(spark, v1, tmp_path):
    corpus, idx1, _ = v1
    out = str(tmp_path / "v_noop")
    m2 = sync_index_dir(spark, idx1, corpus, out)
    assert m2["synced"] == {"add": 0, "remove": 0, "reindex": 0}
    for s in range(m2["num_shards"]):
        for sub in ("postings", "catalog", "posting_lists"):
            a = os.path.join(idx1, sub, f"shard_{s:05d}.parquet")
            b = os.path.join(out, sub, f"shard_{s:05d}.parquet")
            if os.path.exists(a):
                assert _file_sha(a) == _file_sha(b)
    # still a queryable committed index
    assert _results_by_path(spark, out, ["the"]) == _results_by_path(
        spark, idx1, ["the"]
    )


def test_stats_preserving_change_reencodes_only_affected(spark, v1, tmp_path):
    """A content change that keeps the token multiset (extra delimiter)
    leaves N/avgdl/df untouched: only the affected shards re-encode and
    every other compressed list file is carried over byte-identical."""
    corpus, idx1, _ = v1
    one = corpus.orderBy("repo", "path").limit(1).collect()[0]
    hit = (F.col("repo") == one["repo"]) & (F.col("path") == one["path"])
    src2 = corpus.withColumn(
        "content",
        F.when(hit, F.regexp_replace(F.col("content"), " ", "  ")).otherwise(
            F.col("content")
        ),
    ).withColumn(
        "commit",
        F.when(hit, F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)).otherwise(
            F.col("commit")
        ),
    )
    out = str(tmp_path / "v_same_stats")
    m2 = sync_index_dir(spark, idx1, src2, out)
    assert m2["synced"]["reindex"] == 1
    assert m2["synced"]["stats_changed"] is False
    assert m2["synced"]["reencoded_shards"] == m2["synced"]["affected_shards"]
    affected = set(m2["synced"]["affected_shards"])
    for s in range(m2["num_shards"]):
        if s in affected:
            continue
        a = os.path.join(idx1, "posting_lists", f"shard_{s:05d}.parquet")
        b = os.path.join(out, "posting_lists", f"shard_{s:05d}.parquet")
        if os.path.exists(a):
            assert _file_sha(a) == _file_sha(b)
    for terms in QUERIES:
        assert _results_by_path(spark, out, terms) == _results_by_path(
            spark, idx1, terms
        ), terms


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_randomized_sync_equals_rebuild(spark, v1, tmp_path, seed):
    """Seeded pseudo-random change mixes (scattered deletes + modifies +
    adds) must still produce an index exactly equal to a rebuild —
    regardless of how many shards they touch."""
    corpus, idx1, _ = v1
    h = F.pmod(F.xxhash64(F.lit(seed), "repo", "path"), F.lit(20))
    kept = corpus.filter(h != 0)  # ~5% deleted
    src2 = kept.withColumn(
        "content",
        F.when(h == 1, F.concat(F.col("content"), F.lit(f" seedmark{seed}"))).otherwise(
            F.col("content")
        ),
    ).withColumn(
        "commit",
        F.when(h == 1, F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)).otherwise(
            F.col("commit")
        ),
    ).unionByName(
        spark.createDataFrame(
            [
                (f"aa/added-{seed}", "docs/a.txt", f"c{seed}a", "txt",
                 f"seedmark{seed} alpha the data"),
                (f"zz/added-{seed}", "docs/z.txt", f"c{seed}z", "txt",
                 f"seedmark{seed} omega join merge"),
            ],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    out = str(tmp_path / f"v2_{seed}")
    m2 = sync_index_dir(spark, idx1, src2, out)
    assert m2["synced"]["remove"] > 0 and m2["synced"]["add"] == 2

    ref = str(tmp_path / f"ref_{seed}")
    build_index(src2, ref, num_shards=8, resume=False)
    cat = lambda d: {
        (r["repo"], r["path"], r["content_sha256"], r["doc_len"])
        for r in load_catalog(spark, d).collect()
    }
    assert cat(out) == cat(ref)
    for terms in (["the", "data"], [f"seedmark{seed}"]):
        assert _results_by_path(spark, out, terms) == _results_by_path(
            spark, ref, terms
        ), terms


def test_sync_rerun_after_partial_failure(spark, v1, tmp_path):
    """A sync that dies before committing (manifest missing, partial
    files on disk) can simply be re-run into the same out_dir: every
    write is tmp+rename idempotent and the change set is recomputed from
    the immutable parent. The committed result equals a clean sync."""
    corpus, idx1, _ = v1
    src2 = _snapshot2(spark, corpus).cache()

    clean = str(tmp_path / "clean")
    sync_index_dir(spark, idx1, src2, clean)

    crashed = str(tmp_path / "crashed")
    sync_index_dir(spark, idx1, src2, crashed)
    # simulate dying mid-run: drop the manifest, delete some outputs
    os.remove(os.path.join(crashed, "_MANIFEST.json"))
    removed = 0
    for sub in ("posting_lists", "catalog"):
        files = sorted(os.listdir(os.path.join(crashed, sub)))
        for f in files[: len(files) // 2]:
            os.remove(os.path.join(crashed, sub, f))
            removed += 1
    assert removed > 0
    from text_indexer_spark import checkpoint as ckpt

    assert ckpt.read_manifest(crashed) is None  # invisible until commit
    m2 = sync_index_dir(spark, idx1, src2, crashed)
    assert m2["n_docs"] == src2.select("repo", "path").distinct().count()
    for sub in ("postings", "catalog", "posting_lists"):
        a = sorted(os.listdir(os.path.join(clean, sub)))
        b = sorted(os.listdir(os.path.join(crashed, sub)))
        assert a == b, sub
        for f in a:
            assert _file_sha(os.path.join(clean, sub, f)) == _file_sha(
                os.path.join(crashed, sub, f)
            ), (sub, f)


def test_vacuum_versions_retention_and_safety(tmp_path):
    """vacuum keeps the newest keep_last COMMITTED versions, never
    touches uncommitted dirs, and hard-linked shard files shared with a
    surviving version remain readable."""
    import os

    from text_indexer_spark import checkpoint as ckpt
    from text_indexer_spark import storage
    from text_indexer_spark.operators.index_sync import vacuum_versions

    vdir = str(tmp_path / "versions")
    os.makedirs(vdir)
    paths = {}
    for n in (1, 2, 3, 4):
        p = os.path.join(vdir, f"v{n:04d}")
        os.makedirs(p)
        with open(os.path.join(p, "shard.bin"), "wb") as f:
            f.write(b"payload-%d" % n)
        if n != 3:  # v0003 stays UNcommitted (mid-write)
            ckpt.commit_manifest(p, {"version": n})
        paths[n] = p
    # v0004 carries v0002's shard over as a hard link
    linked = os.path.join(paths[4], "carried.bin")
    os.link(os.path.join(paths[2], "shard.bin"), linked)

    removed = vacuum_versions(vdir, keep_last=1)
    assert removed == [paths[1], paths[2]]
    assert not os.path.exists(paths[1]) and not os.path.exists(paths[2])
    assert os.path.isdir(paths[3])  # uncommitted: untouched
    assert os.path.isdir(paths[4])
    with open(linked, "rb") as f:  # link survives the vacuum of v0002
        assert f.read() == b"payload-2"
    # idempotent
    assert vacuum_versions(vdir, keep_last=1) == []


# ---------------------------------------------------- positional variant

@pytest.fixture(scope="module")
def v1p(spark, tmp_path_factory):
    corpus = synthetic_corpus(spark, n_docs=120, avg_tokens=40, n_repos=12).cache()
    idx = str(tmp_path_factory.mktemp("sync_idx_pos") / "v1")
    build_index(corpus, idx, num_shards=8, resume=False, with_positions=True)
    return corpus, idx


def _positions_rel(spark, d):
    """The COMPLETE positional relation {(path-key, term, positions)} —
    the strongest cross-index identity (ids differ between sync and
    rebuild, paths do not)."""
    from text_indexer_spark.operators.codec import decode_posting_positions

    lists = load_posting_lists(spark, d)
    cat = {
        r["doc_id"]: (r["repo"], r["path"])
        for r in load_catalog(spark, d).collect()
    }
    rel = set()
    for row in lists.collect():
        ids, pos, offs = decode_posting_positions(row.asDict())
        for i, did in enumerate(ids):
            rel.add(
                (cat[did], row["term"], tuple(pos[offs[i]:offs[i + 1]].tolist()))
            )
    return rel


@pytest.mark.parametrize("seed", [7, 19])
def test_randomized_positional_sync_equals_rebuild(spark, v1p, tmp_path, seed):
    """Positional indexes: a randomized sync must reproduce the EXACT
    per-posting position lists a fresh positional rebuild produces."""
    corpus, idx1 = v1p
    h = F.pmod(F.xxhash64(F.lit(seed), "repo", "path"), F.lit(20))
    kept = corpus.filter(h != 0)
    src2 = kept.withColumn(
        "content",
        F.when(h == 1, F.concat(F.lit(f"pfx{seed} "), F.col("content"))).otherwise(
            F.col("content")
        ),
    ).withColumn(
        "commit",
        F.when(h == 1, F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)).otherwise(
            F.col("commit")
        ),
    ).unionByName(
        spark.createDataFrame(
            [(f"mm/added-{seed}", "docs/m.txt", f"c{seed}m", "txt",
              f"pfx{seed} the pfx{seed} data pfx{seed}")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    out = str(tmp_path / f"v2p_{seed}")
    m2 = sync_index_dir(spark, idx1, src2, out)
    assert m2["positional"] is True and m2["synced"]["add"] == 1

    ref = str(tmp_path / f"refp_{seed}")
    build_index(src2, ref, num_shards=8, resume=False, with_positions=True)
    assert _positions_rel(spark, out) == _positions_rel(spark, ref)


# ----------------------------------------------------- scoped serving post-sync

@pytest.mark.parametrize("conjunctive", [True, False])
def test_scoped_wand_survives_sync(spark, v1, tmp_path, conjunctive):
    """Incremental sync breaks the (repo, path) ≡ id-order layout (adds
    mint ids above the global max), so a repo scope is no longer one
    interval. The degraded scope_ranges path must keep scoped serving
    EXACT: sync → scoped query ≡ filter-then-rank over the synced index."""
    from text_indexer_spark.operators.wand import scope_ranges

    corpus, idx1, m1 = v1
    # add a new doc to the FIRST repo in sort order: its fresh id lands
    # above every other repo's ids → the scope's id span covers the
    # whole catalog → guaranteed non-contiguous
    target = corpus.select("repo").orderBy("repo").limit(1).collect()[0]["repo"]
    added = spark.createDataFrame(
        [(target, "zzz_added.txt", "c-added", "txt",
          "the data zmarker fresh doc the the data")],
        "repo string, path string, commit string, lang string, content string",
    )
    src2 = corpus.unionByName(added)
    out = str(tmp_path / f"v2scope_{conjunctive}")
    m2 = sync_index_dir(spark, idx1, src2, out)
    assert m2["synced"]["add"] == 1

    lists = load_posting_lists(spark, out)
    cat = load_catalog(spark, out)
    rng = scope_ranges(cat, repo=target)
    assert len(rng) >= 2  # the degraded (multi-interval) path engaged
    in_rng = lambda i: any(lo <= i <= hi for lo, hi in rng)
    scope_ids = {r["doc_id"] for r in cat.filter(F.col("repo") == target).collect()}
    other_ids = {r["doc_id"] for r in cat.filter(F.col("repo") != target).collect()}
    assert all(in_rng(i) for i in scope_ids)
    assert not any(in_rng(i) for i in other_ids)

    for terms in (["the", "data"], ["the"]):
        scoped = wand_topk(
            lists, terms, k=5, round_to=6, scope=rng, conjunctive=conjunctive
        ).collect()
        full = wand_topk(
            lists, terms, k=10**6, round_to=6, global_topk=False,
            conjunctive=conjunctive,
        ).collect()
        want = sorted(
            ((r["score"], r["doc_id"]) for r in full if r["doc_id"] in scope_ids),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        got = [(r["score"], r["doc_id"]) for r in scoped]
        assert got == want, f"terms={terms} conjunctive={conjunctive}"

    # the synced-in doc's interval (above the old max) is actually
    # served: scoping to ONLY the trailing intervals returns it
    added_id = max(scope_ids)
    tail_rng = [(lo, hi) for lo, hi in rng if hi >= added_id]
    hits = wand_topk(
        lists, ["the", "data"], k=5, round_to=6, scope=tail_rng,
        conjunctive=conjunctive,
    ).collect()
    assert added_id in {r["doc_id"] for r in hits}
