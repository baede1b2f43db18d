"""Index optimization (compaction): after any mix of incremental syncs,
``optimize_index`` must restore the bulk build's doc-id layout EXACTLY —
the optimized index is compared list-for-list against a from-scratch
rebuild over the same shard boundaries — and restore the contiguous
scoped-serving fast path, all without re-tokenizing a single document."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from text_indexer_spark import checkpoint as ckpt
from text_indexer_spark.corpus import synthetic_corpus
from text_indexer_spark.operators.index_build import (
    build_index,
    load_catalog,
    load_posting_lists,
)
from text_indexer_spark.operators.index_optimize import optimize_index
from text_indexer_spark.operators.index_sync import sync_index_dir
from text_indexer_spark.operators.wand import scope_ranges, wand_topk


def _file_sha(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


@pytest.fixture(scope="module")
def v1(spark, tmp_path_factory):
    corpus = synthetic_corpus(spark, n_docs=120, avg_tokens=40, n_repos=12).cache()
    idx = str(tmp_path_factory.mktemp("opt_idx") / "v1")
    m = build_index(corpus, idx, num_shards=8, resume=False)
    return corpus, idx, m


def _snapshot2(spark, corpus, seed=5):
    """Scattered deletes + modifies + adds (same recipe as the sync
    differentials) — adds land at BOTH ends of the key range so several
    shards end up with out-of-range ids."""
    h = F.pmod(F.xxhash64(F.lit(seed), "repo", "path"), F.lit(20))
    kept = corpus.filter(h != 0)
    src2 = kept.withColumn(
        "content",
        F.when(h == 1, F.concat(F.col("content"), F.lit(f" optmark{seed}"))).otherwise(
            F.col("content")
        ),
    ).withColumn(
        "commit",
        F.when(h == 1, F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)).otherwise(
            F.col("commit")
        ),
    )
    added = spark.createDataFrame(
        [
            (f"aa/opt-{seed}", "docs/a.txt", f"o{seed}a", "txt",
             f"optmark{seed} alpha the data"),
            (f"zz/opt-{seed}", "docs/z.txt", f"o{seed}z", "txt",
             f"optmark{seed} omega join merge"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    return src2.unionByName(added)


def _build_with_boundaries(spark, src, ref_dir, template_dir, **kw):
    """Fresh build forced onto the SAME shard boundaries the committed
    index uses (pre-seeding the boundary checkpoint engages the resume
    path) — the precondition for id-level equality with optimize."""
    nb, bounds = ckpt.read_boundaries(template_dir)
    cfg = ckpt.read_build_config(template_dir) or {}
    ckpt.write_boundaries(ref_dir, nb, bounds, config=cfg)
    return build_index(src, ref_dir, num_shards=nb, resume=True, **kw)


def test_optimize_equals_fresh_build(spark, v1, tmp_path):
    """The headline differential: sync → optimize ≡ from-scratch build,
    down to doc ids, baked BM25 weights and compressed-list bytes."""
    corpus, idx1, _ = v1
    src2 = _snapshot2(spark, corpus).cache()
    synced = str(tmp_path / "v2")
    m2 = sync_index_dir(spark, idx1, src2, synced)
    assert m2["synced"]["add"] == 2 and m2["synced"]["remove"] > 0

    opt = str(tmp_path / "v3")
    m3 = optimize_index(spark, synced, opt)
    assert m3["optimized"] is True
    assert m3["version"] == m2["version"] + 1
    assert m3["n_docs"] == m2["n_docs"]

    ref = str(tmp_path / "ref")
    _build_with_boundaries(spark, src2, ref, synced)

    # catalog: EXACT rows including doc ids
    cat = lambda d: sorted(
        map(tuple, load_catalog(spark, d).collect())
    )
    assert cat(opt) == cat(ref)

    # compressed lists: every column equal, term for term — this is
    # content-level byte equality of the storage tier
    cols = ["term", "df", "doc_ids_delta_varbyte", "tfs_varbyte",
            "weights_f64", "block_last_id", "block_max_tf", "block_max_w"]
    lists = lambda d: sorted(
        (tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else
               (tuple(v) if isinstance(v, list) else v) for v in r)
         for r in load_posting_lists(spark, d).select(*cols).collect())
    )
    assert lists(opt) == lists(ref)

    # and the shard FILES themselves are byte-identical (parquet writes
    # here are deterministic — the sync rerun test relies on the same)
    for sub in ("posting_lists", "catalog"):
        a_files = sorted(os.listdir(os.path.join(ref, sub)))
        b_files = sorted(os.listdir(os.path.join(opt, sub)))
        assert a_files == b_files, sub
        for f in a_files:
            assert _file_sha(os.path.join(ref, sub, f)) == _file_sha(
                os.path.join(opt, sub, f)
            ), (sub, f)


def test_optimize_restores_contiguous_scopes(spark, v1, tmp_path):
    """Sync fragments a repo's id span (degraded multi-interval scope);
    optimize must bring every repo back to ONE contiguous interval and
    keep scoped results exact."""
    corpus, idx1, _ = v1
    target = corpus.select("repo").orderBy("repo").limit(1).collect()[0]["repo"]
    added = spark.createDataFrame(
        [(target, "zzz_added.txt", "c-added", "txt",
          "the data fresh doc the the data")],
        "repo string, path string, commit string, lang string, content string",
    )
    src2 = corpus.unionByName(added)
    synced = str(tmp_path / "v2s")
    sync_index_dir(spark, idx1, src2, synced)
    assert len(scope_ranges(load_catalog(spark, synced), repo=target)) >= 2

    opt = str(tmp_path / "v3s")
    optimize_index(spark, synced, opt)
    cat = load_catalog(spark, opt)
    for r in cat.select("repo").distinct().collect():
        rng = scope_ranges(cat, repo=r["repo"])
        assert len(rng) == 1, r["repo"]

    # scoped query over the optimized index ≡ filter-then-rank
    lists = load_posting_lists(spark, opt)
    rng = scope_ranges(cat, repo=target)
    scope_ids = {r["doc_id"] for r in cat.filter(F.col("repo") == target).collect()}
    scoped = wand_topk(lists, ["the", "data"], k=5, round_to=6, scope=rng).collect()
    full = wand_topk(
        lists, ["the", "data"], k=10**6, round_to=6, global_topk=False
    ).collect()
    want = sorted(
        ((r["score"], r["doc_id"]) for r in full if r["doc_id"] in scope_ids),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["score"], r["doc_id"]) for r in scoped] == want


def test_optimize_positional(spark, tmp_path):
    """Positional payloads ride through the rewrite untouched: the
    optimized positional index serves the exact per-posting position
    lists a fresh positional rebuild would."""
    corpus = synthetic_corpus(spark, n_docs=80, avg_tokens=30, n_repos=8).cache()
    idx1 = str(tmp_path / "p1")
    build_index(corpus, idx1, num_shards=4, resume=False, with_positions=True)
    src2 = _snapshot2(spark, corpus, seed=9).cache()
    synced = str(tmp_path / "p2")
    m2 = sync_index_dir(spark, idx1, src2, synced)
    assert m2["positional"] is True

    opt = str(tmp_path / "p3")
    m3 = optimize_index(spark, synced, opt)
    assert m3["positional"] is True

    ref = str(tmp_path / "pref")
    _build_with_boundaries(spark, src2, ref, synced, with_positions=True)

    from text_indexer_spark.operators.codec import decode_posting_positions

    def positions_rel(d):
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

    assert positions_rel(opt) == positions_rel(ref)
    # ids too: catalog rows exactly equal
    cat = lambda d: sorted(map(tuple, load_catalog(spark, d).collect()))
    assert cat(opt) == cat(ref)


def test_optimize_dense_ids(spark, tmp_path):
    """dense_ids mode: sync breaks the gapless 0..N-1 property; optimize
    restores it (offsets cumulated from lineage markers, no data scan)."""
    corpus = synthetic_corpus(spark, n_docs=60, avg_tokens=25, n_repos=6).cache()
    idx1 = str(tmp_path / "d1")
    build_index(corpus, idx1, num_shards=4, resume=False, dense_ids=True)
    src2 = _snapshot2(spark, corpus, seed=13).cache()
    synced = str(tmp_path / "d2")
    m2 = sync_index_dir(spark, idx1, src2, synced)
    ids = sorted(r["doc_id"] for r in load_catalog(spark, synced).collect())
    assert ids != list(range(len(ids)))  # fragmented by the sync

    opt = str(tmp_path / "d3")
    m3 = optimize_index(spark, synced, opt)
    assert m3["dense_ids"] is True
    ids = sorted(r["doc_id"] for r in load_catalog(spark, opt).collect())
    assert ids == list(range(len(ids)))  # gapless again
    assert len(ids) == m2["n_docs"]

    ref = str(tmp_path / "dref")
    _build_with_boundaries(spark, src2, ref, synced, dense_ids=True)
    cat = lambda d: sorted(map(tuple, load_catalog(spark, d).collect()))
    assert cat(opt) == cat(ref)


def test_optimize_fresh_index_is_identity(spark, v1, tmp_path):
    """Optimizing an index that already satisfies the build invariant
    changes nothing: catalog and lists come out byte-identical."""
    _, idx1, _ = v1
    opt = str(tmp_path / "vnoop")
    optimize_index(spark, idx1, opt)
    for sub in ("posting_lists", "catalog"):
        for f in sorted(os.listdir(os.path.join(idx1, sub))):
            assert _file_sha(os.path.join(idx1, sub, f)) == _file_sha(
                os.path.join(opt, sub, f)
            ), (sub, f)
