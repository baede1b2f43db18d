"""Persisted-index build + block-max query path: differential vs the
uncompressed DataFrame scorer and the numpy oracle; resume; metrics;
sha256 verification."""

from __future__ import annotations

import glob
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
from text_indexer_spark.operators.postings import build_catalog, build_postings, term_stats
from text_indexer_spark.operators.search import bm25_topk
from text_indexer_spark.operators.wand import wand_topk
from text_indexer_spark.oracle import OracleIndex

QUERIES = [
    ["the", "data"],
    ["spark", "index", "query"],
    ["theta"],
    ["the"],
    ["alpha", "beta", "gamma"],
    ["zzz_missing"],
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    corpus = synthetic_corpus(spark, n_docs=300, avg_tokens=80).cache()
    manifest = build_index(corpus, index_dir, num_shards=6)
    return corpus, index_dir, manifest


def test_manifest_and_layout(built):
    corpus, index_dir, manifest = built
    assert manifest["n_docs"] == 300
    assert manifest["num_shards"] == 6
    assert ckpt.read_manifest(index_dir) is not None
    assert len(glob.glob(os.path.join(index_dir, "posting_lists", "*.parquet"))) == 6
    assert len(ckpt.done_shards(index_dir, "postings")) == 6
    assert len(ckpt.done_shards(index_dir, "lists")) == 6


def _engine_to_dense(spark, index_dir, dense_catalog) -> dict:
    """Engine (stride) id → DataFrame-level dense id, joined on the
    (repo, path) key. Both id schemes rank docs in the SAME (repo,
    path) order, so the map is monotone and rank results line up 1:1."""
    eng = load_catalog(spark, index_dir).select(
        F.col("doc_id").alias("eng_id"), "repo", "path"
    )
    dense = dense_catalog.select("doc_id", "repo", "path")
    return {
        r["eng_id"]: r["doc_id"]
        for r in eng.join(dense, ["repo", "path"]).collect()
    }


def test_wand_matches_dataframe_scorer_and_oracle(spark, built):
    corpus, index_dir, _ = built
    lists = load_posting_lists(spark, index_dir).cache()
    catalog = build_catalog(corpus).cache()
    postings = build_postings(catalog)
    stats = term_stats(postings)
    idmap = _engine_to_dense(spark, index_dir, catalog)
    oracle = OracleIndex()
    for r in catalog.select("doc_id", "content").collect():
        oracle.add(r["doc_id"], r["content"])
    for terms in QUERIES:
        wand = wand_topk(lists, terms, k=10).collect()
        plain = bm25_topk(postings, catalog, stats, terms, k=10, round_to=None).collect()
        exp = oracle.bm25_topk(terms, k=10)
        assert [idmap[r["doc_id"]] for r in wand] == [
            r["doc_id"] for r in plain
        ] == [d for d, _ in exp], terms
        for w_row, (_, s) in zip(wand, exp):
            assert w_row["score"] == pytest.approx(s, abs=1e-9)


def test_metrics_and_skew_logged(spark, built):
    _, index_dir, _ = built
    metrics = spark.read.parquet(os.path.join(index_dir, "metrics"))
    rows = metrics.collect()
    a = [r for r in rows if "tokenize_sec" in r.asDict() and r.asDict().get("tokenize_sec") is not None]
    c = [r for r in rows if r.asDict().get("skew_ratio") is not None]
    assert a and c
    # Zipf vocabulary → hottest term well above the mean df
    assert max(r["skew_ratio"] for r in c) > 2.0
    assert all(r["postings_per_sec"] > 0 for r in rows)


def test_resume_skips_done_shards_and_is_identical(spark, built, tmp_path):
    corpus, index_dir, _ = built
    lists_before = {
        (r["shard_id"], r["term"]): (r["df"], bytes(r["doc_ids_delta_varbyte"]))
        for r in load_posting_lists(spark, index_dir).collect()
    }
    # simulate a build killed after shard 0-3 of stage C: drop manifest,
    # two list shards and their markers
    os.remove(os.path.join(index_dir, "_MANIFEST.json"))
    for s in (4, 5):
        os.remove(os.path.join(index_dir, "posting_lists", f"shard_{s:05d}.parquet"))
        os.remove(ckpt.marker_path(index_dir, "lists", s))
    kept = os.path.join(index_dir, "posting_lists", "shard_00000.parquet")
    mtime_before = os.path.getmtime(kept)

    manifest = build_index(corpus, index_dir, num_shards=6, resume=True)
    assert manifest["n_docs"] == 300
    # untouched shard file was not rewritten
    assert os.path.getmtime(kept) == mtime_before
    lists_after = {
        (r["shard_id"], r["term"]): (r["df"], bytes(r["doc_ids_delta_varbyte"]))
        for r in load_posting_lists(spark, index_dir).collect()
    }
    assert lists_before == lists_after


def test_sha256_mismatch_fails_build(spark, tmp_path):
    corpus = synthetic_corpus(spark, n_docs=20, avg_tokens=10).withColumn(
        "content_sha256", F.lit("0" * 64)
    )
    with pytest.raises(ValueError, match="sha256 verification failed"):
        build_index(corpus, str(tmp_path / "bad"), num_shards=2, verify_sha=True)


def test_catalog_loadable(spark, built):
    _, index_dir, manifest = built
    cat = load_catalog(spark, index_dir)
    assert cat.count() == manifest["n_docs"]
    assert "content" not in cat.columns


def test_wand_batch_matches_single(spark, built):
    from text_indexer_spark.operators.wand import wand_topk_batch

    corpus, index_dir, _ = built
    lists = load_posting_lists(spark, index_dir)
    batch = {f"q{i}": terms for i, terms in enumerate(QUERIES)}
    got = wand_topk_batch(lists, batch, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for i, terms in enumerate(QUERIES):
        single = [(r["doc_id"], r["score"]) for r in wand_topk(lists, terms, k=10).collect()]
        assert by_q.get(f"q{i}", []) == single, terms


def test_wand_or_mode_matches_oracle(spark, built):
    """Disjunctive WAND (any-term match) vs DataFrame scorer and oracle."""
    from text_indexer_spark.operators.search import bm25_topk as df_topk

    corpus, index_dir, _ = built
    lists = load_posting_lists(spark, index_dir)
    catalog = build_catalog(corpus).cache()
    postings = build_postings(catalog)
    stats = term_stats(postings)
    idmap = _engine_to_dense(spark, index_dir, catalog)
    oracle = OracleIndex()
    for r in catalog.select("doc_id", "content").collect():
        oracle.add(r["doc_id"], r["content"])
    for terms in (["the", "zzz_missing"], ["alpha", "beta", "gamma"], ["theta"]):
        wand = wand_topk(lists, terms, k=10, conjunctive=False).collect()
        plain = df_topk(postings, catalog, stats, terms, k=10,
                        conjunctive=False, round_to=None).collect()
        exp = oracle.bm25_topk(terms, k=10, conjunctive=False)
        assert [idmap[r["doc_id"]] for r in wand] == [
            r["doc_id"] for r in plain
        ] == [d for d, _ in exp], terms
        for w_row, (_, s) in zip(wand, exp):
            assert w_row["score"] == pytest.approx(s, abs=1e-9)


def test_route_tokens_cover_all_slots(spark):
    """Collision-free shard->partition routing: every shard id gets a
    token hashing to its own exchange slot."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.index_build import _route_tokens

    for n in (1, 7, 64, 256):
        route = _route_tokens(spark, n)
        assert len(route) == n
        slots = (
            spark.createDataFrame([(t,) for t in route], "tok int")
            .select(F.pmod(F.hash("tok"), F.lit(n)).alias("slot"))
            .collect()
        )
        assert sorted(r["slot"] for r in slots) == list(range(n))


def test_local_murmur3_matches_jvm_hash(spark):
    """_murmur3_hash_int (driver-local routing, zero Spark jobs) must be
    bit-identical to the JVM's F.hash on an int column for positive and
    negative inputs."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.index_build import _murmur3_hash_int

    vals = list(range(0, 2000)) + [-1, -7, 2**31 - 1, -(2**31)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v int")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    for r in rows:
        # mod-2^32 arithmetic makes the signed and unsigned renderings
        # of the same 32-bit pattern hash identically
        assert _murmur3_hash_int(r["v"]) == r["h"], r["v"]
        assert _murmur3_hash_int(r["v"] & 0xFFFFFFFF) == r["h"], r["v"]


def test_boundaries_monotone_and_sharding_deterministic(spark):
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import (
        _compute_boundaries,
        _shard_of_udf,
    )

    corpus = synthetic_corpus(spark, n_docs=200, avg_tokens=5)
    b1 = _compute_boundaries(corpus, 16)
    b2 = _compute_boundaries(corpus, 16)
    assert b1 == b2  # deterministic: pure function of the data
    assert b1 == sorted(b1) and len(b1) == len(set(b1))
    shard_of = _shard_of_udf(b1)
    pids = (
        corpus.select("repo", "path")
        .withColumn("pid", shard_of("repo", "path"))
        .orderBy("repo", "path")
        .collect()
    )
    seq = [r["pid"] for r in pids]
    assert seq == sorted(seq)  # monotone in (repo, path) order
    assert 0 <= min(seq) and max(seq) <= len(b1)


def test_build_more_shards_than_docs(spark, tmp_path):
    """Degenerate sharding: num_shards >> docs must still build a
    correct, committed index (empty shards simply produce no files)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index, load_catalog

    corpus = synthetic_corpus(spark, n_docs=5, avg_tokens=6)
    idx = str(tmp_path / "tiny_idx")
    # dense_ids mode: gapless 0..N-1 via the counting pass
    m = build_index(corpus, idx, num_shards=32, resume=False, dense_ids=True)
    assert m["n_docs"] == 5
    cat = load_catalog(spark, idx)
    assert cat.count() == 5
    ids = sorted(r["doc_id"] for r in cat.select("doc_id").collect())
    assert ids == list(range(5))


def test_driver_block_pruning_rank_identical(spark, built):
    """Force multi-chunk driver processing (1-block chunks) so the
    θ-based block pruning actually fires, and assert results stay
    identical to the unpruned path for every query incl.
    stop-word-heavy ones. The chunk size rides the pickled closure so it
    reaches executor processes."""
    corpus, index_dir, _ = built
    lists = load_posting_lists(spark, index_dir).cache()
    baseline = {}
    for terms in QUERIES:
        baseline[tuple(terms)] = [
            (r["doc_id"], r["score"])
            for r in wand_topk(lists, terms, k=10).collect()
        ]
    for terms in QUERIES:
        pruned = [
            (r["doc_id"], r["score"])
            for r in wand_topk(lists, terms, k=10, driver_chunk_blocks=1).collect()
        ]
        assert pruned == baseline[tuple(terms)], terms


def test_build_duplicate_heavy_corpus(spark, tmp_path):
    """Hot-key stress: many duplicate (repo, path) rows (which MUST
    co-locate) mixed with unique docs. Dedup keeps the greatest
    (commit, content) row per key; doc ids stay dense."""
    from pyspark.sql import functions as F

    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index, load_catalog

    base = synthetic_corpus(spark, n_docs=40, avg_tokens=8)
    # 15 stale versions of ONE key + 1 winning version (greatest commit)
    dup = (
        base.limit(1)
        .crossJoin(spark.range(16).withColumnRenamed("id", "v"))
        .select(
            "repo", "path",
            F.concat(F.lit("commit-"), F.lpad(F.col("v").cast("string"), 3, "0")).alias("commit"),
            "lang",
            F.concat(F.lit("version "), F.col("v").cast("string"), F.lit(" body")).alias("content"),
        )
    )
    corpus = base.filter(F.xxhash64("path") % 2 == 0).unionByName(
        dup.select("repo", "path", "commit", "lang", "content")
    )
    idx = str(tmp_path / "dup_idx")
    m = build_index(corpus, idx, num_shards=4, resume=False)
    cat = load_catalog(spark, idx)
    n_keys = corpus.select("repo", "path").distinct().count()
    assert m["n_docs"] == n_keys
    assert cat.count() == n_keys
    # default (stride) ids: unique, and id order == (repo, path) order
    rows = cat.select("doc_id", "repo", "path").collect()
    assert len({r["doc_id"] for r in rows}) == n_keys
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"]))
    assert [r["doc_id"] for r in by_key] == sorted(r["doc_id"] for r in rows)
    # the surviving duplicate is the greatest (commit, ...) version
    win = cat.filter(F.col("commit").startswith("commit-")).collect()
    assert len(win) == 1 and win[0]["commit"] == "commit-015"


def test_build_with_null_keys_no_id_collision(spark, tmp_path):
    """Rows with NULL repo/path must not break doc-id accounting: they
    normalize to "" and get unique ids like everyone else (previously
    countDistinct excluded NULL keys from sizing while stage A still
    assigned them ids → cross-shard collisions)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index, load_catalog

    base = synthetic_corpus(spark, n_docs=40, avg_tokens=10, n_repos=4)
    nulls = spark.createDataFrame(
        [
            (None, "orphan/a.txt", "c1", "txt", "null repo content alpha"),
            ("rr/x", None, "c2", "txt", "null path content beta"),
            (None, None, "c3", "txt", "fully null key content gamma"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = str(tmp_path / "nullidx")
    build_index(base.unionByName(nulls), idx, num_shards=4, resume=False)
    cat = load_catalog(spark, idx)
    ids = [r["doc_id"] for r in cat.select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == 43
    # normalized keys present
    assert cat.filter((F.col("repo") == "") & (F.col("path") == "orphan/a.txt")).count() == 1
    assert cat.filter((F.col("repo") == "rr/x") & (F.col("path") == "")).count() == 1


# ------------------------------------------------------------- scoped serving

def test_scope_ranges_interval_is_exact(spark, built):
    """Layout invariant: a repo (or repo+path-prefix) scope occupies one
    contiguous doc-id interval — every catalog id inside the interval
    belongs to the scope."""
    from text_indexer_spark.operators.wand import scope_ranges

    corpus, index_dir, manifest = built
    cat = load_catalog(spark, index_dir)
    rng = scope_ranges(cat, repo="org/repo-3")
    assert len(rng) == 1
    lo, hi = rng[0]
    inside = cat.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
    assert inside.filter(F.col("repo") != "org/repo-3").count() == 0
    assert inside.count() == cat.filter(F.col("repo") == "org/repo-3").count()
    # empty scope → no ranges
    assert scope_ranges(cat, repo="org/none") == []


def test_scope_ranges_degrades_to_interval_list(spark):
    from text_indexer_spark.operators.wand import scope_ranges

    # repo 'a' at ids 0,1 then a FOREIGN id 2 inside the would-be
    # interval 0..3 (the synced-in-docs shape): the degraded path must
    # split around the intruder instead of raising
    cat = spark.createDataFrame(
        [(0, "a", "x"), (1, "a", "y"), (2, "b", "z"), (3, "a", "w")],
        "doc_id long, repo string, path string",
    )
    rng = scope_ranges(cat, repo="a")
    # exactness: covers ids {0,1,3}, excludes id 2 (interval count may
    # vary with partition seams)
    covered = {i for lo, hi in rng for i in range(lo, hi + 1)}
    assert covered == {0, 1, 3}
    # the fragment cap still guards runaway drift
    with pytest.raises(ValueError, match="merge or rebuild"):
        scope_ranges(cat, repo="a", max_intruders=1)


def test_scope_ranges_degraded_excludes_all_foreign_ids(spark):
    """Many interleaved foreign ids + scope docs minted above max (the
    post-sync catalog shape): intervals contain every scope id and no
    existing foreign id."""
    from text_indexer_spark.operators.wand import scope_ranges

    rows = []
    for i in range(200):
        rows.append((i, "mid" if i % 7 in (2, 3) else "other", f"p{i}"))
    # synced-in adds for repo 'mid' above the old max, non-adjacent
    rows += [(1000, "mid", "new1"), (1002, "mid", "new2")]
    # and a foreign synced-in add between them
    rows += [(1001, "zzz", "newz")]
    cat = spark.createDataFrame(rows, "doc_id long, repo string, path string")
    rng = scope_ranges(cat, repo="mid")
    want = {i for i in range(200) if i % 7 in (2, 3)} | {1000, 1002}
    covered = {i for lo, hi in rng for i in range(lo, hi + 1)}
    existing = {r[0] for r in rows}
    assert want <= covered
    assert covered & existing == want  # no existing foreign id covered


@pytest.mark.parametrize("conjunctive", [True, False])
def test_wand_scoped_equals_filter_then_rank(spark, built, conjunctive):
    """Scoped top-k ≡ unscoped candidates filtered to the scope, re-cut
    — the block-pruned path must change cost, never results."""
    from text_indexer_spark.operators.wand import scope_ranges

    corpus, index_dir, manifest = built
    lists = load_posting_lists(spark, index_dir)
    cat = load_catalog(spark, index_dir)
    rng = scope_ranges(cat, repo="org/repo-3")
    lo, hi = rng[0]
    for terms in (["the", "data"], ["the"], ["spark", "index", "query"]):
        scoped = wand_topk(
            lists, terms, k=5, round_to=6, scope=rng, conjunctive=conjunctive
        ).collect()
        full = wand_topk(
            lists, terms, k=10**6, round_to=6, global_topk=False,
            conjunctive=conjunctive,
        ).collect()
        want = sorted(
            ((r["score"], r["doc_id"]) for r in full if lo <= r["doc_id"] <= hi),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        got = [(r["score"], r["doc_id"]) for r in scoped]
        assert got == want, f"terms={terms} conjunctive={conjunctive}"


def test_wand_scoped_empty_scope(spark, built):
    corpus, index_dir, manifest = built
    lists = load_posting_lists(spark, index_dir)
    assert wand_topk(lists, ["the"], k=5, scope=[]).count() == 0
