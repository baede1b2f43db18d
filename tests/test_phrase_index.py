"""Positional committed index: codec roundtrip, build carry-through,
phrase/proximity served from the index ≡ corpus-level operators."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.index_build import (
    build_index,
    load_catalog,
    load_posting_lists,
)
from text_indexer_spark.operators.phrase import (
    phrase_match,
    phrase_match_index,
    proximity_match,
    proximity_match_index,
)

DOCS = [
    ("a.txt", "the quick brown fox jumps over the lazy dog"),
    ("b.txt", "quick brown dog and a quick brown fox"),
    ("c.txt", "the fox. the brown! quick, quick brown"),
    ("d.txt", "brown quick fox"),
    ("e.txt", "nothing relevant here at all"),
    ("f.txt", "fox quick brown quick fox brown quick brown fox"),
    ("g.txt", "the the the quick quick brown brown fox fox"),
    ("h.txt", ""),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        [("r", p, "c1", "txt", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path_factory.mktemp("pos_idx"))
    build_index(corpus, out, num_shards=3, with_positions=True)
    return corpus, out


def test_positions_roundtrip_random():
    from text_indexer_spark.operators.codec import (
        decode_positions,
        encode_positions_grouped,
    )

    rng = np.random.RandomState(13)
    for _ in range(50):
        tfs = rng.randint(1, 7, size=rng.randint(0, 20)).astype(np.int64)
        pos = [np.sort(rng.choice(5000, size=k, replace=False)) for k in tfs]
        flat = np.concatenate(pos) if len(pos) else np.empty(0, dtype=np.int64)
        buf, per = encode_positions_grouped(flat, tfs)
        dec, offs = decode_positions(buf, tfs)
        assert (dec == flat).all()
        assert offs[-1] == flat.size


def test_build_stores_positions(spark, built):
    corpus, idx = built
    lists = load_posting_lists(spark, idx)
    assert "positions_varbyte" in lists.columns
    assert "block_pos_off" in lists.columns
    # decode the full relation and compare against posexplode ground truth
    import pandas as pd

    rows = lists.toPandas()
    from text_indexer_spark.operators.codec import decode_posting_positions

    got = []
    for _, r in rows.iterrows():
        ids, pos, offs = decode_posting_positions(r)
        for i, d in enumerate(ids):
            for p in pos[offs[i]:offs[i + 1]]:
                got.append((int(d), r["term"], int(p)))
    from text_indexer_spark.operators.phrase import positional_postings

    cat = load_catalog(spark, idx).select("doc_id", "path")
    truth_df = (
        positional_postings(
            corpus.join(cat, "path"), text_col="content", id_col="doc_id"
        )
        .select("doc_id", "term", "pos")
        .collect()
    )
    truth = sorted((r["doc_id"], r["term"], r["pos"]) for r in truth_df)
    assert sorted(got) == truth


PHRASES = [
    ["quick", "brown"],
    ["quick", "brown", "fox"],
    ["the", "quick"],
    ["brown", "quick", "fox"],
    ["quick", "quick"],          # repeated term, distinct slots
    ["the", "the"],
    ["fox", "fox"],
    ["lazy", "dog"],
    ["dog", "lazy"],             # wrong order → no match
    ["zzz"],
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_index_equals_corpus(spark, built, phrase):
    corpus, idx = built
    lists = load_posting_lists(spark, idx)
    cat = load_catalog(spark, idx).select("doc_id", "path")
    docs = corpus.join(cat, "path").select("doc_id", F.col("content").alias("text"))
    want = sorted(r["doc_id"] for r in phrase_match(docs, phrase).collect())
    got = sorted(r["doc_id"] for r in phrase_match_index(lists, phrase).collect())
    assert got == want, phrase


@pytest.mark.parametrize("terms,window", [
    (["quick", "fox"], 3),
    (["quick", "fox"], 2),
    (["the", "dog"], 3),
    (["the", "dog"], 9),
    (["quick", "brown", "fox"], 4),
    (["quick", "brown", "fox"], 3),
    (["fox", "lazy"], 2),
    (["zzz", "fox"], 5),
])
def test_proximity_index_equals_corpus(spark, built, terms, window):
    corpus, idx = built
    lists = load_posting_lists(spark, idx)
    cat = load_catalog(spark, idx).select("doc_id", "path")
    docs = corpus.join(cat, "path").select("doc_id", F.col("content").alias("text"))
    want = sorted(r["doc_id"] for r in proximity_match(docs, terms, window).collect())
    got = sorted(
        r["doc_id"] for r in proximity_match_index(lists, terms, window).collect()
    )
    assert got == want, (terms, window)


def test_non_positional_index_raises(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        [("r", "x.txt", "c", "t", "quick brown fox")],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path_factory.mktemp("plain_idx"))
    build_index(corpus, out, num_shards=1)
    lists = load_posting_lists(spark, out)
    with pytest.raises(ValueError, match="positional"):
        phrase_match_index(lists, ["quick", "brown"])


def test_tf_only_build_unchanged_by_flag(spark, tmp_path_factory):
    """with_positions=False produces byte-identical lists to before the
    feature existed: the shared columns of a positional build also match
    the tf-only build exactly."""
    corpus = spark.createDataFrame(
        [("r", p, "c1", "txt", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, content string",
    )
    a = str(tmp_path_factory.mktemp("idx_a"))
    b = str(tmp_path_factory.mktemp("idx_b"))
    build_index(corpus, a, num_shards=3)
    build_index(corpus, b, num_shards=3, with_positions=True)
    la = load_posting_lists(spark, a).toPandas().sort_values(["shard_id", "term"])
    lb = load_posting_lists(spark, b).toPandas().sort_values(["shard_id", "term"])
    for c in la.columns:
        assert list(la[c]) == list(lb[c]), c


# ----------------------------------------------------- positional merge

def test_merge_carries_positions(spark, built):
    """Term-major splice of positional shards decodes to the identical
    (doc, term, positions) relation."""
    from text_indexer_spark.operators.codec import decode_posting_positions
    from text_indexer_spark.operators.merge import (
        decode_merged_positions,
        merge_term_major,
    )

    corpus, idx = built
    lists = load_posting_lists(spark, idx)
    merged = merge_term_major(lists).toPandas()
    assert "positions_varbyte" in merged.columns

    truth = {}
    for _, r in lists.toPandas().iterrows():
        ids, pos, offs = decode_posting_positions(r)
        for i, d in enumerate(ids):
            truth.setdefault(r["term"], {})[int(d)] = pos[offs[i]:offs[i + 1]].tolist()

    for _, r in merged.iterrows():
        ids, tfs, pos, offs = decode_merged_positions(r)
        assert list(ids) == sorted(ids), r["term"]  # globally sorted
        got = {int(d): pos[offs[i]:offs[i + 1]].tolist() for i, d in enumerate(ids)}
        assert got == truth[r["term"]], r["term"]


def test_merge_reencode_path_with_positions(spark):
    """Interleaved chunk ranges (the synced-index shape) force the
    decode→merge-sort→re-encode path; positions must survive it."""
    import numpy as np
    import pandas as pd

    from text_indexer_spark.operators.codec import (
        encode_positions_grouped,
        encode_posting_list,
    )
    from text_indexer_spark.operators.merge import (
        decode_merged_positions,
        merge_term_major,
    )

    def mk_row(shard, ids, tfs, pos_lists):
        enc = encode_posting_list(
            np.array(ids), np.array(tfs), np.zeros(len(ids))
        )
        flat = np.concatenate([np.array(p) for p in pos_lists])
        buf, per = encode_positions_grouped(flat, np.array(tfs))
        csum = np.concatenate([[0], np.cumsum(per)])
        enc["positions_varbyte"] = buf
        enc["block_pos_off"] = [0]
        enc["term"] = "t"
        enc["shard_id"] = shard
        return enc

    # chunk A holds docs {1, 9}, chunk B docs {4, 12} — ranges interleave
    rows = [
        mk_row(0, [1, 9], [2, 1], [[0, 5], [3]]),
        mk_row(1, [4, 12], [1, 3], [[7], [1, 2, 8]]),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    merged = merge_term_major(df).toPandas()
    assert len(merged) == 1 and int(merged["n_chunks"].iloc[0]) == 1
    ids, tfs, pos, offs = decode_merged_positions(merged.iloc[0])
    assert ids.tolist() == [1, 4, 9, 12]
    got = {int(d): pos[offs[i]:offs[i + 1]].tolist() for i, d in enumerate(ids)}
    assert got == {1: [0, 5], 4: [7], 9: [3], 12: [1, 2, 8]}


# ------------------------------------------------------ positional sync

def test_sync_preserves_positions(spark, tmp_path):
    """Incremental sync of a positional index: phrase results on the
    synced index ≡ phrase results on a fresh positional rebuild of the
    same snapshot (compared by path — ids may differ for adds)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_sync import sync_index_dir

    corpus = synthetic_corpus(spark, n_docs=60, avg_tokens=30, n_repos=6).cache()
    idx1 = str(tmp_path / "v1")
    build_index(corpus, idx1, num_shards=4, resume=False, with_positions=True)

    # change set: drop one repo's docs, modify others, add a phrase doc
    target = corpus.select("repo").orderBy("repo").limit(1).collect()[0]["repo"]
    kept = corpus.filter(
        (F.col("repo") != target) | (F.pmod(F.xxhash64("path"), F.lit(3)) != 0)
    )
    modified = kept.withColumn(
        "content",
        F.when(
            F.col("repo") == target,
            F.concat(F.lit("alpha beta gamma "), F.col("content")),
        ).otherwise(F.col("content")),
    ).withColumn(
        "commit",
        F.when(
            F.col("repo") == target,
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256),
        ).otherwise(F.col("commit")),
    )
    added = spark.createDataFrame(
        [("zz/new", "p/new.txt", "c9", "txt", "gamma beta alpha beta gamma")],
        "repo string, path string, commit string, lang string, content string",
    )
    src2 = modified.unionByName(added).cache()

    out = str(tmp_path / "v2")
    m2 = sync_index_dir(spark, idx1, src2, out)
    assert m2["positional"] is True

    ref = str(tmp_path / "ref")
    build_index(src2, ref, num_shards=4, resume=False, with_positions=True)

    def phrase_paths(d, phrase):
        lists = load_posting_lists(spark, d)
        cat = load_catalog(spark, d).select("doc_id", "repo", "path")
        ids = phrase_match_index(lists, phrase)
        return sorted(
            (r["repo"], r["path"])
            for r in cat.join(ids, "doc_id", "semi").collect()
        )

    for phrase in (["alpha", "beta"], ["beta", "gamma"],
                   ["alpha", "beta", "gamma"], ["gamma", "beta"]):
        assert phrase_paths(out, phrase) == phrase_paths(ref, phrase), phrase
    # the synced-in doc is phrase-searchable
    assert ("zz/new", "p/new.txt") in phrase_paths(out, ["alpha", "beta", "gamma"])


def test_resume_rejects_layout_flip(spark, tmp_path):
    """A resumed build must be started with the same layout flags the
    checkpoint was written with — a silent flip would mix positional and
    tf-only shard schemas in one index."""
    corpus = spark.createDataFrame(
        [("r", p, "c1", "txt", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path / "idx")
    build_index(corpus, out, num_shards=2, with_positions=True)
    with pytest.raises(ValueError, match="resume mismatch"):
        build_index(corpus, out, num_shards=2, with_positions=False)
    # same flags resume fine (no-op: everything checkpointed)
    m = build_index(corpus, out, num_shards=2, with_positions=True)
    assert m["positional"] is True
