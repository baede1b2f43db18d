"""Term-major salted merge: splice of pre-encoded shard chunks must
decode to exactly the union of shard postings, in global doc-id order."""

from __future__ import annotations

import pytest

from text_indexer_spark.corpus import synthetic_corpus
from text_indexer_spark.operators.codec import decode_posting_list
from text_indexer_spark.operators.index_build import build_index, load_posting_lists
from text_indexer_spark.operators.merge import decode_merged, merge_term_major, term_major_stats


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("merge_idx"))
    corpus = synthetic_corpus(spark, 250, avg_tokens=60)
    build_index(corpus, idx, num_shards=5)
    lists = load_posting_lists(spark, idx).cache()
    return lists, merge_term_major(lists).cache()


def test_merged_equals_union_of_shards(merged):
    lists, m = merged
    # expected: per term, union of decoded shard lists
    exp: dict[str, list] = {}
    for row in lists.collect():
        d = row.asDict()
        ids, tfs, ws = decode_posting_list(
            {
                "df": d["df"],
                "doc_ids_delta_varbyte": bytes(d["doc_ids_delta_varbyte"]),
                "tfs_varbyte": bytes(d["tfs_varbyte"]),
                "weights_f64": bytes(d["weights_f64"]),
                "block_id_off": list(d["block_id_off"]),
            }
        )
        exp.setdefault(d["term"], []).extend(zip(ids, tfs, ws))
    for t in exp:
        exp[t].sort()

    got_rows = m.collect()
    assert {r["term"] for r in got_rows} == set(exp)
    for row in got_rows:
        d = row.asDict()
        d["doc_ids_delta_varbyte"] = bytes(d["doc_ids_delta_varbyte"])
        d["tfs_varbyte"] = bytes(d["tfs_varbyte"])
        d["weights_f64"] = bytes(d["weights_f64"])
        ids, tfs, ws = decode_merged(d)
        got = list(zip(ids, tfs, ws))
        assert got == exp[d["term"]], d["term"]
        # globally sorted, no duplicates
        assert list(ids) == sorted(set(ids))
        assert d["df"] == len(ids)


def test_merge_shuffle_rows_capped_by_shards(merged):
    """The skew cap: the hottest term contributes num_shards chunk rows
    to the merge shuffle, never df rows."""
    lists, m = merged
    assert m.agg({"n_chunks": "max"}).first()[0] <= 5


def test_term_major_stats(merged):
    _, m = merged
    rows = term_major_stats(m).collect()
    assert all(r["bytes_per_posting"] < 4.0 for r in rows)  # well under raw 16B
    assert all(r["df"] > 0 for r in rows)


def test_merge_handles_interleaved_chunk_ranges(spark):
    """A SYNCED index can hold added docs with ids above the global max
    in ANY shard, so chunk doc-id ranges may interleave. The merge must
    detect the overlap and produce a correctly sorted global list
    (re-encode fallback), while disjoint terms keep the pure byte
    splice (n_chunks preserved)."""
    import numpy as np
    import pandas as pd

    from text_indexer_spark.operators.codec import encode_posting_list

    def chunk(term, shard, ids):
        ids = np.asarray(ids, dtype=np.int64)
        enc = encode_posting_list(ids, np.ones_like(ids), ids.astype(np.float64) / 10)
        enc["term"] = term
        enc["shard_id"] = shard
        return enc

    rows = [
        # term "x": shard 0 holds [0..4] + a synced add id 1000 → overlaps shard 1's [50..54]
        chunk("x", 0, [0, 1, 2, 3, 4, 1000]),
        chunk("x", 1, [50, 51, 52, 53, 54]),
        # term "y": clean disjoint ranges → splice path
        chunk("y", 0, [5, 6]),
        chunk("y", 1, [60, 61]),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["term"]: r.asDict() for r in merge_term_major(df).collect()}

    for t, exp_ids in (("x", [0, 1, 2, 3, 4, 50, 51, 52, 53, 54, 1000]),
                       ("y", [5, 6, 60, 61])):
        d = dict(got[t])
        d["doc_ids_delta_varbyte"] = bytes(d["doc_ids_delta_varbyte"])
        d["tfs_varbyte"] = bytes(d["tfs_varbyte"])
        d["weights_f64"] = bytes(d["weights_f64"])
        ids, tfs, ws = decode_merged(d)
        assert list(ids) == exp_ids, t
        assert list(ws) == [i / 10 for i in exp_ids], t  # weights follow their ids
    assert got["x"]["n_chunks"] == 1  # re-encoded
    assert got["y"]["n_chunks"] == 2  # pure splice preserved


def test_merge_over_synced_index_end_to_end(spark, tmp_path):
    """Full pipeline: build → sync_index_dir with ADDS (mints doc ids
    above the global max in arbitrary shards) → term-major merge of the
    SYNCED index must decode to exactly the synced postings relation,
    globally sorted per term."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.index_build import build_index, load_posting_lists
    from text_indexer_spark.operators.index_sync import sync_index_dir

    corpus = synthetic_corpus(spark, 80, avg_tokens=25, n_repos=4).cache()
    idx = str(tmp_path / "base")
    build_index(corpus, idx, num_shards=4, resume=False)

    # adds that land in the FIRST shard by key order ("aa/..."), with
    # fresh ids above every existing id → interleaved chunk ranges
    adds = spark.createDataFrame(
        [("aa/added", f"doc{i}.txt", "c1", "txt",
          "merge vector stream added content") for i in range(6)],
        "repo string, path string, commit string, lang string, content string",
    )
    snapshot = corpus.unionByName(adds)
    out = str(tmp_path / "synced")
    sync_index_dir(spark, idx, snapshot, out)

    merged = merge_term_major(load_posting_lists(spark, out))
    # expected relation: decode per-shard lists of the synced index
    exp: dict[str, list] = {}
    for row in load_posting_lists(spark, out).collect():
        d = row.asDict()
        ids, tfs, _ = decode_posting_list(
            {
                "df": d["df"],
                "doc_ids_delta_varbyte": bytes(d["doc_ids_delta_varbyte"]),
                "tfs_varbyte": bytes(d["tfs_varbyte"]),
                "weights_f64": bytes(d["weights_f64"]),
                "block_id_off": list(d["block_id_off"]),
            }
        )
        exp.setdefault(d["term"], []).extend(zip(ids, tfs))
    for t in exp:
        exp[t].sort()

    for row in merged.collect():
        d = row.asDict()
        d["doc_ids_delta_varbyte"] = bytes(d["doc_ids_delta_varbyte"])
        d["tfs_varbyte"] = bytes(d["tfs_varbyte"])
        d["weights_f64"] = bytes(d["weights_f64"])
        ids, tfs, _ = decode_merged(d)
        assert list(zip(ids, tfs)) == exp[d["term"]], d["term"]
        assert list(ids) == sorted(set(ids))  # globally sorted, no dups
    # the added term's list must span old and new id ranges correctly
    assert "added" in exp
