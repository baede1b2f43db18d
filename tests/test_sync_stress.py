"""Concurrency-analogue stress (FIXTURES.md §6, mirroring the
reference's DocumentsIndexerConcurrencyTest.kt:22-51): rounds of
randomized snapshot churn — junk docs added and removed around an
untouched sentinel — after every sync the sentinel stays exactly
searchable; plus build determinism across parallelism levels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.postings import build_catalog, build_postings
from text_indexer_spark.operators.search import conjunctive_match
from text_indexer_spark.operators.sync import sync_index

SENTINEL = ("texts", "sentinel.txt", "s" * 40, "text", "Be curious, not judgemental")
ROUNDS = 4
JUNK_PER_ROUND = 30


def _snapshot(spark, round_no: int):
    """Deterministic churn: round r contains the sentinel + 30 junk docs
    whose ids depend on r (so each round adds ~30 and removes ~30)."""
    junk = (
        spark.range(JUNK_PER_ROUND)
        .select(
            F.lit("junk").alias("repo"),
            F.concat(
                F.lit(f"r{round_no}_"), F.col("id").cast("string"), F.lit(".txt")
            ).alias("path"),
            F.sha2(F.concat(F.lit(round_no), F.col("id")), 256).alias("commit"),
            F.lit("text").alias("lang"),
            F.concat(
                F.lit("junk content round "),
                F.lit(str(round_no)),
                F.lit(" item "),
                F.col("id").cast("string"),
            ).alias("content"),
        )
    )
    sent = spark.createDataFrame(
        [SENTINEL], "repo string, path string, commit string, lang string, content string"
    )
    return junk.unionByName(sent)


def test_churn_rounds_keep_sentinel_searchable(spark):
    snap0 = _snapshot(spark, 0)
    catalog = build_catalog(snap0)
    postings = build_postings(catalog)
    catalog = catalog.drop("content").cache()
    postings = postings.cache()

    sentinel_id = catalog.filter(F.col("path") == "sentinel.txt").first()["doc_id"]

    for r in range(1, ROUNDS + 1):
        catalog, postings, diff = sync_index(catalog, postings, _snapshot(spark, r))
        catalog = catalog.cache()
        postings = postings.cache()
        changes = {row["change"] for row in diff.collect()}
        assert changes == {"add", "remove"}, f"round {r}: {changes}"
        # sentinel: exactly one hit, same doc_id as in round 0
        ids = [row["doc_id"] for row in
               conjunctive_match(postings, ["judgemental", "curious"]).collect()]
        assert ids == [sentinel_id], f"round {r}"
        # catalog holds sentinel + current junk only
        assert catalog.count() == JUNK_PER_ROUND + 1, f"round {r}"
        # junk from the previous round is fully pruned
        stale = catalog.filter(F.col("path").startswith(f"r{r-1}_")).count()
        assert stale == 0, f"round {r}"


def test_build_identical_across_parallelism(spark):
    """Byte-identical encoded posting lists at different shard counts is
    impossible (shard boundaries differ), but the DECODED logical index
    must be identical — and at equal shard counts the encoded bytes must
    be identical across partition layouts of the input."""
    import tempfile

    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.codec import decode_posting_list
    from text_indexer_spark.operators.index_build import build_index, load_posting_lists

    corpus = synthetic_corpus(spark, 150, avg_tokens=40)
    snapshots = []
    for layout in (2, 16):
        idx = tempfile.mkdtemp(prefix=f"det_{layout}_")
        build_index(corpus.repartition(layout), idx, num_shards=4, resume=False)
        rows = load_posting_lists(spark, idx).collect()
        logical = set()
        raw = []
        for row in rows:
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
            for i in range(len(ids)):
                logical.add((d["term"], int(ids[i]), int(tfs[i]), float(ws[i])))
            raw.append((d["shard_id"], d["term"], bytes(d["doc_ids_delta_varbyte"])))
        snapshots.append((logical, sorted(raw)))
    assert snapshots[0][0] == snapshots[1][0]  # logical index identical
    assert snapshots[0][1] == snapshots[1][1]  # same shards → same bytes
