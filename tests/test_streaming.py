"""Structured-Streaming front end: the stream-fed index state must equal
the batch-built state on the same data; windowed rates respect
watermarks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.corpus import golden_corpus
from text_indexer_spark.streaming.sync_stream import (
    corpus_change_stream,
    run_stream_sync,
    stream_postings,
    windowed_doc_rates,
)
from text_indexer_spark.tokenizer import tokenize_column


@pytest.fixture()
def drop_dir(spark, tmp_path):
    d = str(tmp_path / "drops")
    os.makedirs(d)
    corpus = golden_corpus(spark, snapshot=1).withColumn(
        "event_time", F.timestamp_seconds(F.lit(1_700_000_000) + F.xxhash64("path") % 60)
    )
    corpus.coalesce(1).write.mode("append").parquet(d)
    return d


def test_stream_postings_equal_batch(spark, drop_dir, tmp_path):
    collected = []

    def merge(batch_df, batch_id):
        collected.append(
            {
                (r["repo"], r["path"], r["term"], r["tf"])
                for r in stream_postings_rows(batch_df)
            }
        )

    def stream_postings_rows(batch_df):
        toks = batch_df.select(
            "repo", "path", F.explode(tokenize_column("content")).alias("term")
        )
        return (
            toks.groupBy("repo", "path", "term")
            .agg(F.count("*").cast("long").alias("tf"))
            .collect()
        )

    q = run_stream_sync(
        spark, drop_dir, str(tmp_path / "ckpt"), merge, once=True
    )
    q.awaitTermination(120)
    got = set().union(*collected) if collected else set()

    batch = golden_corpus(spark, snapshot=1)
    exp = {
        (r["repo"], r["path"], r["term"], r["tf"])
        for r in batch.select(
            "repo", "path", F.explode(tokenize_column("content")).alias("term")
        )
        .groupBy("repo", "path", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .collect()
    }
    assert got == exp


def test_streaming_tf_aggregation(spark, drop_dir, tmp_path):
    stream = corpus_change_stream(spark, drop_dir)
    agg = stream_postings(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("tfagg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from tfagg").collect()
    tf = {(r["path"], r["term"]): r["tf"] for r in rows}
    # 'we' appears twice in the fight-club golden sentence
    assert tf[("fight-club.txt", "we")] >= 2
    assert tf[("temp_file.txt", "judgemental")] == 1


def test_windowed_rates(spark, drop_dir, tmp_path):
    stream = corpus_change_stream(spark, drop_dir)
    rates = windowed_doc_rates(stream)
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")  # append would wait for a later batch to
                                 # advance the watermark past the windows
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rates").collect()
    # all five golden docs counted, windows are minute-aligned
    assert sum(r["n_docs"] for r in rows) == 5
    for r in rows:
        assert r["window_start"].second == 0


def test_stream_index_maintenance_end_to_end(spark, tmp_path):
    """Micro-batched upserts + a tombstone drive sync_index_dir through
    foreachBatch; the final streamed index version must equal a full
    batch rebuild of the final corpus state (catalog + BM25 results)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import (
        build_index,
        load_catalog,
        load_posting_lists,
    )
    from text_indexer_spark.operators.wand import wand_topk
    from text_indexer_spark.streaming.sync_stream import (
        run_stream_index_maintenance,
    )

    corpus = synthetic_corpus(spark, n_docs=60, avg_tokens=20, n_repos=6).cache()
    idx0 = str(tmp_path / "v0")
    build_index(corpus, idx0, num_shards=4, resume=False)

    one, two = corpus.orderBy("repo", "path").limit(2).collect()
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    # batch file 1: modify doc `one` + add a brand-new doc
    b1 = spark.createDataFrame(
        [
            (one["repo"], one["path"], "c-mod", one["lang"],
             one["content"] + " streamed marker", None, False),
            ("zz/stream-repo", "docs/streamed.txt", "c-add", "txt",
             "streamed marker fresh doc", None, False),
        ],
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean",
    )
    b1.coalesce(1).write.mode("append").parquet(drop)
    q, latest = run_stream_index_maintenance(
        spark, drop, str(tmp_path / "ckpt1"), idx0, str(tmp_path / "versions1")
    )
    q.awaitTermination(120)
    v_after_b1 = latest()

    # batch file 2 (second stream run, resumes from the new version):
    # tombstone doc `two`
    drop2 = str(tmp_path / "drops2")
    os.makedirs(drop2)
    b2 = spark.createDataFrame(
        [(two["repo"], two["path"], two["commit"], two["lang"], None, None, True)],
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean",
    )
    b2.coalesce(1).write.mode("append").parquet(drop2)
    q2, latest2 = run_stream_index_maintenance(
        spark, drop2, str(tmp_path / "ckpt2"), v_after_b1, str(tmp_path / "versions2")
    )
    q2.awaitTermination(120)
    final = latest2()

    # expected final corpus: one modified, `two` deleted, one added
    expected = (
        corpus.filter(~((F.col("repo") == two["repo"]) & (F.col("path") == two["path"])))
        .withColumn(
            "content",
            F.when(
                (F.col("repo") == one["repo"]) & (F.col("path") == one["path"]),
                F.lit(one["content"] + " streamed marker"),
            ).otherwise(F.col("content")),
        )
        .withColumn(
            "commit",
            F.when(
                (F.col("repo") == one["repo"]) & (F.col("path") == one["path"]),
                F.lit("c-mod"),
            ).otherwise(F.col("commit")),
        )
        .unionByName(
            spark.createDataFrame(
                [("zz/stream-repo", "docs/streamed.txt", "c-add", "txt",
                  "streamed marker fresh doc")],
                "repo string, path string, commit string, lang string, content string",
            )
        )
    )
    ref = str(tmp_path / "ref")
    build_index(expected, ref, num_shards=4, resume=False)

    def cat_set(d):
        return {
            (r["repo"], r["path"], r["content_sha256"], r["doc_len"])
            for r in load_catalog(spark, d).collect()
        }

    assert cat_set(final) == cat_set(ref)

    def topk(d, terms):
        lists = load_posting_lists(spark, d)
        cat = load_catalog(spark, d).select("doc_id", "repo", "path")
        rows = (
            wand_topk(lists, terms, k=10, global_topk=False)
            .join(cat, "doc_id")
            .select("repo", "path", F.round("score", 6).alias("s"))
            .collect()
        )
        ranked = sorted(((r["repo"], r["path"], r["s"]) for r in rows),
                        key=lambda t: (-t[2], t[0], t[1]))
        return ranked[:10]

    for terms in (["streamed"], ["marker"], ["the", "data"]):
        assert topk(final, terms) == topk(ref, terms), terms


def test_stream_maintenance_restart_resumes_from_committed_version(spark, tmp_path):
    """Restarting with the SAME checkpoint_dir + versions_dir and a stale
    index_dir must adopt the newest committed version as base (and
    continue its numbering) — otherwise the streaming checkpoint
    suppresses replay of batch-1 files while the base resets, silently
    dropping every previously applied upsert."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index, load_catalog
    from text_indexer_spark.streaming.sync_stream import run_stream_index_maintenance

    corpus = synthetic_corpus(spark, n_docs=30, avg_tokens=15, n_repos=3).cache()
    idx0 = str(tmp_path / "v0")
    build_index(corpus, idx0, num_shards=2, resume=False)
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    ckpt = str(tmp_path / "ckpt")
    versions = str(tmp_path / "versions")
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_time timestamp, deleted boolean")

    spark.createDataFrame(
        [("rr/a", "batch1.txt", "c1", "txt", "first streamed doc alpha", None, False)],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)
    q, latest = run_stream_index_maintenance(spark, drop, ckpt, idx0, versions)
    q.awaitTermination(120)
    assert latest().endswith("v0001")

    # second file lands; restart the maintenance job pointing at the
    # ORIGINAL index_dir (the stale base) with the same checkpoint
    spark.createDataFrame(
        [("rr/b", "batch2.txt", "c2", "txt", "second streamed doc beta", None, False)],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)
    q2, latest2 = run_stream_index_maintenance(spark, drop, ckpt, idx0, versions)
    q2.awaitTermination(120)
    final = latest2()
    assert final.endswith("v0002")

    paths = {r["path"] for r in load_catalog(spark, final).collect()}
    assert "batch1.txt" in paths and "batch2.txt" in paths  # batch 1 NOT lost


def test_stream_dedup_exact_cross_batch_state(spark, tmp_path):
    """applyInPandasWithState dedup: a content seen in micro-batch 1
    must NOT be emitted again in micro-batch 2 (state persists across
    batches via the streaming checkpoint); within a batch, first-wins."""
    from text_indexer_spark.streaming.dedup_stream import stream_dedup_exact
    from text_indexer_spark.streaming.sync_stream import corpus_change_stream

    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_time timestamp, deleted boolean")

    def run_batchfile(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(drop)
        stream = corpus_change_stream(spark, drop, max_files_per_trigger=1)
        q = (
            stream_dedup_exact(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two distinct contents + an in-batch duplicate of the first
    run_batchfile([
        ("r1", "a.txt", "c1", "txt", "alpha content", None, False),
        ("r1", "b.txt", "c1", "txt", "beta content", None, False),
        ("r2", "a_copy.txt", "c1", "txt", "alpha content", None, False),
    ])
    got1 = spark.read.parquet(out)
    assert got1.count() == 2
    assert {r["content"] for r in got1.collect()} == {"alpha content", "beta content"}
    # first-wins within the batch: the kept alpha is the smallest key
    assert got1.filter("content = 'alpha content'").first()["path"] == "a.txt"

    # batch 2: replays alpha (cross-batch dup) + one genuinely new doc
    run_batchfile([
        ("r3", "late_alpha.txt", "c2", "txt", "alpha content", None, False),
        ("r3", "c.txt", "c2", "txt", "gamma content", None, False),
    ])
    got2 = spark.read.parquet(out)
    assert got2.count() == 3  # alpha NOT re-admitted
    assert {r["content"] for r in got2.collect()} == {
        "alpha content", "beta content", "gamma content"
    }


def test_stream_dedup_seen_catalog_bounds_state(spark, tmp_path):
    """Compaction path: content already in the committed catalog is
    dropped by the stream-static anti-join BEFORE the stateful operator,
    so it is never admitted and never enters state."""
    from pyspark.sql import functions as F

    from text_indexer_spark.streaming.dedup_stream import stream_dedup_exact
    from text_indexer_spark.streaming.sync_stream import corpus_change_stream

    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_time timestamp, deleted boolean")

    # the "committed index catalog": alpha content is already indexed
    catalog = spark.createDataFrame(
        [("alpha content",)], "content string"
    ).select(F.sha2(F.col("content"), 256).alias("content_sha256"))

    spark.createDataFrame([
        ("r1", "a.txt", "c1", "txt", "alpha content", None, False),
        ("r1", "b.txt", "c1", "txt", "beta content", None, False),
    ], schema).coalesce(1).write.mode("append").parquet(drop)
    stream = corpus_change_stream(spark, drop, max_files_per_trigger=1)
    q = (
        stream_dedup_exact(stream, seen_catalog=catalog)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # alpha was pre-seen via the catalog -> only beta is admitted
    assert [r["content"] for r in got.collect()] == ["beta content"]


def test_stream_trigram_maintenance(spark, tmp_path):
    """Streamed upserts + tombstones into the committed trigram index ≡
    trigram postings over the final corpus state."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.trigram import (
        read_committed_trigrams,
        trigram_postings,
    )
    from text_indexer_spark.streaming.sync_stream import (
        run_stream_trigram_maintenance,
    )

    tri = str(tmp_path / "tri")
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean"
    )
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    # batch 1: two docs, one of them upserted TWICE in the same batch
    # (event_time decides; 'stale text' must never reach the index)
    b1 = spark.createDataFrame(
        [
            ("r1", "a.txt", "c1", "txt", "stale text", t0, False),
            ("r1", "a.txt", "c2", "txt", "alpha bravo charlie", t0 + dt.timedelta(seconds=5), False),
            ("r1", "b.txt", "c1", "txt", "delta echo foxtrot", t0, False),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(drop)
    q, version = run_stream_trigram_maintenance(
        spark, drop, str(tmp_path / "ckpt1"), tri
    )
    q.awaitTermination(120)
    assert version() >= 1

    # batch 2 (fresh stream run): tombstone b.txt, add c.txt
    drop2 = str(tmp_path / "drops2")
    os.makedirs(drop2)
    b2 = spark.createDataFrame(
        [
            ("r1", "b.txt", "c1", "txt", None, t0, True),
            ("r1", "c.txt", "c1", "txt", "golf hotel india", t0, False),
        ],
        schema,
    )
    b2.coalesce(1).write.mode("append").parquet(drop2)
    q2, version2 = run_stream_trigram_maintenance(
        spark, drop2, str(tmp_path / "ckpt2"), tri
    )
    q2.awaitTermination(120)
    assert version2() > 0

    final = spark.createDataFrame(
        [("r1", "a.txt", "alpha bravo charlie"), ("r1", "c.txt", "golf hotel india")],
        "repo string, path string, text string",
    ).select(F.xxhash64("repo", "path").alias("doc_id"), "text")
    got = sorted(
        (r["doc_id"], r["gram"])
        for r in read_committed_trigrams(spark, tri).collect()
    )
    want = sorted(
        (r["doc_id"], r["gram"]) for r in trigram_postings(final).collect()
    )
    assert got == want


def test_stream_line_counts_equals_batch(spark, tmp_path):
    """Two micro-batched drops fold into the committed line-count table;
    the final version must equal the batch line_counts over the union
    corpus, and serving dedup_lines_against(counts) must equal the
    batch dedup_lines of the same corpus."""
    from text_indexer_spark.operators import linededup
    from text_indexer_spark.streaming.linecount_stream import (
        load_line_counts,
        run_stream_line_counts,
    )

    rows1 = [
        ("r1", "a.txt", "c1", "txt", "all rights reserved\nalpha one", None, False),
        ("r1", "b.txt", "c1", "txt", "all rights reserved\nbeta two", None, False),
    ]
    rows2 = [
        ("r2", "c.txt", "c1", "txt", "all rights reserved\ngamma three", None, False),
        ("r2", "d.txt", "c1", "txt", "delta four\nalpha one", None, False),
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean"
    )
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    counts_dir = str(tmp_path / "counts")
    os.makedirs(counts_dir)

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(drop)
    q, ver = run_stream_line_counts(
        spark, drop, str(tmp_path / "ck1"), counts_dir
    )
    q.awaitTermination(120)
    assert ver() == 1

    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(drop)
    q2, ver2 = run_stream_line_counts(
        spark, drop, str(tmp_path / "ck1"), counts_dir
    )
    q2.awaitTermination(120)
    assert ver2() == 2

    full = spark.createDataFrame(
        [(i, r[4]) for i, r in enumerate(rows1 + rows2)],
        "doc_id long, text string",
    )
    batch = {
        (r["line"], r["n_docs"])
        for r in linededup.line_counts(full).collect()
    }
    streamed = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    assert streamed == batch
    assert ("all rights reserved", 3) in streamed and ("alpha one", 2) in streamed

    served = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines_against(
            full,
            load_line_counts(spark, counts_dir).filter(F.col("n_docs") >= 2),
        ).collect()
    }
    direct = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(full, min_docs=2).collect()
    }
    assert served == direct == {1: "beta two", 2: "gamma three", 3: "delta four"}


def test_line_count_commit_is_replay_idempotent(spark, tmp_path):
    """The additive sink must not double-count a replayed micro-batch:
    a commit re-presented with the same (txn_app, batch_id) is skipped
    (crash window between swap_latest and the streaming offset
    commit); a LATER batch id from the same app still merges."""
    from text_indexer_spark.streaming.linecount_stream import (
        commit_line_counts,
        load_line_counts,
    )

    counts_dir = str(tmp_path / "c")
    os.makedirs(counts_dir)
    delta = spark.createDataFrame(
        [("alpha", 1), ("shared", 1)], "line string, n_docs long"
    )
    v1 = commit_line_counts(delta, counts_dir, txn_app="ck", txn_batch_id=0)
    replay = commit_line_counts(delta, counts_dir, txn_app="ck", txn_batch_id=0)
    assert v1 == replay == 1
    got = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    assert got == {("alpha", 1), ("shared", 1)}  # NOT doubled
    v2 = commit_line_counts(
        spark.createDataFrame([("shared", 2)], "line string, n_docs long"),
        counts_dir, txn_app="ck", txn_batch_id=1,
    )
    assert v2 == 2
    got2 = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    assert got2 == {("alpha", 1), ("shared", 3)}


def test_line_count_stream_drops_represented_docs(spark, tmp_path):
    """Contract enforcement (ADVICE r4): the additive line-count fold
    must not double-count a document the table has already counted —
    re-deliveries AND updates of a (repo, path) are dropped with the
    drop recorded in the version meta, so dedup_lines_against never
    sees phantom shared lines."""
    import json

    from text_indexer_spark.streaming.linecount_stream import (
        load_line_counts,
        load_line_counts_version,
        load_seen_doc_ids,
        run_stream_line_counts,
    )

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean"
    )
    counts_dir = str(tmp_path / "counts")
    os.makedirs(counts_dir)
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    spark.createDataFrame(
        [
            ("r1", "a.txt", "c1", "txt", "shared line\nalpha only", None, False),
            ("r1", "b.txt", "c1", "txt", "shared line\nbeta only", None, False),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)
    q, ver = run_stream_line_counts(spark, drop, str(tmp_path / "ck1"), counts_dir)
    q.awaitTermination(120)
    assert ver() == 1

    # batch 2 violates the append-only-distinct contract: a.txt is
    # re-presented (with DIFFERENT content — an update); c.txt is new
    spark.createDataFrame(
        [
            ("r1", "a.txt", "c2", "txt", "shared line\nupdated text", None, False),
            ("r1", "c.txt", "c1", "txt", "shared line\ngamma only", None, False),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)
    q2, ver2 = run_stream_line_counts(spark, drop, str(tmp_path / "ck1"), counts_dir)
    q2.awaitTermination(120)
    assert ver2() == 2

    got = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    # a.txt counted ONCE (first-seen content): shared line has 3 docs,
    # and neither 'updated text' nor a 4th 'shared line' count exists
    assert got == {
        ("shared line", 3),
        ("alpha only", 1),
        ("beta only", 1),
        ("gamma only", 1),
    }
    assert load_seen_doc_ids(spark, counts_dir).count() == 3
    v = load_line_counts_version(counts_dir)
    with open(
        os.path.join(counts_dir, f"counts_v{v:06d}.meta.json")
    ) as f:
        assert json.load(f)["n_docs_dropped"] == 1


def test_index_stream_maintenance_replay_is_effect_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash after the version commit, before
    the streaming offset commit — simulated by re-running the
    maintenance over the same drop with a FRESH checkpoint) must leave
    the SERVED index content unchanged: replace semantics converge.
    The cost of the replay is one redundant version directory, never a
    content divergence."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import (
        build_index,
        load_posting_lists,
    )
    from text_indexer_spark.streaming.sync_stream import (
        run_stream_index_maintenance,
    )

    corpus = synthetic_corpus(spark, n_docs=40, avg_tokens=15, n_repos=4).cache()
    idx0 = str(tmp_path / "idx0")
    build_index(corpus, idx0, num_shards=2, resume=False)

    one = corpus.orderBy("repo", "path").limit(1).collect()[0]
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    spark.createDataFrame(
        [
            (one["repo"], one["path"], "c-mod", one["lang"],
             one["content"] + " replay marker", None, False),
            ("zz/replay-repo", "docs/replayed.txt", "c-add", "txt",
             "replay marker fresh doc", None, False),
        ],
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean",
    ).coalesce(1).write.mode("append").parquet(drop)
    versions = str(tmp_path / "versions")

    q, latest = run_stream_index_maintenance(
        spark, drop, str(tmp_path / "ck1"), idx0, versions
    )
    q.awaitTermination(120)
    first = latest()

    def served(path):
        df = load_posting_lists(spark, path)
        return sorted(tuple(r) for r in df.collect())

    once = served(first)

    # replay: fresh checkpoint, same drop → the same batch re-applies
    q2, latest2 = run_stream_index_maintenance(
        spark, drop, str(tmp_path / "ck2"), idx0, versions
    )
    q2.awaitTermination(120)
    replayed = latest2()
    assert replayed != first  # a redundant version directory exists...
    assert served(replayed) == once  # ...but served content is unchanged


def test_trigram_stream_maintenance_replay_is_effect_idempotent(spark, tmp_path):
    """Same crash-replay window for the trigram LSM maintenance: the
    replayed batch tombstones and re-adds the same docs, so the served
    gram set is unchanged (replace semantics)."""
    import datetime as dt

    from text_indexer_spark.operators.trigram import read_committed_trigrams
    from text_indexer_spark.streaming.sync_stream import (
        run_stream_trigram_maintenance,
    )

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean"
    )
    t0 = dt.datetime(2026, 1, 1)
    tri = str(tmp_path / "tri")
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    spark.createDataFrame(
        [
            ("r1", "a.txt", "c1", "txt", "alpha bravo charlie", t0, False),
            ("r1", "b.txt", "c1", "txt", "delta echo foxtrot", t0, False),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)

    q, ver = run_stream_trigram_maintenance(
        spark, drop, str(tmp_path / "ck1"), tri
    )
    q.awaitTermination(120)
    once = sorted(
        (r["doc_id"], r["gram"])
        for r in read_committed_trigrams(spark, tri).collect()
    )
    v1 = ver()

    q2, ver2 = run_stream_trigram_maintenance(
        spark, drop, str(tmp_path / "ck2"), tri
    )
    q2.awaitTermination(120)
    assert ver2() > v1  # replay burned a version...
    twice = sorted(
        (r["doc_id"], r["gram"])
        for r in read_committed_trigrams(spark, tri).collect()
    )
    assert twice == once  # ...but served grams are unchanged


def test_line_count_all_dropped_batch_leaves_marker(spark, tmp_path, monkeypatch):
    """The LARGEST contract violation (an entire micro-batch of
    already-counted docs) must not be the one that leaves no trace:
    no version is committed, but a batch-keyed ``dropped_b*.json``
    marker records the drop.  Run with ``SEEN_PROBE_CAP`` forced to 0
    so the same scenario also exercises the distributed anti-join
    membership path (no driver id collect)."""
    import glob
    import json

    from text_indexer_spark.streaming import linecount_stream as lcs

    monkeypatch.setattr(lcs, "SEEN_PROBE_CAP", 0)

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean"
    )
    counts_dir = str(tmp_path / "counts")
    os.makedirs(counts_dir)
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    spark.createDataFrame(
        [
            ("r1", "a.txt", "c1", "txt", "shared line\nalpha only", None, False),
            ("r1", "b.txt", "c1", "txt", "shared line\nbeta only", None, False),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)
    q, ver = lcs.run_stream_line_counts(
        spark, drop, str(tmp_path / "ck1"), counts_dir
    )
    q.awaitTermination(120)
    assert ver() == 1

    # batch 2 re-presents BOTH docs (one verbatim, one updated): every
    # doc drops, nothing folds
    spark.createDataFrame(
        [
            ("r1", "a.txt", "c1", "txt", "shared line\nalpha only", None, False),
            ("r1", "b.txt", "c2", "txt", "shared line\nrewritten", None, False),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)
    q2, ver2 = lcs.run_stream_line_counts(
        spark, drop, str(tmp_path / "ck1"), counts_dir
    )
    q2.awaitTermination(120)
    assert ver2() == 1  # no version burned for a no-op fold
    assert lcs.load_line_counts_version(counts_dir) == 1
    got = {
        (r["line"], r["n_docs"])
        for r in lcs.load_line_counts(spark, counts_dir).collect()
    }
    assert got == {
        ("shared line", 2),
        ("alpha only", 1),
        ("beta only", 1),
    }
    markers = sorted(glob.glob(os.path.join(counts_dir, "dropped_b*.json")))
    assert len(markers) == 1
    with open(markers[0]) as f:
        assert json.load(f)["n_docs_dropped"] == 2


def test_seen_doc_id_compaction_preserves_membership(spark, tmp_path):
    """compact_seen_doc_ids folds the per-version delta dirs into one
    consolidated dir behind an atomic floor marker: the seen-id set is
    unchanged, the per-version dirs are gone, re-compaction is a
    no-op, later commits stack above the floor and fold in on the
    next compaction, and the (txn_app, batch_id) replay marker is
    untouched (compaction neither bumps the version nor rewrites
    meta)."""
    from text_indexer_spark.streaming.linecount_stream import (
        _compaction_floor,
        commit_line_counts,
        compact_seen_doc_ids,
        load_line_counts,
        load_seen_doc_ids,
    )

    counts_dir = str(tmp_path / "c")
    os.makedirs(counts_dir)

    def ids_df(*vals):
        return spark.createDataFrame([(v,) for v in vals], "doc_id long")

    for b, (line, docs) in enumerate(
        [("alpha", (1, 2)), ("beta", (3,)), ("gamma", (4, 5))]
    ):
        commit_line_counts(
            spark.createDataFrame(
                [(line, len(docs))], "line string, n_docs long"
            ),
            counts_dir,
            txn_app="ck",
            txn_batch_id=b,
            new_doc_ids=ids_df(*docs),
        )
    before = {
        r["doc_id"] for r in load_seen_doc_ids(spark, counts_dir).collect()
    }
    assert before == {1, 2, 3, 4, 5}

    floor = compact_seen_doc_ids(spark, counts_dir)
    assert floor == 3
    assert _compaction_floor(counts_dir) == 3
    for v in range(1, 4):
        assert not os.path.exists(
            os.path.join(counts_dir, f"docs_v{v:06d}")
        )
    assert os.path.exists(os.path.join(counts_dir, "docs_compact_v000003"))
    after = {
        r["doc_id"] for r in load_seen_doc_ids(spark, counts_dir).collect()
    }
    assert after == before

    # idempotent: nothing new to fold
    assert compact_seen_doc_ids(spark, counts_dir) == 3

    # replay detection still works across the compaction: the last
    # committed (app, batch) is skipped, counts unchanged
    replay = commit_line_counts(
        spark.createDataFrame([("gamma", 2)], "line string, n_docs long"),
        counts_dir,
        txn_app="ck",
        txn_batch_id=2,
        new_doc_ids=ids_df(4, 5),
    )
    assert replay == 3  # version NOT advanced
    got = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    assert got == {("alpha", 2), ("beta", 1), ("gamma", 2)}

    # a post-compaction commit stacks a delta above the floor...
    commit_line_counts(
        spark.createDataFrame([("delta", 1)], "line string, n_docs long"),
        counts_dir,
        txn_app="ck",
        txn_batch_id=3,
        new_doc_ids=ids_df(6),
    )
    assert {
        r["doc_id"] for r in load_seen_doc_ids(spark, counts_dir).collect()
    } == {1, 2, 3, 4, 5, 6}
    # ...and the next compaction folds it and sweeps the old compact dir
    assert compact_seen_doc_ids(spark, counts_dir) == 4
    assert not os.path.exists(
        os.path.join(counts_dir, "docs_compact_v000003")
    )
    assert not os.path.exists(os.path.join(counts_dir, "docs_v000004"))
    assert {
        r["doc_id"] for r in load_seen_doc_ids(spark, counts_dir).collect()
    } == {1, 2, 3, 4, 5, 6}


def test_seen_doc_id_compaction_crash_garbage_is_unreachable(spark, tmp_path):
    """Crash-after-swap leftovers (stale docs_v dirs at or below the
    floor) are never read — the floor marker, not directory existence,
    decides reachability — and the next compaction sweeps them."""
    from text_indexer_spark.streaming.linecount_stream import (
        commit_line_counts,
        compact_seen_doc_ids,
        load_seen_doc_ids,
    )

    counts_dir = str(tmp_path / "c")
    os.makedirs(counts_dir)
    commit_line_counts(
        spark.createDataFrame([("alpha", 1)], "line string, n_docs long"),
        counts_dir,
        txn_app="ck",
        txn_batch_id=0,
        new_doc_ids=spark.createDataFrame([(1,)], "doc_id long"),
    )
    assert compact_seen_doc_ids(spark, counts_dir) == 1

    # simulate the crash window: a stale delta dir at v<=floor
    # reappears (delete failed mid-sweep); its BOGUS id must not leak
    # into membership
    spark.createDataFrame([(99,)], "doc_id long").write.parquet(
        os.path.join(counts_dir, "docs_v000001")
    )
    assert {
        r["doc_id"] for r in load_seen_doc_ids(spark, counts_dir).collect()
    } == {1}

    # the next compaction (after a real new commit) sweeps the garbage
    commit_line_counts(
        spark.createDataFrame([("beta", 1)], "line string, n_docs long"),
        counts_dir,
        txn_app="ck",
        txn_batch_id=1,
        new_doc_ids=spark.createDataFrame([(2,)], "doc_id long"),
    )
    assert compact_seen_doc_ids(spark, counts_dir) == 2
    assert not os.path.exists(os.path.join(counts_dir, "docs_v000001"))
    assert {
        r["doc_id"] for r in load_seen_doc_ids(spark, counts_dir).collect()
    } == {1, 2}


def test_line_count_stream_auto_compacts(spark, tmp_path):
    """With auto_compact_every=1 every committed batch is followed by a
    seen-id compaction inside the maintenance itself: after two batches
    only the consolidated dir exists, and a third batch re-presenting
    a pre-compaction doc is still dropped (membership enforced from
    the compacted set)."""
    import glob

    from text_indexer_spark.streaming.linecount_stream import (
        _compaction_floor,
        load_line_counts,
        run_stream_line_counts,
    )

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_time timestamp, deleted boolean"
    )
    counts_dir = str(tmp_path / "counts")
    os.makedirs(counts_dir)
    drop = str(tmp_path / "drops")
    os.makedirs(drop)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        q, ver = run_stream_line_counts(
            spark, drop, str(tmp_path / "ck"), counts_dir,
            auto_compact_every=1,
        )
        q.awaitTermination(120)
        return ver()

    assert feed([("r", "a.txt", "c1", "txt", "shared\nalpha", None, False)]) == 1
    assert _compaction_floor(counts_dir) == 1
    assert feed([("r", "b.txt", "c1", "txt", "shared\nbeta", None, False)]) == 2
    assert _compaction_floor(counts_dir) == 2
    assert glob.glob(os.path.join(counts_dir, "docs_v*")) == []
    assert len(glob.glob(os.path.join(counts_dir, "docs_compact_v*"))) == 1

    # a.txt re-presented after two compactions: still dropped
    v = feed([("r", "a.txt", "c9", "txt", "shared\nrewritten", None, False)])
    assert v == 2  # whole batch dropped, no version burned
    got = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    assert got == {("shared", 2), ("alpha", 1), ("beta", 1)}


def test_vacuum_line_counts_retention(spark, tmp_path):
    """vacuum_line_counts drops all but the newest keep_last committed
    counts tables (+ meta sidecars), never the LATEST version (whose
    meta carries the replay marker) and never crash orphans above the
    pointer; serving and replay detection are unaffected."""
    from text_indexer_spark.streaming.linecount_stream import (
        commit_line_counts,
        load_line_counts,
        load_line_counts_version,
        vacuum_line_counts,
    )

    counts_dir = str(tmp_path / "c")
    os.makedirs(counts_dir)
    assert vacuum_line_counts(counts_dir) == []  # empty store: no-op
    for b in range(4):
        commit_line_counts(
            spark.createDataFrame(
                [(f"line{b}", 1)], "line string, n_docs long"
            ),
            counts_dir,
            txn_app="ck",
            txn_batch_id=b,
        )
    # a crash orphan ABOVE the pointer must survive vacuum
    orphan = os.path.join(counts_dir, "counts_v000099")
    spark.createDataFrame([("x", 1)], "line string, n_docs long").write.parquet(orphan)

    removed = vacuum_line_counts(counts_dir, keep_last=2)
    assert [os.path.basename(p) for p in removed] == [
        "counts_v000001", "counts_v000002",
    ]
    for v in (1, 2):
        assert not os.path.exists(
            os.path.join(counts_dir, f"counts_v{v:06d}")
        )
        assert not os.path.exists(
            os.path.join(counts_dir, f"counts_v{v:06d}.meta.json")
        )
    for keep in ("counts_v000003", "counts_v000004",
                 "counts_v000004.meta.json", "counts_v000099"):
        assert os.path.exists(os.path.join(counts_dir, keep))
    assert load_line_counts_version(counts_dir) == 4
    got = {
        (r["line"], r["n_docs"])
        for r in load_line_counts(spark, counts_dir).collect()
    }
    assert got == {(f"line{b}", 1) for b in range(4)}

    # replay marker intact: re-presenting the last (app, batch) skips
    assert (
        commit_line_counts(
            spark.createDataFrame([("line3", 1)], "line string, n_docs long"),
            counts_dir, txn_app="ck", txn_batch_id=3,
        )
        == 4
    )
    # idempotent
    assert vacuum_line_counts(counts_dir, keep_last=2) == []


# --------------------------------------------------------- vector store
def _vec_rows(ids, shift=0.0):
    import numpy as np

    rng = np.random.default_rng(11)
    all_vecs = {i: rng.normal(size=6) for i in range(64)}
    return {i: [float(x + shift) for x in all_vecs[i]] for i in ids}


def test_stream_vector_maintenance_equals_logical_corpus(spark, tmp_path):
    """Streamed vector upserts + tombstones into the committed IVF
    store ≡ the logical corpus: within-batch last-write-wins by
    event_time, cross-batch replace/delete via the store's segment +
    tombstone merge — same differential discipline as the trigram and
    postings stream maintenances."""
    import datetime as dt

    from text_indexer_spark.operators.similarity import ivf_ingest
    from text_indexer_spark.operators.vecstore import resolved_vectors
    from text_indexer_spark.streaming.vector_stream import (
        run_stream_vector_maintenance,
    )

    t0 = dt.datetime(2026, 1, 1)
    idx = str(tmp_path / "ivf")
    base = _vec_rows(range(8))
    ivf_ingest(
        spark.createDataFrame(
            [(i, v) for i, v in base.items()],
            "vec_id long, embedding array<float>",
        ),
        idx, 6, n_centroids=2,
    )

    schema = (
        "vec_id long, embedding array<float>, "
        "event_time timestamp, deleted boolean"
    )
    stale = _vec_rows([2], shift=5.0)
    fresh = _vec_rows([2, 8, 9])
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    # one batch: id 2 upserted twice (stale then fresh — event_time
    # decides), ids 8/9 inserted, id 5 deleted
    spark.createDataFrame(
        [
            (2, stale[2], t0, False),
            (2, fresh[2], t0 + dt.timedelta(seconds=5), False),
            (8, fresh[8], t0, False),
            (9, fresh[9], t0, None),  # NULL deleted = upsert
            (5, None, t0, True),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)

    q, ver = run_stream_vector_maintenance(
        spark, drop, str(tmp_path / "ck1"), idx
    )
    q.awaitTermination(120)
    assert ver() == 2

    expected = {**{i: v for i, v in base.items() if i != 5}, **fresh}
    got = {
        r["vec_id"]: [round(x, 5) for x in r["embedding"]]
        for r in resolved_vectors(spark, idx).collect()
    }
    assert got == {i: [round(x, 5) for x in v] for i, v in expected.items()}


def test_vector_stream_replay_is_effect_idempotent(spark, tmp_path):
    """Crash-replay window: redelivering the same micro-batch commits a
    redundant version but the served view is unchanged (replace
    semantics) — the same guarantee the index and trigram stream
    maintenances test, NOT the additive line-count case."""
    import datetime as dt

    from text_indexer_spark.operators.similarity import ivf_ingest
    from text_indexer_spark.operators.vecstore import resolved_vectors
    from text_indexer_spark.streaming.vector_stream import (
        run_stream_vector_maintenance,
    )

    t0 = dt.datetime(2026, 1, 1)
    idx = str(tmp_path / "ivf")
    base = _vec_rows(range(6))
    ivf_ingest(
        spark.createDataFrame(
            [(i, v) for i, v in base.items()],
            "vec_id long, embedding array<float>",
        ),
        idx, 6, n_centroids=2,
    )
    schema = (
        "vec_id long, embedding array<float>, "
        "event_time timestamp, deleted boolean"
    )
    fresh = _vec_rows([1, 10])
    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    spark.createDataFrame(
        [(1, fresh[1], t0, False), (10, fresh[10], t0, False),
         (3, None, t0, True)],
        schema,
    ).coalesce(1).write.mode("append").parquet(drop)

    q, ver = run_stream_vector_maintenance(spark, drop, str(tmp_path / "ck1"), idx)
    q.awaitTermination(120)
    v1 = ver()
    once = sorted(
        (r["vec_id"], tuple(round(x, 5) for x in r["embedding"]))
        for r in resolved_vectors(spark, idx).collect()
    )
    # replay: fresh checkpoint, same drop dir
    q2, ver2 = run_stream_vector_maintenance(spark, drop, str(tmp_path / "ck2"), idx)
    q2.awaitTermination(120)
    assert ver2() > v1  # replay burned a version...
    twice = sorted(
        (r["vec_id"], tuple(round(x, 5) for x in r["embedding"]))
        for r in resolved_vectors(spark, idx).collect()
    )
    assert twice == once  # ...but the served vectors are unchanged
