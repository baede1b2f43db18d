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
