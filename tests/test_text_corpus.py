"""JSONL / CSV ingest connectors → canonical corpus shape."""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.sources.text_corpus import (
    CORPUS_FIELDS,
    normalize_corpus,
    read_corpus_csv,
    read_corpus_jsonl,
)

DOCS = [
    {"text": "hello spark world", "url": "a/one.txt", "site": "example.org"},
    {"text": "the quick brown fox", "url": "a/two.txt", "site": "example.org"},
    {"text": "hello spark world", "url": "b/dup.txt", "site": "other.net"},
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in DOCS) + "\n")
    return str(p)


def test_jsonl_maps_and_synthesizes(spark, jsonl_path):
    df = read_corpus_jsonl(
        spark, jsonl_path, {"content": "text", "repo": "site", "path": "url"}
    )
    assert tuple(df.columns) == CORPUS_FIELDS
    rows = {r["path"]: r for r in df.collect()}
    assert rows["a/one.txt"]["repo"] == "example.org"
    assert rows["a/one.txt"]["content"] == "hello spark world"
    assert rows["a/one.txt"]["lang"] == "und"
    # commit synthesized as sha256(content): identical content ⇒ same version id
    assert rows["a/one.txt"]["commit"] == rows["b/dup.txt"]["commit"]
    assert len(rows["a/one.txt"]["commit"]) == 64
    assert rows["a/one.txt"]["commit"] != rows["a/two.txt"]["commit"]


def test_jsonl_content_only_synthesizes_path(spark, jsonl_path):
    df = read_corpus_jsonl(spark, jsonl_path, {"content": "text"})
    rows = df.collect()
    assert all(r["repo"] == "" for r in rows)
    # synthesized path is deterministic in content: dup docs share it
    paths = {r["content"]: r["path"] for r in rows}
    assert all(p for p in paths.values())
    assert df.filter(F.col("path") == "").count() == 0


def test_normalize_rejects_bad_mapping(spark):
    df = spark.range(1).select(F.lit("x").alias("text"))
    with pytest.raises(ValueError, match="content"):
        normalize_corpus(df, {"repo": "text"})
    with pytest.raises(ValueError, match="unknown"):
        normalize_corpus(df, {"content": "text", "nope": "text"})


def test_csv_header_and_headerless(spark, tmp_path):
    p = tmp_path / "dump.csv"
    p.write_text("doc,where\nsome text,r1/x.txt\nmore text,r1/y.txt\n")
    df = read_corpus_csv(
        spark, str(p), {"content": "doc", "path": "where"}
    )
    got = {r["path"]: r["content"] for r in df.collect()}
    assert got == {"r1/x.txt": "some text", "r1/y.txt": "more text"}

    p2 = tmp_path / "nohdr.csv"
    p2.write_text("some text,r1/x.txt\n")
    with pytest.raises(ValueError, match="columns"):
        read_corpus_csv(spark, str(p2), {"content": "doc"}, header=False)
    df2 = read_corpus_csv(
        spark, str(p2), {"content": "doc", "path": "where"},
        header=False, columns=["doc", "where"],
    )
    assert df2.collect()[0]["content"] == "some text"


def test_jsonl_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"text": "ok"}\n{not json at all\n')
    df = read_corpus_jsonl(spark, str(p), {"content": "text"})
    with pytest.raises(Exception):
        df.collect()


def test_jsonl_feeds_build(spark, jsonl_path, tmp_path):
    """Connector output flows straight into the index build."""
    from text_indexer_spark.operators.index_build import build_index, load_catalog

    corpus = read_corpus_jsonl(
        spark, jsonl_path, {"content": "text", "repo": "site", "path": "url"}
    )
    out = str(tmp_path / "idx")
    build_index(corpus, out, num_shards=2)
    assert load_catalog(spark, out).count() == 3
