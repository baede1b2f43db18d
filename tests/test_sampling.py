"""Deterministic hash sampling/splitting: stability across partitioning,
fraction accuracy, salt independence, disjoint stable splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
    uniform_hash,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def test_sample_deterministic_across_partitionings(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.3).select("doc_id").collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_sample_fraction_accuracy(docs):
    n = docs.count()
    for frac in (0.1, 0.5, 0.9):
        k = hash_sample(docs, frac).count()
        assert abs(k / n - frac) < 0.08  # 500 rows → ±8 % tolerance


def test_sample_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.6).select("doc_id").collect()}
    assert small <= big  # same salt → nested samples (fraction is a dial)


def test_salt_decorrelates(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.5, salt="x").select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.5, salt="y").select("doc_id").collect()}
    n = docs.count()
    overlap = len(a & b) / n
    assert 0.15 < overlap < 0.35  # ≈ 0.25 for independent 50 % draws


def test_stratified_fractions(docs):
    got = stratified_hash_sample(
        docs, {"en": 0.1}, stratum_col="lang", default_fraction=1.0
    )
    en_total = docs.filter("lang = 'en'").count()
    other_total = docs.filter("lang <> 'en'").count()
    en_kept = got.filter("lang = 'en'").count()
    assert got.filter("lang <> 'en'").count() == other_total  # default 1.0
    assert en_kept < 0.3 * en_total


def test_split_disjoint_exhaustive_stable(docs):
    s = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULLs when weights sum to 1
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"]
    # appending a split never moves existing rows
    s2 = hash_split(docs, {"train": 0.8, "val": 0.1})
    joined = s.select("doc_id", F.col("split").alias("a")).join(
        s2.select("doc_id", F.col("split").alias("b")), "doc_id"
    )
    assert joined.filter("b IS NOT NULL AND a <> b").count() == 0


def test_zero_shuffle_plan(docs):
    from text_indexer_spark.plans.checks import count_exchanges

    assert count_exchanges(hash_sample(docs, 0.3)) == 0
    assert count_exchanges(hash_split(docs, {"train": 0.9})) == 0
