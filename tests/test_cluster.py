"""Connected-components clustering + cleaned-corpus materialization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
    materialize_deduped,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: worst case for min propagation (diameter 4);
    # every node must still end up labeled 1.
    cc = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r["doc_id"]: r["cluster_id"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components_and_reversed_edges(spark):
    # two components, edges given in arbitrary orientation + a self-loop
    edges = [(9, 7), (7, 8), (20, 10), (5, 5)]
    cc = connected_components(_pairs(spark, edges))
    got = {r["doc_id"]: r["cluster_id"] for r in cc.collect()}
    assert got == {7: 7, 8: 7, 9: 7, 10: 10, 20: 10}


def test_clique_one_round(spark):
    edges = [(1, 2), (1, 3), (2, 3)]
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(_pairs(spark, edges)).collect()}
    assert set(got.values()) == {1}


def test_empty_pairs(spark):
    cc = connected_components(_pairs(spark, []))
    assert cc.count() == 0


def test_materialize_keeps_canonical_and_unclustered(spark):
    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    clusters = _pairs(spark, [(1, 3), (3, 5)])  # component {1,3,5} → canonical 1
    cc = dedup_clusters(clusters)
    kept = materialize_deduped(corpus, cc)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 4]


def test_determinism_across_partitionings(spark):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (11, 30)]
    a = connected_components(_pairs(spark, edges).repartition(1))
    b = connected_components(_pairs(spark, edges).repartition(7))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_reliable_checkpoint_mode_identical(spark, tmp_path):
    """checkpoint_dir switches the per-round lineage cut to reliable
    checkpoint() — results must be identical to the localCheckpoint
    path, and checkpoint files must actually land in the directory."""
    import os

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    base = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(_pairs(spark, edges)).collect()}
    ck = str(tmp_path / "cc_ckpt")
    rel = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(
               _pairs(spark, edges), checkpoint_dir=ck).collect()}
    assert rel == base == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
    assert any(os.scandir(ck)), "no reliable checkpoint data written"
