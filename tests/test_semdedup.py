"""SemDeDup (operators/semdedup.py): keep rules, equivalence to global
near-dup dedup at one cluster, cluster-confinement recall trade,
parallelism independence, plan shape, guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import semdedup
from text_indexer_spark.operators.cluster import dedup_clusters, materialize_deduped
from text_indexer_spark.operators.similarity import cosine_near_pairs

DIM = 6


def _e(i, scale=1.0):
    v = [0.0] * DIM
    v[i] = scale
    return v


def _mix(i, j, wj):
    v = _e(i)
    v[j] = wj
    n = math.sqrt(1 + wj * wj)
    return [x / n for x in v]


CENTROIDS = [_e(0), _e(1), _e(2), _e(3)]
# group A (cluster 0): ccos 1.0 / 0.995 / 0.9806 -> centroid_far keeps 3
# group B (cluster 1): ccos 1.0 / 0.995         -> centroid_far keeps 11
# singletons: 20 (cluster 2), 30 (cluster 3)
ROWS = [
    (1, _e(0)),
    (2, _mix(0, 1, 0.1)),
    (3, _mix(0, 1, 0.2)),
    (10, _e(1)),
    (11, _mix(1, 2, 0.1)),
    (20, _mix(2, 3, 0.5)),
    (30, _e(3)),
]
TAU = 0.98


def _df(spark, rows=ROWS, parts=1):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def test_keep_rules(spark):
    emb = _df(spark)
    far = semdedup.semantic_dedup(
        emb, DIM, threshold=TAU, centroids=CENTROIDS, keep="centroid_far"
    )
    assert {r["vec_id"] for r in far.collect()} == {3, 11, 20, 30}
    first = semdedup.semantic_dedup(
        emb, DIM, threshold=TAU, centroids=CENTROIDS, keep="min_id"
    )
    assert {r["vec_id"] for r in first.collect()} == {1, 10, 20, 30}


def test_single_cluster_equals_global_neardup_dedup(spark):
    emb = _df(spark)
    got = semdedup.semantic_dedup(
        emb, DIM, threshold=0.9, centroids=[_e(0)], keep="min_id"
    )
    pairs = cosine_near_pairs(emb, threshold=0.9)
    expect = materialize_deduped(
        emb, dedup_clusters(pairs, src="vec_a", dst="vec_b"), id_col="vec_id"
    )
    assert {r["vec_id"] for r in got.collect()} == {
        r["vec_id"] for r in expect.collect()
    }


def test_cross_cluster_neardups_not_paired(spark):
    # u1/u2 are mutual near-dups (cos ~0.9945) but straddle the
    # cluster-0/cluster-1 boundary — the paper's documented recall
    # trade: no pair, both survive.
    rows = [(1, _mix(0, 1, 0.9)), (2, _mix(1, 0, 0.9))]
    emb = _df(spark, rows)
    assigned = semdedup.assign_clusters(emb, CENTROIDS)
    assert {r["vec_id"]: r["cid"] for r in assigned.collect()} == {1: 0, 2: 1}
    assert semdedup.semantic_pairs(assigned, 0.9).count() == 0
    kept = semdedup.semantic_dedup(
        emb, DIM, threshold=0.9, centroids=CENTROIDS
    )
    assert kept.count() == 2


def test_partition_independence(spark):
    one = semdedup.semantic_dedup(
        _df(spark, parts=1), DIM, threshold=TAU, centroids=CENTROIDS
    )
    seven = semdedup.semantic_dedup(
        _df(spark, parts=7), DIM, threshold=TAU, centroids=CENTROIDS
    )
    assert {r["vec_id"] for r in one.collect()} == {
        r["vec_id"] for r in seven.collect()
    }


def test_auto_centroid_smoke(spark):
    kept = semdedup.semantic_dedup(
        _df(spark), DIM, threshold=TAU, n_centroids=4, iters=1
    )
    ids = {r["vec_id"] for r in kept.collect()}
    # singletons can never be dropped; every id is an original id
    assert {20, 30} <= ids <= {r[0] for r in ROWS}


def test_pairs_plan_equijoin_no_cartesian(spark):
    assigned = semdedup.assign_clusters(_df(spark), CENTROIDS)
    plan = (
        semdedup.semantic_pairs(assigned, TAU)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cli_dedup_semantic(spark, tmp_path, capsys):
    import json

    from text_indexer_spark import cli

    src = str(tmp_path / "emb")
    _df(spark).write.parquet(src)
    out = str(tmp_path / "kept")
    rc = cli.main(
        ["--master", "local[4]", "dedup-semantic", "--embeddings", src,
         "--out", out, "--threshold", str(TAU), "--centroids", "4"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_in"] == len(ROWS)
    assert rep["rows_kept"] == rep["rows_in"] - rep["rows_dropped"]
    got = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert {20, 30} <= got <= {r[0] for r in ROWS}
    assert len(got) == rep["rows_kept"]


def test_guards(spark):
    emb = _df(spark)
    with pytest.raises(ValueError):
        semdedup.semantic_dedup(emb, DIM, threshold=0.0, centroids=CENTROIDS)
    with pytest.raises(ValueError):
        semdedup.semantic_dedup(
            emb, DIM, threshold=0.9, centroids=CENTROIDS, keep="random"
        )


def test_string_ids_rejected_not_silently_ignored(spark):
    """String vec ids reach the components closure, whose long cast
    would NULL every edge and return the corpus unchanged — the guard
    turns that silent no-op into an explicit error (found in review)."""
    rows = [("a1", _e(0)), ("a2", _mix(0, 1, 0.1))]
    emb = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="integral node ids"):
        semdedup.semantic_dedup(
            emb, DIM, threshold=TAU, centroids=CENTROIDS
        )


def test_cli_ann_index_quantizer_reuse(spark, tmp_path, capsys):
    """--ann-index loads the persisted IVF store's committed quantizer
    (no k-means pass) — the dedup clusters coincide with the store's
    inverted lists, so the result matches the library call with the
    same centroids."""
    import json

    from text_indexer_spark import cli
    from text_indexer_spark.operators.similarity import ivf_ingest

    src = str(tmp_path / "emb")
    _df(spark).write.parquet(src)
    store = str(tmp_path / "ivf")
    ivf_ingest(_df(spark), store, dim=DIM, centroids=CENTROIDS)
    out = str(tmp_path / "kept")
    rc = cli.main(
        ["--master", "local[4]", "dedup-semantic", "--embeddings", src,
         "--out", out, "--threshold", str(TAU), "--ann-index", store]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["quantizer"] == "ann-index"
    assert rep["n_centroids"] == len(CENTROIDS)
    got = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert got == {3, 11, 20, 30}  # centroid_far under CENTROIDS


def test_cli_empty_embeddings_clear_error(spark, tmp_path):
    from text_indexer_spark import cli

    src = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    ).write.parquet(src)
    with pytest.raises(SystemExit, match="empty"):
        cli.main(
            ["--master", "local[4]", "dedup-semantic", "--embeddings",
             src, "--out", str(tmp_path / "o")]
        )
