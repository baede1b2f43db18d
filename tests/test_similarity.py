"""Similarity search vs numpy ground truth; LSH recall vs brute force."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import similarity
from text_indexer_spark.operators.similarity import (
    cosine_near_pairs,
    cosine_topk,
    lsh_bucketed_topk,
)

DIM = 16
N = 120


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(42)
    # 4 clusters → meaningful neighbors
    centers = rng.normal(size=(4, DIM))
    rows = []
    for i in range(N):
        c = centers[i % 4]
        v = c + 0.15 * rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return df, mat


def _np_topk(mat, qi, k):
    q = mat[qi]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos_r = np.round(cos, 4)
    order = sorted(
        (i for i in range(len(mat)) if i != qi),
        key=lambda i: (-cos_r[i], i),
    )
    return [(i, cos_r[i]) for i in order[:k]]


def test_cosine_topk_matches_numpy(spark, vecs):
    df, mat = vecs
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = cosine_topk(df, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    for qi in range(3):
        exp = _np_topk(mat, qi, 10)
        assert [d for d, _ in by_q[qi]] == [d for d, _ in exp], qi
        for (_, g), (_, e) in zip(by_q[qi], exp):
            # float32 storage: cosines may differ in the 4th decimal
            assert g == pytest.approx(e, abs=2e-4)


def test_lsh_recall_against_brute_force(spark, vecs):
    df, mat = vecs
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = cosine_topk(df, queries, k=5).collect()
    ann = lsh_bucketed_topk(df, queries, dim=DIM, k=5, n_planes=5).collect()
    bq, aq = {}, {}
    for r in brute:
        bq.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in ann:
        aq.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(bq[q] & aq.get(q, set())) / len(bq[q]) for q in bq]
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe 1-bit, clustered data


def test_cosine_near_pairs(spark, vecs):
    df, mat = vecs
    small = df.filter(F.col("vec_id") < 30)
    got = {(r["vec_a"], r["vec_b"]): r["cos"] for r in cosine_near_pairs(small, 0.9).collect()}
    norms = np.linalg.norm(mat[:30], axis=1)
    for a in range(30):
        for b in range(a + 1, 30):
            cos = round(float(mat[a] @ mat[b] / (norms[a] * norms[b])), 4)
            if cos >= 0.9005:
                assert (a, b) in got, (a, b, cos)
                assert got[(a, b)] == pytest.approx(cos, abs=2e-4)
            elif cos <= 0.8995:
                assert (a, b) not in got, (a, b, cos)


def test_ivf_full_probe_equals_brute_force(spark, vecs):
    """Probing every inverted list is exhaustive: ivf_topk with
    n_probe == n_centroids must equal cosine_topk exactly."""
    from text_indexer_spark.operators.similarity import ivf_topk

    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = sorted(
        (r["query_id"], r["vec_id"], r["cos"])
        for r in cosine_topk(df, queries, k=5).collect()
    )
    ivf = sorted(
        (r["query_id"], r["vec_id"], r["cos"])
        for r in ivf_topk(
            df, queries, dim=DIM, k=5, n_centroids=4, n_probe=4
        ).collect()
    )
    assert ivf == brute


def test_ivf_partial_probe_recall_and_determinism(spark, vecs):
    from text_indexer_spark.operators.similarity import ivf_centroids, ivf_topk

    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    c1 = ivf_centroids(df, 8, DIM)
    c2 = ivf_centroids(df, 8, DIM)
    assert c1 == c2  # deterministic quantizer (hash-seeded, no RNG)
    brute = {}
    for r in cosine_topk(df, queries, k=5).collect():
        brute.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in ivf_topk(
        df, queries, dim=DIM, k=5, n_centroids=8, n_probe=3, centroids=c1
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(brute[q] & got.get(q, set())) / len(brute[q]) for q in brute]
    assert sum(recalls) / len(recalls) >= 0.5


def test_cosine_near_pairs_lsh_full_probe_equals_exact(spark, vecs):
    """probe_hamming = n_planes → every pair flows through the band
    machinery and the output must EQUAL the exact theta-join."""
    from text_indexer_spark.operators.similarity import cosine_near_pairs_lsh

    df, _ = vecs
    exact = sorted(map(tuple, cosine_near_pairs(df, threshold=0.8).collect()))
    lsh = sorted(
        map(
            tuple,
            cosine_near_pairs_lsh(
                df, DIM, threshold=0.8, n_planes=8, probe_hamming=8
            ).collect(),
        )
    )
    assert lsh == exact
    assert len(exact) > 0  # non-vacuous: clustered vectors do produce pairs


def test_cosine_near_pairs_lsh_recall_monotone(spark, vecs):
    """Partial probing is a recall knob: no false pairs ever, recall
    non-decreasing in probe_hamming, and decent at moderate probes."""
    from text_indexer_spark.operators.similarity import cosine_near_pairs_lsh

    df, _ = vecs
    exact = set(
        (r["vec_a"], r["vec_b"]) for r in cosine_near_pairs(df, threshold=0.8).collect()
    )
    prev = -1.0
    for ph in (1, 3, 5, 8):
        got = set(
            (r["vec_a"], r["vec_b"])
            for r in cosine_near_pairs_lsh(
                df, DIM, threshold=0.8, n_planes=8, probe_hamming=ph
            ).collect()
        )
        assert got <= exact  # candidates are verified: zero false positives
        rec = len(got & exact) / len(exact)
        assert rec >= prev - 1e-9
        prev = rec
    assert prev == 1.0


def test_cosine_near_pairs_lsh_plan_has_no_cartesian(spark, vecs):
    from text_indexer_spark.operators.similarity import cosine_near_pairs_lsh
    from text_indexer_spark.plans.checks import formatted_plan

    df, _ = vecs
    plan = formatted_plan(
        cosine_near_pairs_lsh(df, DIM, threshold=0.8, n_planes=8, probe_hamming=2)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_ingest_layout_prunes_and_matches(spark, vecs, tmp_path):
    """ivf_ingest persists the corpus partitioned by cid; the indexed
    query path must (a) show a cid PARTITION filter in the scan plan —
    unprobed inverted lists are pruned before IO — and (b) return
    exactly what the filter-based ivf_topk returns for the same
    centroids/probes; full probe equals brute force."""
    from text_indexer_spark.operators.similarity import (
        ivf_centroids,
        ivf_ingest,
        ivf_topk,
        ivf_topk_indexed,
    )
    from text_indexer_spark.plans.checks import formatted_plan, has_partition_filter

    df, _ = vecs
    idx = str(tmp_path / "ivf")
    cents = ivf_centroids(df, 8, DIM)
    ivf_ingest(df, idx, DIM, n_centroids=8, centroids=cents)
    queries = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    got = ivf_topk_indexed(spark, idx, queries, k=5, n_probe=2)
    assert has_partition_filter(got, "cid")
    assert "PushedFilters" in formatted_plan(got)  # scan-level plan present
    exp = ivf_topk(df, queries, dim=DIM, k=5, n_centroids=8, n_probe=2, centroids=cents)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))

    # full probe over the persisted layout == brute force
    full = ivf_topk_indexed(spark, idx, queries, k=5, n_probe=8)
    brute = cosine_topk(df, queries, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))


# ----------------------------------------------------------- int8 store
def test_int8_quantization_error_within_bound(spark, vecs):
    df, mat = vecs
    rows = similarity.quantize_int8(df).collect()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for r in rows:
        q = np.array(r["qvec"], dtype=np.float64)
        assert q.min() >= -127 and q.max() <= 127
        err = np.abs(unit[r["vec_id"]] - r["scale"] * q)
        assert err.max() <= r["scale"] / 2 + 1e-12


def test_ann_int8_equals_brute_force(spark, vecs):
    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = sorted(map(tuple, similarity.cosine_topk(df, queries, k=7).collect()))
    quant = sorted(map(tuple, similarity.ann_int8_topk(df, queries, k=7).collect()))
    assert exact == quant and len(exact) == 6 * 7


def test_ann_int8_zero_vector_guard(spark):
    rows = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = similarity.quantize_int8(df)
    z = {r["vec_id"]: (r["scale"], r["qvec"]) for r in q.collect()}
    assert z[0] == (0.0, [0, 0, 0])  # zero vector -> zero scale, no crash
    # cosine against a zero vector is undefined: the quantized path
    # EXCLUDES it by contract (documented divergence from cosine_topk,
    # whose 0/0 NaN would sort first) — same ranking as the
    # zero-vector-free corpus, zero vector never returned
    queries = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = similarity.ann_int8_topk(df, queries, k=2).collect()
    ids = {r["vec_id"] for r in out}
    assert 0 not in ids
    assert [(r["vec_id"]) for r in sorted(out, key=lambda r: -r["cos"])][0] == 2
    nz = sorted(map(tuple, similarity.ann_int8_topk(
        df.filter(F.col("vec_id") != 0), queries, k=2
    ).collect()))
    assert nz == sorted(map(tuple, out))


def test_ivf_int8_full_probe_equals_brute_force(spark, vecs, tmp_path):
    df, _ = vecs
    idx = str(tmp_path / "ivf8")
    similarity.ivf_ingest(df, idx, DIM, n_centroids=4, quantize=True)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = sorted(map(tuple, cosine_topk(df, queries, k=9).collect()))
    ivf8 = sorted(map(tuple, similarity.ivf_topk_indexed_int8(
        spark, idx, queries, k=9, n_probe=4
    ).collect()))
    assert exact == ivf8
    # partial probe: recall loss is exactly the float IVF's — the int8
    # stage inside the probed lists is lossless
    fl = sorted(map(tuple, similarity.ivf_topk_indexed(
        spark, idx, queries, k=9, n_probe=2
    ).collect()))
    i8 = sorted(map(tuple, similarity.ivf_topk_indexed_int8(
        spark, idx, queries, k=9, n_probe=2
    ).collect()))
    assert fl == i8


def test_ivf_int8_bound_scan_prunes_float_column(spark, vecs, tmp_path):
    """The IO claim, plan-asserted: the bound-scan stage reads only the
    int8 columns (embedding absent from its ReadSchema) and the rerank
    scan reads the float column without qvec; both scans carry the
    partition filter."""
    df, _ = vecs
    idx = str(tmp_path / "ivf8p")
    similarity.ivf_ingest(df, idx, DIM, n_centroids=4, quantize=True)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    q = similarity.ivf_topk_indexed_int8(spark, idx, queries, k=5, n_probe=2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    bound = [s for s in schemas if "qvec" in s]
    rerank = [s for s in schemas if "embedding" in s]
    assert bound and all("embedding" not in s for s in bound)
    assert rerank and all("qvec" not in s for s in rerank)
    assert "PartitionFilters: [cid" in plan.replace("#", "") or "cid IN" in plan


def test_ivf_int8_requires_quantized_ingest(spark, vecs, tmp_path):
    df, _ = vecs
    idx = str(tmp_path / "ivf_noq")
    similarity.ivf_ingest(df, idx, DIM, n_centroids=2)
    queries = df.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError):
        similarity.ivf_topk_indexed_int8(spark, idx, queries)


def test_ann_int8_randomized_geometries_equal_brute_force(spark):
    """Seeded random geometries (clustered, uniform, near-duplicate
    heavy) — the certified-bound admission must reproduce brute force
    exactly on all of them, not just the fixture's cluster shape."""
    rng = np.random.default_rng(20260819)
    for trial, make in enumerate([
        lambda: rng.normal(size=(80, 12)),                      # uniform
        lambda: np.repeat(rng.normal(size=(4, 12)), 20, axis=0)
        + 0.01 * rng.normal(size=(80, 12)),                     # near-dup heavy
        lambda: rng.normal(size=(80, 12)) * rng.uniform(0.1, 10, size=(80, 1)),  # mixed norms
    ]):
        mat = make()
        df = spark.createDataFrame(
            [(i, [float(x) for x in mat[i]]) for i in range(len(mat))],
            "vec_id long, embedding array<float>",
        )
        queries = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = sorted(map(tuple, cosine_topk(df, queries, k=6).collect()))
        quant = sorted(map(tuple, similarity.ann_int8_topk(df, queries, k=6).collect()))
        assert exact == quant, f"trial {trial}"


def test_quantize_int8_is_row_linear_not_cubic(spark):
    """Throughput regression guard for the r5 expression-staging fix:
    the original single-select quantize inlined ``scale`` (an aggregate
    over a transform over a division by an aggregate) inside the
    per-element qvec lambda — O(dim³) element evaluations per row,
    which turned 50 k rows × dim 64 into a multi-minute hang.  Staged,
    the same input quantizes in under a second; the bound here is
    generous (30 s) so only the cubic blowup can trip it, not VM
    noise."""
    import time

    rows = 50_000
    dim = 64
    df = (
        spark.range(rows)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    F.pmod(F.hash(F.col("id"), i), F.lit(1999)) - F.lit(999)
                ).cast("double")
                / F.lit(999.0),
            ).alias("embedding"),
        )
        .repartition(8)
        .localCheckpoint(eager=True)
    )
    t = time.time()
    assert similarity.quantize_int8(df).count() == rows
    assert time.time() - t < 30.0
