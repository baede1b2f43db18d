"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force cosine top-k per query vector: broadcast
  the (small) query set, JVM-side dot product via ``zip_with`` +
  ``aggregate`` (no Python in the scan), per-query top-k via window
  rank. The correctness baseline.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane signatures
  (deterministic, seeded via xxhash64 — no RNG state) bucket the corpus;
  each query searches only its bucket (plus optional multi-probe of
  1-bit flips). Turns O(N·Q) into O(N/2^b · Q) at recall < 1 —
  differential-tested for recall against the brute-force path.
* ``cosine_near_pairs`` — embedding near-dup: all pairs with cosine ≥
  threshold (exact; the LSH buckets bound the same join at scale).

All cosines are computed in float64 and rounded for cross-engine
comparison (the DuckDB oracle sums in a different order; 1 ulp diffs
must not flip results).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """(query_id, vec_id, cos) top-k neighbors per query, excluding the
    query row itself. ``queries`` = (query_id, query_vec)."""
    q = F.broadcast(queries.select(
        F.col("query_id"), F.col("query_vec")
    ))
    scored = (
        embeddings.crossJoin(q)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), F.col("query_vec")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, qvec: array<tinyint>, scale: double)`` — unit-normalized
    vectors scalar-quantized to int8 (per-vector symmetric scale
    ``max|unit_i| / 127``).  4× smaller than float32 / 8× smaller than
    float64 — at 100 TB the vector store's scan is bandwidth-bound, so
    int8 is a 4× throughput lever before any algorithmic pruning.  Pure
    codegen (``transform``/``aggregate`` HOFs), one scan, no shuffle.

    Reconstruction error is bounded per component by ``scale/2`` — the
    bound :func:`ann_int8_topk` turns into provably lossless pruning.

    Zero vectors quantize to (zeros, scale 0) instead of tripping
    ANSI's divide-by-zero (cosine against them stays undefined, as in
    :func:`cosine_topk`).

    Expression staging is load-bearing: each derived quantity (norm,
    unit vector, maxabs, scale) is ALIASED in its own projection and
    referenced more than once downstream, so Catalyst's CollapseProject
    keeps the alias instead of inlining it (it only inlines cheap or
    single-reference aliases).  The original single-select form inlined
    ``scale`` — itself an aggregate over a transform over a division by
    an aggregate — INSIDE the per-element qvec lambda: O(dim³) element
    evaluations per row (~260k at dim 64), which turned a 50 k-row
    quantize into a multi-minute hang.  Staged, each row costs
    O(4·dim).  Pinned by ``test_similarity.py`` (quantize-throughput
    regression guard)."""
    norm = _norm(F.col(vec_col))
    staged = (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            norm.alias("_n"),
        )
        .select(
            id_col,
            F.transform(
                "_v",
                lambda x: x.cast("double")
                / F.when(F.col("_n") > 0, F.col("_n")).otherwise(F.lit(1.0)),
            ).alias("_unit"),
        )
        .select(
            id_col,
            "_unit",
            F.aggregate(
                "_unit", F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
            ).alias("_maxabs"),
        )
        .select(
            id_col,
            "_unit",
            F.when(F.col("_maxabs") > 0, F.col("_maxabs") / F.lit(127.0))
            .otherwise(F.lit(0.0))
            .alias("scale"),
        )
        .select(
            F.col(id_col),
            F.when(
                F.col("scale") > 0,
                F.transform(
                    "_unit",
                    lambda x: F.round(x / F.col("scale"), 0).cast("tinyint"),
                ),
            )
            .otherwise(
                F.transform("_unit", lambda x: F.lit(0).cast("tinyint"))
            )
            .alias("qvec"),
            F.col("scale"),
        )
    )
    return staged


def ann_int8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k SERVED FROM the int8-quantized store —
    output identical to :func:`cosine_topk` by construction, not by
    luck:

    1. approximate every pair from the quantized vectors:
       ``approx = scale · Σ unit_q_i · qvec_i``; the per-pair error is
       bounded: ``|cos − approx| ≤ eps = scale/2 · ‖unit_q‖₁``;
    2. the k-th largest LOWER bound per query is a certified admission
       threshold: any vector of the true top-k has
       ``upper ≥ cos ≥ kth-exact ≥ kth-lower``, so keeping
       ``upper ≥ threshold`` keeps a SUPERSET of the true top-k;
    3. exact-rerank only the candidates against the full-precision
       vectors with :func:`cosine_topk`'s scoring (same rounding, same
       tie-break) — byte-identical output.

    The full-precision store is touched only for the candidate sliver
    (a semi-join by id), so the scan-heavy stage reads int8: 4× less
    IO than brute force with zero recall loss.  The admission margin is
    widened by the rounding quantum (``10^-round_to``) so the rounded
    tie-break of :func:`cosine_topk` cannot admit a vector the pruning
    dropped.

    Zero corpus vectors are EXCLUDED (scale 0 — cosine against them is
    undefined).  This is the one documented divergence from
    :func:`cosine_topk`, whose float division yields NaN for them and
    Spark sorts NaN as the largest double, surfacing garbage rows at
    rank 1; pre-filter zero vectors if the comparison must be
    row-identical on such (undefined) inputs."""
    pairs = (
        quantize_int8(embeddings, id_col, vec_col)
        .filter(F.col("scale") > 0)
        .crossJoin(_unit_queries(queries))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    cand = _certified_candidates(pairs, k, id_col, 10.0 ** (-round_to))
    rerank = (
        cand.join(embeddings.select(id_col, vec_col), id_col)
        .join(
            F.broadcast(queries.select("query_id", "query_vec")), "query_id"
        )
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                cosine_expr(F.col(vec_col), F.col("query_vec")), round_to
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        rerank.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _unit_queries(queries: DataFrame):
    """Broadcast (query_id, _uq unit vector, _ql1 L1 norm) — the query
    side every int8 bound needs.  The norm is staged in its own
    projection so the per-element division references a column, not a
    re-evaluated aggregate (see :func:`quantize_int8`)."""
    return F.broadcast(
        queries.select(
            "query_id",
            F.col("query_vec").alias("_qv"),
            _norm(F.col("query_vec")).alias("_qn"),
        )
        .select(
            "query_id",
            F.transform(
                "_qv", lambda x: x.cast("double") / F.col("_qn")
            ).alias("_uq"),
        )
        .select(
            "query_id",
            "_uq",
            F.aggregate(
                F.transform("_uq", F.abs), F.lit(0.0), lambda a, v: a + v
            ).alias("_ql1"),
        )
    )


def _certified_candidates(
    pairs: DataFrame, k: int, id_col: str, margin: float
) -> DataFrame:
    """(query_id, id) pairs certified to contain the true cosine top-k:
    ``pairs`` must carry (query_id, id, qvec, scale, _uq, _ql1); emits
    every pair whose error-bound UPPER estimate clears the k-th largest
    LOWER estimate (minus ``margin``)."""
    approx = F.col("scale") * F.aggregate(
        F.zip_with(
            F.col("_uq"), F.col("qvec"), lambda x, y: x * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    eps = F.col("scale") / 2 * F.col("_ql1")
    bounded = pairs.select(
        "query_id",
        F.col(id_col),
        (approx - eps).alias("_lo"),
        (approx + eps).alias("_hi"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_lo"), F.asc(id_col))
    thresh = (
        bounded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("query_id")
        .agg(F.min("_lo").alias("_thresh"))
    )
    return (
        bounded.join(F.broadcast(thresh), "query_id", "left")
        .filter(
            F.col("_thresh").isNull()
            | (F.col("_hi") >= F.col("_thresh") - F.lit(margin))
        )
        .select("query_id", id_col)
    )


def hyperplane_signature(
    vec_col, dim: int, n_planes: int = 8, seed: int = 42
):
    """Deterministic random-hyperplane LSH signature (integer bucket).

    Plane p's component for dimension d is ±1 from xxhash64(seed, p, d)
    — reproducible on any cluster size with zero RNG state. sign(v·h_p)
    sets bit p."""
    bits = []
    for p in range(n_planes):
        comp = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(comp > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN: search only the query's hyperplane bucket (+1-bit-flip
    neighbors when ``multiprobe``). Same output shape as cosine_topk."""
    emb_b = embeddings.withColumn(
        "bucket", hyperplane_signature(F.col(vec_col), dim, n_planes)
    )
    qsig = queries.withColumn(
        "qbucket", hyperplane_signature(F.col("query_vec"), dim, n_planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << p)).cast("int")
                for p in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("qbucket"))
    q = F.broadcast(
        qsig.select("query_id", "query_vec", F.explode(probes).alias("bucket"))
    )
    scored = (
        emb_b.join(q, "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), F.col("query_vec")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs (vec_a < vec_b, cos ≥ threshold).

    Exact O(N²) — the differential ORACLE for ``cosine_near_pairs_lsh``,
    which replaces the theta-join with a banded bucket equi-join at
    scale; use the LSH variant on real corpora."""
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), round_to).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def cosine_near_pairs_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Scale path for embedding near-dup pairs: hyperplane-LSH bucketed
    equi-join instead of the O(N²) theta-join.

    Each vector gets an ``n_planes``-bit hyperplane signature; the
    signature is split into ``probe_hamming + 1`` bands (pigeonhole, same
    machinery as ``dedup._band_split``): any two vectors whose signatures
    differ in ≤ ``probe_hamming`` bits share at least one exact band and
    are compared. For cos ≥ t pairs, P(one plane separates) = θ/π per
    plane, so signature Hamming concentrates near n_planes·θ/π — recall
    is tunable via probe_hamming and differential-tested against the
    exact scan. With ``probe_hamming ≥ n_planes`` every pair is compared
    (one band is zero-width → a single global bucket) and the result is
    EXACTLY ``cosine_near_pairs`` — that configuration is the driver-gated
    one, like ``ann_ivf_full_probe``.

    The join is an equi-join on (band_idx, band_val) — never a
    cartesian/broadcast-nested-loop (plan-asserted in tests for partial
    probes). Full probe (``probe_hamming ≥ n_planes``) DELEGATES to the
    exact pair scan: banding it would create one zero-width band = a
    single global bucket, i.e. every pair through ONE task (measured
    5.5× slower than the parallel exact scan at 5 000 vectors) — the
    result is identical either way, the exact scan is the faster
    physical plan for exhaustive comparison."""
    from text_indexer_spark.operators.dedup import _band_split

    if probe_hamming >= n_planes:
        return cosine_near_pairs(
            embeddings, threshold=threshold, id_col=id_col,
            vec_col=vec_col, round_to=round_to,
        )

    n_bands = probe_hamming + 1
    sigs = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), dim, n_planes).cast("long").alias("sig"),
    )
    banded = sigs.select(
        id_col,
        vec_col,
        F.explode(_band_split(F.col("sig"), n_planes, n_bands)).alias("b"),
    ).select(id_col, vec_col, "b.band_idx", "b.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(
                cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), round_to
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer (k-means, Lloyd refinement).

    Seeds = bottom-``n_centroids`` vectors by ``xxhash64(id)`` (a
    deterministic uniform sample — no RNG state, reruns identical).
    Each Lloyd step is two distributed operations: assignment via the
    vectorized numpy argmax UDF, update via a per-dimension
    ``posexplode → groupBy(cid, pos) → avg`` aggregation whose result is
    only ``n_centroids × dim`` rows — the only driver-sized piece.
    """
    import numpy as np

    seed_rows = (
        embeddings.select(vec_col, F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    cents = np.asarray([list(r[vec_col]) for r in seed_rows], dtype=np.float64)
    for _ in range(iters):
        assign = _centroid_assign_udf(cents)
        means = (
            embeddings.withColumn("cid", assign(F.col(vec_col)))
            .select("cid", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()  # empty cells keep their previous centroid
        got = {}
        for r in means:
            got.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        for cid, dims in got.items():
            for pos, m in dims.items():
                new[cid][pos] = m
        cents = new
    return [list(map(float, c)) for c in cents]


def _centroid_assign_udf(cents):
    """vec -> nearest-centroid id by cosine; one numpy matmul per Arrow
    batch (no per-row Python)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(cents, dtype=np.float64)
    cnorm = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if m.size == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mn @ cnorm.T, axis=1).astype(np.int32))

    return assign


def _centroid_probes_udf(cents, n_probe: int):
    """query vec -> the ``n_probe`` nearest centroid ids (IVF probe list)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(cents, dtype=np.float64)
    cnorm = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    p = min(n_probe, cmat.shape[0])

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            q = q / max(np.linalg.norm(q), 1e-12)
            sims = cnorm @ q
            top = np.argpartition(-sims, p - 1)[:p]
            out.append([int(x) for x in top[np.argsort(-sims[top], kind="stable")]])
        return pd.Series(out)

    return probes


def ivf_ingest(
    embeddings: DataFrame,
    index_dir: str,
    dim: int,
    n_centroids: int = 8,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
) -> list[list[float]]:
    """Ingest-time IVF layout: assign every vector its nearest-centroid
    ``cid`` ONCE and persist the corpus PARTITIONED BY ``cid`` (one
    directory per inverted list), with the centroids stored next to it.
    ``quantize=True`` additionally stores the int8 codes + scale per
    vector (see :func:`ivf_topk_indexed_int8`).

    This is the 100 TB shape: a query's probe set then becomes a
    partition-PRUNED scan (``ivf_topk_indexed``) — the other
    ``n_centroids − n_probe`` lists are never opened, enforced by a plan
    assertion in tests. The filter-based ``ivf_topk`` remains as the
    ad-hoc/oracle path over unpartitioned data."""
    from text_indexer_spark import storage

    if centroids is None:
        centroids = ivf_centroids(
            embeddings, n_centroids, dim, id_col=id_col, vec_col=vec_col
        )
    assign = _centroid_assign_udf(centroids)
    rows = embeddings.withColumn("cid", assign(F.col(vec_col)))
    if quantize:
        # IVF + SQ8 (the FAISS-standard pairing): the int8 codes live
        # NEXT TO the float vectors in the same partitioned files —
        # parquet's columnar layout means the bound-scan stage reads
        # only (id, qvec, scale) bytes and the rerank stage only
        # (id, embedding) for the candidate sliver (ReadSchema-asserted)
        q = quantize_int8(embeddings, id_col, vec_col)
        rows = rows.join(q, id_col)
    # range-partition on (cid, id) before the partitionBy write: ~1
    # file per inverted-list directory, hot cells split across ranges
    # (same layout rule as trigram segments and vecstore deltas) —
    # instead of one file per upstream partition per cid, which
    # measurably slows every probe (BENCH/vecstore_maint.json)
    from text_indexer_spark.operators.vecstore import _write_segment

    _write_segment(
        rows.sparkSession, rows, storage.join(index_dir, "vectors"), id_col
    )
    storage.write_json_atomic(
        storage.join(index_dir, "centroids.json"),
        {"dim": dim, "centroids": centroids, "quantized": quantize},
    )
    return centroids


def ivf_topk_indexed(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF ANN over an ``ivf_ingest``-persisted layout: the union of the
    queries' probe lists becomes a partition filter on the ``cid``-
    partitioned parquet — Spark prunes unprobed list directories at
    planning time (no IO, no decode; PartitionFilters in the plan).
    Same output shape/semantics as ``ivf_topk``."""
    from text_indexer_spark.operators.vecstore import current_centroids

    # resolve through the manifest: a retraining compaction versions
    # the quantizer, and probes must use the one the COMMITTED rows
    # were assigned with
    meta = current_centroids(index_dir)
    centroids = meta["centroids"]
    probes = _centroid_probes_udf(centroids, n_probe)
    q = queries.select(
        "query_id", "query_vec", F.explode(probes(F.col("query_vec"))).alias("cid")
    )
    # the probe-cid union is tiny (≤ queries × n_probe): collect it so
    # the scan filter is a LITERAL in-list — that is what lets Catalyst
    # prune partitions at plan time instead of scanning + filtering
    probe_cids = sorted({r["cid"] for r in q.select("cid").distinct().collect()})
    # resolved view = segment union minus tombstones (vecstore.py); a
    # never-upserted ivf_ingest layout short-circuits to the plain
    # pruned scan, so the batch path keeps its exact pre-maintenance plan
    from text_indexer_spark.operators.vecstore import resolved_vectors

    vectors = resolved_vectors(spark, index_dir, probe_cids, id_col=id_col)
    scored = (
        vectors.join(F.broadcast(q), "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), F.col("query_vec")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def ivf_topk_indexed_int8(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF + SQ8 serving over a ``quantize=True`` ingest — the two
    scale levers composed, both lossless within the probe set:

    * partition pruning (IVF): only the probed ``cid`` directories are
      opened — planning-time, no IO for the rest;
    * int8 bound scan (SQ8): inside the probed lists, the first pass
      reads ONLY the (id, qvec, scale) columns — ¼ the vector bytes —
      and the certified error-bound admission keeps a guaranteed
      superset of the probe set's true top-k;
    * exact rerank: the float ``embedding`` column is read for the
      candidate sliver alone.

    With a full probe the result is byte-identical to brute force
    (both stages are lossless); with a partial probe the recall loss is
    exactly the IVF probe's — the int8 stage never adds any."""
    from text_indexer_spark.operators.vecstore import current_centroids

    meta = current_centroids(index_dir)
    if not meta.get("quantized"):
        raise ValueError(
            "index was not ingested with quantize=True — use ivf_topk_indexed"
        )
    centroids = meta["centroids"]
    probes = _centroid_probes_udf(centroids, n_probe)
    q = queries.select(
        "query_id", "query_vec", F.explode(probes(F.col("query_vec"))).alias("cid")
    )
    probe_cids = sorted({r["cid"] for r in q.select("cid").distinct().collect()})
    from text_indexer_spark.operators.vecstore import resolved_vectors

    vectors = resolved_vectors(spark, index_dir, probe_cids, id_col=id_col)
    qn = _unit_queries(queries)
    pairs = (
        vectors.select(id_col, "qvec", "scale", "cid")
        .filter(F.col("scale") > 0)  # zero vectors: cosine undefined
        .join(F.broadcast(q.select("query_id", "cid")), "cid")
        .join(qn, "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    cand = _certified_candidates(pairs, k, id_col, 10.0 ** (-round_to))
    rerank = (
        cand.join(vectors.select(id_col, vec_col), id_col)
        .join(F.broadcast(queries.select("query_id", "query_vec")), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                cosine_expr(F.col(vec_col), F.col("query_vec")), round_to
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        rerank.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF ANN: partition the corpus into ``n_centroids`` inverted lists
    by nearest centroid; each query scans only its ``n_probe`` nearest
    lists. Same output shape as ``cosine_topk``. With
    ``n_probe == n_centroids`` every list is probed and results equal
    the brute-force scorer exactly (tested) — recall degrades gracefully
    as ``n_probe`` shrinks while cost drops to ~``n_probe/n_centroids``
    of the corpus per query.

    At 100 TB use ``ivf_ingest`` + ``ivf_topk_indexed``: the assignment
    is computed once at ingest, the corpus persisted partitioned by
    ``cid``, and a probe becomes a partition-pruned scan, not a filter
    over the full corpus (this function recomputes ``cid`` per call —
    the ad-hoc/differential path)."""
    if centroids is None:
        centroids = ivf_centroids(
            embeddings, n_centroids, dim, id_col=id_col, vec_col=vec_col
        )
    assign = _centroid_assign_udf(centroids)
    probes = _centroid_probes_udf(centroids, n_probe)
    emb_c = embeddings.withColumn("cid", assign(F.col(vec_col)))
    q = F.broadcast(
        queries.select(
            "query_id", "query_vec", F.explode(probes(F.col("query_vec"))).alias("cid")
        )
    )
    scored = (
        emb_c.join(q, "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), F.col("query_vec")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
