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

    Exact O(N²) — the oracle for the LSH-bucketed variant, which
    replaces the crossJoin with a per-bucket join at scale."""
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
