"""SemDeDup — semantic deduplication inside embedding clusters
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"; used to trim LAION/web corpora).

The published recipe: k-means-cluster the embeddings, compare pairs
ONLY within a cluster (that confinement is the whole scale argument —
all-pairs is O(N²), within-cluster pairs are Σ|cluster|², tractable
when clusters are balanced), mark pairs with cosine above a threshold
as semantic duplicates, and keep ONE document per duplicate group —
the paper keeps the example with the LOWEST similarity to its cluster
centroid (the least prototypical survivor preserves diversity).

Composition over the engine's existing parts, nothing bespoke:

* the coarse quantizer is :func:`similarity.ivf_centroids` (the same
  deterministic k-means the IVF ANN store uses) — or pass
  ``centroids=`` to reuse a persisted store's quantizer verbatim;
* assignment is the shared vectorized numpy argmax UDF; the
  centroid-similarity used by the keep rule is a pure-JVM
  ``cosine_expr`` against the broadcast ``(cid, cvec)`` table;
* within-cluster pairs are an EQUI-join on ``cid`` (never a
  cartesian; hot clusters are ordinary join skew — AQE splits them);
* duplicate groups are the transitive closure via
  :func:`cluster.connected_components` (min-label propagation), so
  chains a→b→c collapse to one survivor exactly like the text-dedup
  tiers;
* the keep rule is one ``min(struct(...))`` aggregation per group:
  ``keep="centroid_far"`` (the paper's rule — min centroid cosine,
  doc-id tie-break) or ``keep="min_id"`` (the engine-wide canonical
  rule shared with ``materialize_deduped``; with ``n_centroids=1``
  that configuration is EXACTLY global embedding near-dup dedup,
  differential-tested).

Cross-cluster near-duplicates are NOT found — that is the paper's
stated recall trade (quantization loss of the coarse clustering), the
same admission the LSH tiers make, and the reason the exact pair scan
remains the oracle at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.operators.cluster import connected_components
from text_indexer_spark.operators.similarity import (
    _centroid_assign_udf,
    cosine_expr,
    ivf_centroids,
)

ROUND = 4


def assign_clusters(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, vec, cid, ccos)`` — nearest-centroid assignment (Arrow
    argmax kernel) plus the cosine to that centroid (JVM expression
    against the broadcast centroid table; ``ROUND``-dp rounded like
    every cosine this engine emits)."""
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, cvec array<double>",
    )
    assign = _centroid_assign_udf(centroids)
    return (
        embeddings.select(
            F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cid")
        )
        .join(F.broadcast(cent_df), "cid")
        .select(
            id_col,
            vec_col,
            "cid",
            F.round(cosine_expr(F.col(vec_col), F.col("cvec")), ROUND).alias(
                "ccos"
            ),
        )
    )


def semantic_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_a, vec_b, cos)`` with ``vec_a < vec_b`` — within-cluster
    pairs at or above the cosine threshold.  Equi-join on ``cid``; the
    id inequality and the cosine run as join-side filters."""
    a = assigned.select(
        F.col("cid"),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_va"),
    )
    b = assigned.select(
        F.col("cid"),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_vb"),
    )
    return (
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), ROUND).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(float(threshold)))
    )


def semantic_dedup(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.99,
    n_centroids: int = 8,
    centroids: list[list[float]] | None = None,
    keep: str = "centroid_far",
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The semantically deduplicated embedding corpus: all original
    columns, one survivor per within-cluster duplicate group, unpaired
    rows untouched.

    ``keep="centroid_far"`` keeps the group member LEAST similar to
    its cluster centroid (the paper's diversity-preserving rule;
    ties → min doc id).  A group that straddles clusters (possible
    through transitive closure when a chain crosses an assignment
    boundary) evaluates the rule on each member's OWN centroid
    similarity.  ``keep="min_id"`` keeps the min id (the
    ``materialize_deduped`` convention).
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    if keep not in ("centroid_far", "min_id"):
        raise ValueError("keep must be 'centroid_far' or 'min_id'")
    if centroids is None:
        centroids = ivf_centroids(
            embeddings, n_centroids, dim, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = assign_clusters(embeddings, centroids, id_col, vec_col)
    pairs = semantic_pairs(assigned, threshold, id_col, vec_col)
    comps = connected_components(pairs, src="vec_a", dst="vec_b")
    if keep == "min_id":
        losers = comps.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
    else:
        members = comps.join(
            assigned.select(F.col(id_col).alias("doc_id"), "ccos"), "doc_id"
        )
        keepers = members.groupBy("cluster_id").agg(
            F.min(F.struct(F.col("ccos"), F.col("doc_id"))).alias("_k")
        ).select(F.col("_k.doc_id").alias("_keep_id"))
        losers = members.join(
            keepers, members["doc_id"] == keepers["_keep_id"], "left_anti"
        ).select(F.col("doc_id").alias(id_col))
    return embeddings.join(losers, id_col, "left_anti")
