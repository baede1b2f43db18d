"""Near-dup clustering: candidate pairs → duplicate clusters → cleaned
corpus.

The dedup family (``dedup.py``/``similarity.py``) emits PAIRS; a
training pipeline needs the transitive closure of those pairs — one
cluster per connected component — and a corpus with one canonical doc
kept per cluster (the reference analogue actually drops dupes at scan
time, ``file/FilesAndDirs.kt:12-16``; near-dup groups generalize that
"first wins" to "min doc_id wins").

``connected_components`` is iterative min-label propagation, pure
DataFrame joins — no GraphFrames dependency:

* each node starts labeled with itself;
* every round, each node takes the min of its own label and its
  neighbors' labels (one shuffle join + one aggregation per round);
* converged when the global label sum stops decreasing (labels only
  ever decrease, so the sum is a strictly-decreasing convergence
  witness — checking it is a single tiny aggregate, no row-level diff
  join needed).

Scale notes (100 TB):
* rounds = graph diameter. LSH/exact dup components are near-cliques
  (every member shares a band bucket with most others), so diameter is
  2-3 and the loop runs 3-4 rounds, each ONE shuffle on the edge list.
  For adversarial long-chain graphs the alternating large-star /
  small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14) halves chains per round; diameter-ish
  inputs from near-dup detection don't need it.
* lineage is cut every round — without it the plan doubles per
  iteration and the driver OOMs on plan size long before data size
  matters. Default is ``localCheckpoint`` (executor-memory blocks, no
  external storage needed); pass ``checkpoint_dir`` to use RELIABLE
  ``checkpoint()`` instead, which survives executor loss — the right
  mode for multi-hour 100 TB runs where losing one executor must not
  restart the whole fixpoint.
* the edge list is materialized once (symmetrized + distinct) and
  reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id of its connected component.

    Deterministic: the fixpoint of min-propagation is unique regardless
    of join order, so reruns (and different cluster sizes) agree.

    ``checkpoint_dir``: when set, per-round lineage cuts use RELIABLE
    ``checkpoint()`` into that directory (HDFS/object-store path on a
    real cluster) instead of ``localCheckpoint`` — survives executor
    loss at the cost of one write+read per round.
    """
    from pyspark.sql.types import IntegralType

    for c in (src, dst):
        if not isinstance(pairs.schema[c].dataType, IntegralType):
            # a silent cast("long") would turn string ids into NULLs and
            # drop every edge — the closure would "succeed" with zero
            # clusters (a real silent-no-op failure mode, found in review)
            raise ValueError(
                f"connected_components needs integral node ids; column "
                f"{c!r} is {pairs.schema[c].dataType.simpleString()} — "
                "map ids to longs (e.g. xxhash64) before clustering"
            )
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = pairs.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b"))
    edges = cut(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    )
    labels = cut(
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    if prev_sum is None:  # no edges at all
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
        )
        labels = cut(labels)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_clusters(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Duplicate clusters from any pair source (exact groups, LSH
    candidates, simhash bands, cosine near-pairs — or their union).
    Output: (doc_id, cluster_id), one row per clustered doc."""
    return connected_components(pairs, src=src, dst=dst)


def materialize_deduped(
    corpus: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cleaned corpus: drop every clustered doc except its canonical
    (min-id) representative; docs in no cluster pass through.

    One shuffle join on ``doc_id`` (the cluster map can be corpus-sized
    at 100 TB — a broadcast is wrong here; AQE converts it to a
    broadcast automatically when the map happens to be small)."""
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return corpus.join(losers, id_col, "left_anti")
