"""Maintenance-cost probe for the committed IVF vector store.

Measures what `vecstore.ivf_upsert` maintenance costs the SERVE path
at the bench-ANN corpus scale (same deterministic 50 k × dim-64 corpus
as `bench.py run_ann`): warm full-probe top-10 latency over

  (a) the freshly ingested single-segment store,
  (b) the store after three maintenance commits
      (replace ~2 %, insert ~2 %, delete ~1 % — a 4-segment chain with
      two tombstone lists, so the reader pays the union + tombstone
      anti-merge),
  (c) the store after `ivf_compact` (folded back to one segment —
      the reader short-circuits to the plain pruned scan again).

Also asserts, at this scale, that (b) serves EXACTLY what a from-
scratch ingest of the logical corpus serves (the maintained store's
correctness witness outside the driver gate's sf0.01/sf0.1 scales).

Run:  python BENCH/vecstore_probe.py [master] [sf_dir]
Emits one JSON line; recorded in BENCH/vecstore_maint.json and
discussed in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.similarity import (
        ivf_ingest,
        ivf_topk_indexed,
    )
    from text_indexer_spark.operators.vecstore import ivf_compact, ivf_upsert
    from text_indexer_spark.session import get_spark

    master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    target = int(os.environ.get("SPARK_GRAFT_ANN_VECTORS", "50000"))
    noise = 2.5e-4
    n_centroids = 16
    n_queries = 20
    k = 10

    spark = get_spark("vecstore-probe", master=master)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_n = emb.count()
    n_reps = max(1, target // base_n)
    dim = len(emb.select("embedding").first()[0])
    rep = spark.range(n_reps).select(F.col("id").alias("rep"))

    def perturbed(shift: int):
        # same deterministic hash perturbation as bench.run_ann; `shift`
        # derives a DIFFERENT deterministic vector for replacement rows
        return (
            emb.crossJoin(rep)
            .select(
                (F.col("vec_id") * n_reps + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + (
                        F.pmod(
                            F.hash(
                                F.col("vec_id") + F.lit(shift),
                                F.col("rep"),
                                i,
                            ),
                            F.lit(2001),
                        )
                        - F.lit(1000)
                    ).cast("double")
                    * F.lit(noise),
                ).alias("embedding"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
        )

    big = perturbed(0).localCheckpoint(eager=True)
    n_vectors = big.count()
    queries = (
        emb.orderBy("vec_id")
        .limit(n_queries)
        .select(
            (F.col("vec_id") + F.lit(10_000_000)).alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint(eager=True)
    )

    def warm_serve(idx: str) -> tuple[float, list]:
        best, rows = None, None
        for _ in range(2):
            t0 = time.time()
            rows = ivf_topk_indexed(
                spark, idx, queries, k=k, n_probe=n_centroids
            ).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4), sorted(map(tuple, rows))

    out: dict = {
        "n_vectors": n_vectors, "dim": dim, "n_centroids": n_centroids,
        "n_queries": n_queries, "k": k,
    }

    idx = tempfile.mkdtemp(prefix="vecstore_probe_")
    t0 = time.time()
    ivf_ingest(big, idx, dim, n_centroids=n_centroids)
    out["ingest_sec"] = round(time.time() - t0, 2)
    warm_serve(idx)  # unmeasured JIT/page warm-up: the first serve of
    # the session otherwise penalizes exactly one arm (measurement
    # order), observed as ±0.5 s drift at this 12 MB corpus scale
    out["fresh_serve_sec"], _ = warm_serve(idx)

    # maintenance: replace ~2 % (ids ≡0 mod 50, new deterministic
    # vectors), insert ~2 % (ids above the corpus), delete ~1 %
    # (ids ≡7 mod 100) — three commits, 4-segment/2-tombstone chain
    replaced = perturbed(17).filter(F.col("vec_id") % 50 == 0)
    inserted = perturbed(23).filter(F.col("vec_id") % 50 == 1).withColumn(
        "vec_id", F.col("vec_id") + F.lit(100_000_000)
    )
    deletes = big.filter(F.col("vec_id") % 100 == 7).select("vec_id")
    t0 = time.time()
    ivf_upsert(spark, idx, replaced)
    ivf_upsert(spark, idx, inserted)
    ivf_upsert(spark, idx, None, deletes)
    out["maint_commits_sec"] = round(time.time() - t0, 2)
    out["n_replaced"] = replaced.count()
    out["n_inserted"] = inserted.count()
    out["n_deleted"] = deletes.count()
    out["maintained_serve_sec"], maintained = warm_serve(idx)

    # correctness witness: a from-scratch ingest of the logical corpus
    # (same centroids file so assignments match) serves the same rows
    logical = (
        big.join(deletes.withColumnRenamed("vec_id", "d"),
                 F.col("vec_id") == F.col("d"), "left_anti")
        .join(replaced.select(F.col("vec_id").alias("r")),
              F.col("vec_id") == F.col("r"), "left_anti")
        .unionByName(replaced)
        .unionByName(inserted)
    )
    from text_indexer_spark import storage

    cents = storage.read_json(storage.join(idx, "centroids.json"))["centroids"]
    idx2 = tempfile.mkdtemp(prefix="vecstore_probe_rebuild_")
    ivf_ingest(logical, idx2, dim, n_centroids=n_centroids, centroids=cents)
    _, rebuilt = warm_serve(idx2)
    out["maintained_equals_rebuild"] = maintained == rebuilt

    t0 = time.time()
    ivf_compact(spark, idx)
    out["compact_sec"] = round(time.time() - t0, 2)
    out["compacted_serve_sec"], compacted = warm_serve(idx)
    out["compacted_equals_maintained"] = compacted == maintained

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
