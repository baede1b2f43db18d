"""Incremental maintenance of the persisted IVF vector store.

``similarity.ivf_ingest`` writes the batch layout — vectors partitioned
by inverted list (``cid``) plus ``centroids.json``.  This module makes
that store a COMMITTED index with the same durability contract as the
posting-list index (``index_sync.py``), the trigram index
(``trigram.py``) and the registry (``registry.py``): immutable parquet
segments, a versioned JSON manifest, an atomically swapped LATEST
pointer (CAS-guarded, ``storage.swap_latest``), so a crash mid-upsert
never publishes a torn store and readers of the old version keep
working throughout.

Layout under ``index_dir``::

    centroids.json            coarse quantizer (ivf_ingest, unchanged)
    vectors/                  base segment from ivf_ingest (version 1)
    LATEST                    committed version number
    manifest_v{V}.json        {"segments": [..], "tombstones": {..}}
    seg_{V}/                  cid-partitioned parquet, immutable
    ts_{V}/                   parquet (vec_id,) — ids dead as of V

Read rule — identical to the trigram/LSM merge rule: a tombstone of
version V kills a vec_id's rows in segments STRICTLY OLDER than V; an
upsert commits the id's new row and its tombstone under the same
version, so the new row survives its own commit (replace-on-upsert).
In SQL: union segments tagged with their version, left-join the per-id
max tombstone version, keep ``seg_ver >= ts_ver``.

Centroids are NOT retrained on upsert — new vectors are assigned to the
EXISTING coarse quantizer (the FAISS ``IndexIVF.add`` convention).
Assignment quality drifts as the corpus distribution moves;
:func:`ivf_compact` folds the segment chain back into one base and can
retrain then.  Recall claims are unaffected: partial-probe recall is a
property of the probe, and full-probe results are exact regardless of
assignment.

At 100 TB: an upsert touches only the delta (tokenise nothing, shuffle
nothing but the delta — one cid-partitioned write of the changed
vectors); the base is never rewritten.  Tombstones are sync-sized and
join via AQE (broadcast at any realistic delta size); a long chain is
folded by compaction, the same role ``index_optimize`` plays for the
token index.  Probe pruning survives maintenance because every segment
is cid-partitioned and the probe IN-list lands on each segment scan
BEFORE the tombstone join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from text_indexer_spark import storage

# resolved-view output column order (quantized stores append qvec, scale)
_BASE_COLS = ("cid",)


def _manifest(index_dir: str) -> tuple[int, int, dict]:
    """Return ``(ptr, version, manifest)``.

    ``ptr`` is the raw LATEST value (0 when the file is absent) — the
    CAS expectation for the next commit.  ``version`` is the logical
    store version: a legacy ``ivf_ingest`` layout with no pointer reads
    as version 1 with the base directory as its only segment, so the
    first upsert over an existing batch ingest needs no migration step.
    """
    raw = storage.read_bytes(storage.join(index_dir, "LATEST"))
    if raw is not None:
        v = int(raw.decode().strip())
        m = storage.read_json(
            storage.join(index_dir, f"manifest_v{v:06d}.json")
        )
        if m is None:
            raise FileNotFoundError(
                f"LATEST at {index_dir} points to v{v} but manifest_v{v:06d}"
                ".json is missing"
            )
        return v, v, m
    if storage.exists(storage.join(index_dir, "vectors")):
        return 0, 1, {"segments": {"vectors": 1}, "tombstones": {}}
    return 0, 0, {"segments": {}, "tombstones": {}}


def current_centroids(index_dir: str) -> dict:
    """The coarse-quantizer metadata the CURRENT committed version was
    assigned with: the manifest's ``centroids_file`` when present (a
    retraining compaction versions the quantizer — see
    :func:`ivf_compact`), else the bootstrap ``centroids.json`` from
    ``ivf_ingest``.  Readers and writers must resolve through here, not
    read ``centroids.json`` directly: the bootstrap file is immutable
    after ingest precisely so that a crash mid-retrain can never leave
    probes computed against a quantizer the committed rows were not
    assigned with."""
    _, version, m = _manifest(index_dir)
    if version == 0:
        raise FileNotFoundError(f"no vector store under {index_dir}")
    name = m.get("centroids_file", "centroids.json")
    meta = storage.read_json(storage.join(index_dir, name))
    if meta is None:
        raise FileNotFoundError(f"no {name} under {index_dir}")
    return meta


def _commit(index_dir: str, ptr: int, version: int, manifest: dict) -> None:
    storage.write_json_atomic(
        storage.join(index_dir, f"manifest_v{version:06d}.json"), manifest
    )
    storage.swap_latest(index_dir, ptr, version)


def resolved_vectors(
    spark,
    index_dir: str,
    probe_cids: list[int] | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """The live view of the store: segment union minus tombstoned rows.

    ``probe_cids`` (the IVF probe set) filters EACH segment scan before
    the tombstone join, so Catalyst prunes unprobed list directories of
    every segment at planning time — maintenance does not cost the
    store its pruning.  A single-segment store with no tombstones (the
    ivf_ingest batch layout, or any post-compaction store) short-
    circuits to the plain scan: zero overhead, identical plan to the
    pre-maintenance reader.
    """
    _, version, m = _manifest(index_dir)
    if version == 0:
        raise FileNotFoundError(f"no vector store under {index_dir}")

    def scan(name: str) -> DataFrame:
        df = spark.read.parquet(storage.join(index_dir, name))
        if probe_cids is not None:
            df = df.filter(F.col("cid").isin(list(probe_cids)))
        return df

    segments = sorted(m["segments"].items(), key=lambda kv: kv[1])
    tombstones = sorted(m.get("tombstones", {}).items(), key=lambda kv: kv[1])
    if len(segments) == 1 and not tombstones:
        return scan(segments[0][0])

    view = None
    for name, ver in segments:
        part = scan(name).withColumn("_seg_ver", F.lit(ver))
        # allowMissingColumns: a delta whose rows lack a metadata
        # column the base carries (schema evolution) unions as null
        view = (
            part
            if view is None
            else view.unionByName(part, allowMissingColumns=True)
        )
    if not tombstones:
        return view.drop("_seg_ver")
    dead = None
    for name, ver in tombstones:
        part = (
            spark.read.parquet(storage.join(index_dir, name))
            .select(id_col)
            .withColumn("_ts_ver", F.lit(ver))
        )
        dead = part if dead is None else dead.unionByName(part)
    dead = dead.groupBy(id_col).agg(F.max("_ts_ver").alias("_ts_ver"))
    # delta-sized right side: AQE broadcasts it; not forced (ADVICE
    # precedent — an unbounded forced broadcast is a scale hazard)
    return (
        view.join(dead, id_col, "left")
        .filter(F.col("_ts_ver").isNull() | (F.col("_seg_ver") >= F.col("_ts_ver")))
        .drop("_seg_ver", "_ts_ver")
    )


def _write_segment(spark, rows: DataFrame, seg_dir: str, id_col: str) -> None:
    """Write one immutable cid-partitioned segment with a bounded file
    count: range-repartition on (cid, id) first, so each inverted-list
    directory gets ~1 file (hot cells split across ranges — the same
    layout rule as the trigram segments) instead of one file per
    upstream shuffle partition per cid.  Measured: a compacted segment
    written straight from the resolved view's join partitioning carried
    ~shuffle_partitions×n_centroids tiny files and served ~40 % SLOWER
    than the 4-segment chain it replaced (BENCH/vecstore_maint.json);
    this write fixed it."""
    rows.repartitionByRange(
        spark.sparkContext.defaultParallelism, "cid", id_col
    ).write.mode("overwrite").partitionBy("cid").parquet(seg_dir)


def ivf_upsert(
    spark,
    index_dir: str,
    upserts: DataFrame | None,
    delete_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Commit one change set against the store: ``upserts`` rows
    replace any prior version of their ``vec_id`` (or insert), ids in
    ``delete_ids`` are removed.  Returns the committed version.

    The delta is assigned to the STORED centroids (a replaced vector
    whose embedding moved may land in a different inverted list — the
    tombstone kills the old row wherever it lives), quantized iff the
    store was ingested with ``quantize=True`` (a mixed store would make
    the int8 bound scan silently skip unquantized rows), and written as
    one immutable cid-partitioned segment plus one tombstone list.

    Contract, enforced: ``upserts`` must be distinct on ``vec_id``
    (last-wins inside a batch would be nondeterministic under Spark's
    unordered execution) and must not intersect ``delete_ids`` (the
    merge rule would keep the row — same version — which is never what
    a caller who listed the id in both meant).
    """
    from text_indexer_spark.operators.similarity import (
        _centroid_assign_udf,
        quantize_int8,
    )

    meta = current_centroids(index_dir)
    ptr, cur, m = _manifest(index_dir)
    if cur == 0:
        raise FileNotFoundError(f"no vector store under {index_dir}")
    version = cur + 1

    n_up = upserts.count() if upserts is not None else 0
    if upserts is not None and n_up != upserts.select(id_col).distinct().count():
        raise ValueError(
            f"ivf_upsert: duplicate {id_col} values in the upsert batch — "
            "resolve to one row per id before committing (within-batch "
            "last-wins would be nondeterministic)"
        )
    if upserts is not None and delete_ids is not None:
        both = upserts.select(id_col).join(
            delete_ids.select(id_col), id_col, "inner"
        ).limit(1).count()
        if both:
            raise ValueError(
                "ivf_upsert: an id appears in both upserts and delete_ids"
            )

    segments = dict(m["segments"])
    if n_up:
        # keep ALL caller columns (metadata rides along with the
        # vector, as it does in the base segment), add the assignment
        rows = upserts.withColumn(
            "cid", _centroid_assign_udf(meta["centroids"])(F.col(vec_col))
        )
        if meta.get("quantized"):
            rows = rows.join(quantize_int8(upserts, id_col, vec_col), id_col)
        seg = f"seg_{version:06d}"
        _write_segment(spark, rows, storage.join(index_dir, seg), id_col)
        segments[seg] = version

    tombstones = dict(m.get("tombstones", {}))
    dead = upserts.select(id_col) if n_up else None
    if delete_ids is not None:
        d = delete_ids.select(id_col).distinct()
        dead = d if dead is None else dead.unionByName(d)
    if dead is not None and not dead.isEmpty():
        ts = f"ts_{version:06d}"
        dead.write.mode("overwrite").parquet(storage.join(index_dir, ts))
        tombstones[ts] = version

    new_m = {"segments": segments, "tombstones": tombstones}
    if "centroids_file" in m:  # carry the versioned quantizer forward
        new_m["centroids_file"] = m["centroids_file"]
    _commit(index_dir, ptr, version, new_m)
    return version


def ivf_compact(
    spark,
    index_dir: str,
    id_col: str = "vec_id",
    retrain: bool = False,
    iters: int = 2,
) -> int:
    """Fold the segment chain into ONE fresh cid-partitioned base and
    commit a manifest with no tombstones — readers drop the tombstone
    join and the per-probe scan opens one directory per list again.

    ``retrain=True`` additionally re-fits the coarse quantizer on the
    LIVE corpus (Lloyd refinement seeded from the current centroids)
    and reassigns every vector — the answer to assignment drift after
    heavy upserting.  The retrained quantizer is written as a NEW
    versioned file (``centroids_v{V}.json``) referenced by the
    manifest, committed by the same atomic LATEST swap as the segment:
    a crash anywhere mid-compaction leaves the old version serving with
    the quantizer its rows were actually assigned with (the bootstrap
    ``centroids.json`` is never overwritten — found in self-review: the
    original write-in-place left a crash window where probes used new
    geometry against old assignments).  Old segments stay on disk until
    :func:`ivf_vacuum`.
    """
    from text_indexer_spark.operators.similarity import _centroid_assign_udf

    meta = current_centroids(index_dir)
    ptr, cur, parent = _manifest(index_dir)
    if cur == 0:
        raise FileNotFoundError(f"no vector store under {index_dir}")
    live = resolved_vectors(spark, index_dir, id_col=id_col)
    version = cur + 1
    new_m: dict = {"segments": {}, "tombstones": {}}
    if "centroids_file" in parent:
        new_m["centroids_file"] = parent["centroids_file"]
    if retrain:
        import numpy as np

        cents = np.asarray(meta["centroids"], dtype=np.float64)
        vec_col = "embedding"
        for _ in range(iters):
            assign = _centroid_assign_udf(cents)
            means = (
                live.withColumn("_cid", assign(F.col(vec_col)))
                .select("_cid", F.posexplode(F.col(vec_col)).alias("pos", "v"))
                .groupBy("_cid", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("m"))
                .collect()
            )  # n_centroids × dim rows — the only driver-sized piece
            new = cents.copy()
            for r in means:
                new[r["_cid"]][r["pos"]] = r["m"]
            cents = new
        centroids = [list(map(float, c)) for c in cents]
        live = live.drop("cid").withColumn(
            "cid", _centroid_assign_udf(centroids)(F.col(vec_col))
        )
        cfile = f"centroids_v{version:06d}.json"
        storage.write_json_atomic(
            storage.join(index_dir, cfile),
            {**meta, "centroids": centroids},
        )
        new_m["centroids_file"] = cfile
    seg = f"seg_{version:06d}"
    _write_segment(spark, live, storage.join(index_dir, seg), id_col)
    new_m["segments"] = {seg: version}
    _commit(index_dir, ptr, version, new_m)
    return version


def ivf_stats(spark, index_dir: str, id_col: str = "vec_id") -> dict:
    """Operational health of the store — the numbers that decide WHEN
    to compact (chain length, tombstone mass) and when to also retrain
    (cell imbalance, which partial-probe recall degrades with):

    * ``n_segments`` / ``n_tombstone_lists`` / ``version`` — chain
      shape; reads pay one union + anti-merge per extra segment;
    * ``n_live`` / ``n_tombstoned`` — live rows vs ids the merge
      filters on every read (dead weight compaction reclaims);
    * ``cell_sizes`` (per-cid live counts), ``imbalance`` — max cell /
      mean cell; 1.0 is perfectly balanced, large values mean hot
      cells dominate partial probes and the quantizer has drifted.

    One job over the live view (count per cid — the aggregate is
    n_centroids rows); tombstone counting is delta-sized.
    """
    _, version, m = _manifest(index_dir)
    if version == 0:
        raise FileNotFoundError(f"no vector store under {index_dir}")
    cells = {
        r["cid"]: r["n"]
        for r in resolved_vectors(spark, index_dir, id_col=id_col)
        .groupBy("cid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_ts = 0
    for name in m.get("tombstones", {}):
        n_ts += spark.read.parquet(storage.join(index_dir, name)).count()
    n_live = sum(cells.values())
    mean = n_live / max(len(cells), 1)
    return {
        "version": version,
        "n_segments": len(m["segments"]),
        "n_tombstone_lists": len(m.get("tombstones", {})),
        "n_live": n_live,
        "n_tombstoned": n_ts,
        "n_cells": len(cells),
        "cell_sizes": dict(sorted(cells.items())),
        "imbalance": round(max(cells.values()) / mean, 3) if cells else 0.0,
        "quantized": bool(current_centroids(index_dir).get("quantized")),
    }


def ivf_vacuum(index_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete segments, tombstones and manifests no version in the
    newest ``keep_versions`` window references — reachability, not age:
    the base segment of a never-compacted store is referenced by every
    manifest and survives any vacuum.  Files whose encoded version is
    above the LATEST pointer belong to an in-flight commit and are
    never touched.  Idempotent; returns removed base names, sorted.
    """
    raw = storage.read_bytes(storage.join(index_dir, "LATEST"))
    cur = int(raw.decode().strip()) if raw is not None else 0
    if cur == 0:
        return []
    floor = max(1, cur - max(keep_versions, 1) + 1)
    keep: set[str] = set()
    for v in range(floor, cur + 1):
        m = storage.read_json(
            storage.join(index_dir, f"manifest_v{v:06d}.json")
        )
        if m:
            keep.update(m.get("segments", {}))
            keep.update(m.get("tombstones", {}))
            if "centroids_file" in m:
                keep.add(m["centroids_file"])
    removed: list[str] = []
    for name in storage.listdir(index_dir):
        if name.startswith(("seg_", "ts_")):
            v = int(name.split("_", 1)[1])
            if v > cur or name in keep:
                continue
            storage.rmtree(storage.join(index_dir, name))
            removed.append(name)
        elif name.startswith("centroids_v") and name.endswith(".json"):
            # versioned quantizers from retraining compactions; the
            # bootstrap centroids.json is never touched
            v = int(name[len("centroids_v") : -len(".json")])
            if v > cur or name in keep:
                continue
            storage.remove_file(storage.join(index_dir, name))
            removed.append(name)
        elif name.startswith("manifest_v") and name.endswith(".json"):
            v = int(name[len("manifest_v") : -len(".json")])
            if v >= floor:
                continue
            storage.remove_file(storage.join(index_dir, name))
            removed.append(name)
    return sorted(removed)
