"""Per-partition checkpointing + atomic manifest commit.

The reference needs none of this — it is in-memory and non-persistent
("There is no need to save state between sessions", reference README.md:8)
with consistency via one mutex (``DocumentsIndexer.kt:29``). At cluster
scale the equivalents are:

* per-shard done markers with lineage + metrics (north rule: resumable
  builds, postings/sec + bytes + skew ratio logged per partition);
* an atomic ``_MANIFEST.json`` commit — partial writes are invisible
  until the manifest lands (the snapshot-isolation replacement for the
  reference's mutex, SURVEY §2.7 M6);
* all IO routes through ``storage`` (pyarrow.fs): local writes go to
  ``<file>.tmp.<uuid>`` then rename (atomic on one filesystem, so Spark
  task retries stay idempotent); on object stores a single-shot PUT is
  the atomic primitive and the manifest-last protocol carries the
  multi-file commit.
"""

from __future__ import annotations

import time

from text_indexer_spark import storage

MANIFEST = "_MANIFEST.json"


def atomic_write_json(path: str, payload: dict) -> None:
    storage.write_json_atomic(path, payload)


def atomic_write_bytes(path: str, payload: bytes) -> None:
    storage.write_bytes_atomic(path, payload)


def marker_path(index_dir: str, stage: str, shard_id: int | None = None) -> str:
    name = f"{stage}.done.json" if shard_id is None else f"{stage}_shard_{shard_id:05d}.done.json"
    return storage.join(index_dir, "checkpoints", name)


def write_marker(
    index_dir: str, stage: str, shard_id: int | None = None, **lineage
) -> None:
    storage.makedirs(storage.join(index_dir, "checkpoints"))
    payload = {"stage": stage, "shard_id": shard_id, "ts": time.time(), **lineage}
    atomic_write_json(marker_path(index_dir, stage, shard_id), payload)


def read_marker(index_dir: str, stage: str, shard_id: int | None = None) -> dict | None:
    return storage.read_json(marker_path(index_dir, stage, shard_id))


def done_shards(index_dir: str, stage: str) -> set[int]:
    out = set()
    prefix = f"{stage}_shard_"
    for name in storage.listdir(storage.join(index_dir, "checkpoints")):
        if name.startswith(prefix) and name.endswith(".done.json"):
            out.add(int(name[len(prefix) : len(prefix) + 5]))
    return out


BOUNDARIES = "_BOUNDARIES.json"


def write_boundaries(
    index_dir: str, num_shards: int, bounds: list[str],
    config: dict | None = None,
) -> None:
    """Persist the shard range boundaries before stage A starts: a
    resumed build must shard identically or completed-shard markers
    would describe the wrong doc ranges. ``config``: the layout-shaping
    build flags (positional payload, id scheme) — a resumed build must
    match them or finished shards would mix schemas."""
    storage.makedirs(index_dir)
    atomic_write_json(
        storage.join(index_dir, BOUNDARIES),
        {"num_shards": num_shards, "bounds": bounds, "config": config or {}},
    )


def read_boundaries(index_dir: str) -> tuple[int, list[str]] | None:
    d = storage.read_json(storage.join(index_dir, BOUNDARIES))
    if d is None:
        return None
    return int(d["num_shards"]), list(d["bounds"])


def read_build_config(index_dir: str) -> dict | None:
    """The layout flags the checkpointed build was started with (None if
    no checkpoint, {} for checkpoints predating the config field)."""
    d = storage.read_json(storage.join(index_dir, BOUNDARIES))
    if d is None:
        return None
    return dict(d.get("config", {}))


def commit_manifest(index_dir: str, manifest: dict) -> None:
    atomic_write_json(storage.join(index_dir, MANIFEST), manifest)


def read_manifest(index_dir: str) -> dict | None:
    return storage.read_json(storage.join(index_dir, MANIFEST))
