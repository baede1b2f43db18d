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
* executor-side writes go to ``<file>.tmp.<uuid>`` then ``os.rename``
  (atomic on one filesystem), so Spark task retries stay idempotent.
"""

from __future__ import annotations

import json
import os
import time
import uuid


MANIFEST = "_MANIFEST.json"


def atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.rename(tmp, path)


def atomic_write_bytes(path: str, payload: bytes) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.rename(tmp, path)


def marker_path(index_dir: str, stage: str, shard_id: int | None = None) -> str:
    name = f"{stage}.done.json" if shard_id is None else f"{stage}_shard_{shard_id:05d}.done.json"
    return os.path.join(index_dir, "checkpoints", name)


def write_marker(
    index_dir: str, stage: str, shard_id: int | None = None, **lineage
) -> None:
    os.makedirs(os.path.join(index_dir, "checkpoints"), exist_ok=True)
    payload = {"stage": stage, "shard_id": shard_id, "ts": time.time(), **lineage}
    atomic_write_json(marker_path(index_dir, stage, shard_id), payload)


def read_marker(index_dir: str, stage: str, shard_id: int | None = None) -> dict | None:
    p = marker_path(index_dir, stage, shard_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def done_shards(index_dir: str, stage: str) -> set[int]:
    d = os.path.join(index_dir, "checkpoints")
    if not os.path.isdir(d):
        return set()
    out = set()
    prefix = f"{stage}_shard_"
    for name in os.listdir(d):
        if name.startswith(prefix) and name.endswith(".done.json"):
            out.add(int(name[len(prefix) : len(prefix) + 5]))
    return out


BOUNDARIES = "_BOUNDARIES.json"


def write_boundaries(index_dir: str, num_shards: int, bounds: list[str]) -> None:
    """Persist the shard range boundaries before stage A starts: a
    resumed build must shard identically or completed-shard markers
    would describe the wrong doc ranges."""
    os.makedirs(index_dir, exist_ok=True)
    atomic_write_json(
        os.path.join(index_dir, BOUNDARIES),
        {"num_shards": num_shards, "bounds": bounds},
    )


def read_boundaries(index_dir: str) -> tuple[int, list[str]] | None:
    p = os.path.join(index_dir, BOUNDARIES)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return int(d["num_shards"]), list(d["bounds"])


def commit_manifest(index_dir: str, manifest: dict) -> None:
    atomic_write_json(os.path.join(index_dir, MANIFEST), manifest)


def read_manifest(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
