"""Storage abstraction for index/shard/manifest IO.

Round 1 assumed a shared POSIX filesystem (``os.rename`` atomicity,
hard links). A real cluster writes shards to an object store, so every
filesystem touch of the index layout now goes through this module,
backed by ``pyarrow.fs``:

* plain paths resolve to ``LocalFileSystem`` (the tested default —
  behavior is byte-identical to the previous direct ``os`` calls);
* URIs (``s3://…``, ``hdfs://…``, ``gs://…``, ``file://…``) resolve via
  ``pyarrow.fs.FileSystem.from_uri`` — no code change needed at the
  call sites, just an index_dir that is a URI.

Atomicity model per backend:

* local: write ``<file>.tmp.<uuid>`` then rename — atomic on one
  filesystem, so Spark task retries stay idempotent (the original
  design, ``checkpoint.py``).
* object stores: a single-shot PUT is already atomic-visible (readers
  see the old object or the new one, never a torn write), and rename
  doesn't exist — so the write goes directly to the final key. The
  ``_MANIFEST.json``-last commit protocol is what makes multi-file
  commits atomic at the index level on BOTH backends: partial shard
  uploads are invisible until the manifest lands.
* hard-link shard carry-over (incremental sync) degrades to a copy on
  filesystems without links — or, on the same object store, a
  server-side copy would be the production move; the fallback here is a
  stream copy, correct everywhere.
"""

from __future__ import annotations

import json
import os
import posixpath
import uuid


def _is_uri(path: str) -> bool:
    return "://" in path


def resolve(path: str):
    """path → (pyarrow FileSystem, fs-local path)."""
    from pyarrow import fs as pafs

    if _is_uri(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def join(base: str, *parts: str) -> str:
    return posixpath.join(base, *parts) if _is_uri(base) else os.path.join(base, *parts)


def _is_local(f) -> bool:
    from pyarrow import fs as pafs

    return isinstance(f, pafs.LocalFileSystem) or (
        isinstance(f, pafs.SubTreeFileSystem)
        and isinstance(f.base_fs, pafs.LocalFileSystem)
    )


def makedirs(path: str) -> None:
    f, p = resolve(path)
    f.create_dir(p, recursive=True)


def exists(path: str) -> bool:
    from pyarrow import fs as pafs

    f, p = resolve(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def isdir(path: str) -> bool:
    from pyarrow import fs as pafs

    f, p = resolve(path)
    return f.get_file_info(p).type == pafs.FileType.Directory


def listdir(path: str) -> list[str]:
    """Base names of the direct children of ``path`` ([] if absent)."""
    from pyarrow import fs as pafs

    f, p = resolve(path)
    if f.get_file_info(p).type == pafs.FileType.NotFound:
        return []
    infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    return [posixpath.basename(i.path) for i in infos]


def rmtree(path: str) -> None:
    """Recursively delete a directory (no-op if absent). Local hard
    links shared with other directories survive — only this directory's
    entries go away — so vacuuming an old index version never corrupts
    a newer one that carried shards over via ``link_or_copy``."""
    from pyarrow import fs as pafs

    f, p = resolve(path)
    if f.get_file_info(p).type != pafs.FileType.NotFound:
        f.delete_dir(p)


def remove_file(path: str) -> None:
    """Delete a single file (no-op if absent)."""
    from pyarrow import fs as pafs

    f, p = resolve(path)
    if f.get_file_info(p).type == pafs.FileType.File:
        f.delete_file(p)


def vacuum_versioned(
    dir_path: str,
    prefix: str,
    keep_last: int = 2,
    sidecar: str | None = None,
) -> list[str]:
    """Retention over a LATEST-pointer version chain: delete all but
    the newest ``keep_last`` committed ``<prefix><NNNNNN>`` dirs at or
    below the LATEST pointer.  Versions ABOVE the pointer (crash
    orphans from a failed commit) are never touched — the next commit
    overwrites them; the pointed-at version always survives
    (``keep_last`` floors at 1).  ``sidecar`` names a per-version file
    suffix (e.g. ``".meta.json"``) deleted with its version.
    Idempotent.  Returns the removed version dirs, oldest first."""
    raw = read_bytes(join(dir_path, "LATEST"))
    cur = int(raw.decode().strip()) if raw else 0
    if cur == 0:
        return []
    committed = [
        v
        for v in range(1, cur + 1)
        if exists(join(dir_path, f"{prefix}{v:06d}"))
    ]
    doomed = committed[: max(0, len(committed) - max(keep_last, 1))]
    removed = []
    for v in doomed:
        p = join(dir_path, f"{prefix}{v:06d}")
        rmtree(p)
        if sidecar:
            remove_file(join(dir_path, f"{prefix}{v:06d}{sidecar}"))
        removed.append(p)
    return removed


def write_bytes_atomic(path: str, payload: bytes) -> None:
    f, p = resolve(path)
    if _is_local(f):
        tmp = f"{p}.tmp.{uuid.uuid4().hex}"
        with f.open_output_stream(tmp) as out:
            out.write(payload)
        f.move(tmp, p)
    else:
        with f.open_output_stream(p) as out:  # single-shot PUT
            out.write(payload)


class ConcurrentCommitError(RuntimeError):
    """Another writer advanced the LATEST pointer between this commit's
    manifest read and its pointer write — the commit would silently
    drop that writer's version, so it fails instead."""


def swap_latest(dir_path: str, expected_version: int, new_version: int) -> None:
    """Advance ``dir_path``/LATEST from ``expected_version`` to
    ``new_version``, failing if a concurrent writer moved it first.

    The committed-index entry points (``trigram_commit``,
    ``registry.save_state``) are single-writer by contract — the
    streaming path serializes through foreachBatch, and concurrent CLI
    runs against one index dir are unsupported.  This guard turns a
    violated contract into a loud ``ConcurrentCommitError`` instead of a
    silently lost commit: the pointer is re-read immediately before the
    atomic write, shrinking the lost-update window from the whole build
    to the read-write gap (a fencing-token store would close it fully;
    local FS + object stores offer none portably)."""
    ptr = join(dir_path, "LATEST")
    raw = read_bytes(ptr)
    cur = int(raw.decode().strip()) if raw is not None else 0
    if cur != expected_version:
        raise ConcurrentCommitError(
            f"LATEST at {dir_path} is v{cur}, expected v{expected_version}: "
            "a concurrent writer committed first; re-read its manifest and "
            "retry this sync against the new version"
        )
    write_bytes_atomic(ptr, str(new_version).encode())


def write_json_atomic(path: str, payload: dict) -> None:
    write_bytes_atomic(
        path, json.dumps(payload, indent=2, sort_keys=True).encode("utf-8")
    )


def read_bytes(path: str) -> bytes | None:
    f, p = resolve(path)
    try:
        with f.open_input_stream(p) as src:
            return src.read()
    except (FileNotFoundError, OSError):
        return None


def read_json(path: str) -> dict | None:
    b = read_bytes(path)
    return None if b is None else json.loads(b.decode("utf-8"))


def write_parquet_atomic(table, path: str, row_group_size: int | None = None) -> None:
    """pyarrow Table → one parquet file, atomically visible."""
    import pyarrow.parquet as pq

    f, p = resolve(path)
    if _is_local(f):
        tmp = f"{p}.tmp.{uuid.uuid4().hex}"
        pq.write_table(table, tmp, filesystem=f, row_group_size=row_group_size)
        f.move(tmp, p)
    else:
        pq.write_table(table, p, filesystem=f, row_group_size=row_group_size)


def link_or_copy(src: str, dst: str) -> None:
    """Zero-copy shard carry-over where the filesystem supports it.

    Local: hard link (fall back to copy on EXDEV/EPERM). Non-local or
    cross-filesystem: stream copy (an object-store deployment would use
    server-side copy here). Idempotent — a re-run after a partial
    failure may find the destination already in place."""
    sf, sp = resolve(src)
    df, dp = resolve(dst)
    if _is_local(sf) and _is_local(df):
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        if os.path.exists(dp):
            if os.path.samefile(sp, dp):
                return
            os.remove(dp)
        try:
            os.link(sp, dp)
            return
        except OSError:
            pass  # cross-device / no-link fs → stream copy below
    parent = posixpath.dirname(dp)
    if parent:
        df.create_dir(parent, recursive=True)
    with sf.open_input_stream(sp) as s, df.open_output_stream(dp) as d:
        while True:
            chunk = s.read(1 << 20)
            if not chunk:
                break
            d.write(chunk)
