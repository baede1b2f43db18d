"""Stateful streaming dedup: emit each distinct content exactly once
across ALL micro-batches.

The batch engine dedups within a snapshot (``postings.dedup_corpus``);
a streaming ingest needs memory of what it already admitted — that is
per-key STATE, the one streaming capability ``foreachBatch`` cannot
express. Implemented with ``applyInPandasWithState`` (the custom
stateful-operator API):

* stream is keyed by a content-hash PREFIX (``state_buckets`` groups),
  not the full hash — state then holds one set of seen hashes per
  bucket, and the number of state rows is bounded by the bucket count
  while the per-bucket set grows with distinct-content volume. Hash
  keys are uniform by construction, so buckets stay balanced at any
  scale (same argument as the exact-dedup shuffle key).
* within a micro-batch AND across batches, only the first occurrence of
  a sha256 is emitted; later arrivals are dropped. First-wins inside a
  batch follows the batch's row order after a stable sort on
  (repo, path, commit) — deterministic under replay.
* state TTL is left unset (dedup state must not expire) — instead state
  GROWTH is bounded by compaction: pass ``seen_catalog`` (the committed
  index catalog, which IS the long-term seen-set) and the stream
  anti-joins it BEFORE the stateful operator, so state only accumulates
  content first seen since the catalog snapshot. Re-deploying the query
  after each index sync (fresh checkpoint, refreshed catalog) resets
  state to the inter-compaction window — the standard bounded-state
  pattern for monotone seen-sets.

The streaming checkpoint makes this exactly-once per Spark's streaming
guarantees: a replayed micro-batch re-derives the same admit/drop
decisions because state updates commit with the batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "content_sha256 string"
)
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["repo", "path", "commit"], kind="stable")
        mask = []
        for h in pdf["content_sha256"]:
            fresh = h not in seen
            mask.append(fresh)
            if fresh:
                seen.add(h)
        kept = pdf[pd.Series(mask, index=pdf.index)]
        if len(kept):
            out.append(kept[[c.split()[0] for c in OUT_SCHEMA.split(", ")]])
    state.update((sorted(seen),))
    for o in out:
        yield o


def stream_dedup_exact(
    changes: DataFrame,
    state_buckets: int = 64,
    seen_catalog: DataFrame | None = None,
) -> DataFrame:
    """Streaming corpus rows → first-seen-only rows (exact content
    dedup with cross-batch memory).

    ``seen_catalog``: optional STATIC frame with a ``content_sha256``
    column (the committed index catalog). Content already in it is
    dropped by a stream-static left_anti join before the stateful
    operator — state then only grows with content that is new since the
    catalog snapshot, which bounds state size to one compaction window.
    """
    hashed = changes.withColumn(
        "content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    )
    if seen_catalog is not None:
        hashed = hashed.join(
            seen_catalog.select("content_sha256").distinct(),
            "content_sha256",
            "left_anti",
        )
    hashed = hashed.withColumn(
        "_bucket",
        F.pmod(F.xxhash64("content_sha256"), F.lit(state_buckets)).cast("int"),
    )
    return (
        hashed.groupBy("_bucket")
        .applyInPandasWithState(
            _dedup_fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
