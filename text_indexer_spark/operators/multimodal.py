"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata.

The Spark-side plumbing is REAL and tested — schema (``schema.MEDIA_
SCHEMA``), partition-friendly batch shapes, Arrow-vectorized UDF
signatures over ``mapInPandas``. The actual byte decoding is STUBBED:
this container has no image/audio libraries, so ``decode_media`` either
raises ``NotImplementedError`` (strict mode) or applies a clearly-marked
deterministic fake decoder whose output shape matches what a real
decoder would produce (fixed-size float feature vector + width/height
style metadata derived from the payload hash). Swapping in a real
decoder means replacing ``_fake_decode_batch`` only.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "n_frames int, feature array<float>"
)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from a text table: payload =
    utf-8 bytes of the text (an opaque stand-in), kind cycles by id.
    Produces the MEDIA_SCHEMA shape the real pipelines would ingest."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
        F.to_json(F.struct(F.col(id_col).alias("src_doc"))).alias("meta_json"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE decoder (no media libs in this container).

    Real implementation contract: payload bytes → (width, height,
    n_frames, feature[FEATURE_DIM]). The fake derives them from
    sha256(payload) so results are stable across runs and cluster sizes.
    """
    payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
    digests = np.frombuffer(
        b"".join(hashlib.sha256(p).digest() for p in payloads), dtype=np.uint8
    ).reshape(len(payloads), 32)
    features = digests[:, :FEATURE_DIM].astype(np.float32) / 255.0
    kinds = pdf["kind"].to_numpy()
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].astype("int64").to_numpy(),
            "kind": kinds,
            "n_bytes": np.fromiter(map(len, payloads), dtype=np.int64, count=len(payloads)),
            "width": digests[:, 0].astype(np.int32) + 1,
            "height": digests[:, 1].astype(np.int32) + 1,
            "n_frames": np.where(
                kinds == "video", digests[:, 2].astype(np.int32) % 30 + 1, 1
            ).astype(np.int32),
            "feature": list(features),
        }
    )


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode / feature-extract via mapInPandas (Arrow batches of opaque
    payloads — the real shape of a multimodal decode stage: one Python
    process per partition, batch-at-a-time, no driver involvement).

    ``strict=True`` raises NotImplementedError — the honest marker that
    real decoding needs libs this container lacks."""
    if strict:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use strict=False for the deterministic "
            "fake decoder (same schema, same batch shape)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _fake_decode_batch(b)

    return media.select("media_id", "kind", "payload").mapInPandas(run, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame index (videos
    only; images/audio pass through with frame_idx 0). Pure expressions."""
    idxs = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    return decoded.select(
        "media_id", "kind", F.explode(idxs).alias("frame_idx"), "feature"
    )
