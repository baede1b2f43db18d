"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata — REAL codecs, pure numpy, three public formats.

- image → BMP (Windows bitmap, 24-bit uncompressed BI_RGB; bottom-up
  rows padded to 4 bytes — the format spec is public and trivially
  byte-addressable)
- audio → WAV (RIFF PCM, 16-bit little-endian mono; chunk-walked, not
  offset-assumed, so extra chunks before ``data`` parse correctly)
- video → Y4M (YUV4MPEG2: ASCII header ``YUV4MPEG2 W.. H.. F..`` then
  per-frame ``FRAME\\n`` + planar C420 payload)

``synthesize_media`` ENCODES genuine blobs of these formats from a text
table (deterministic: dimensions from ``doc_id``, pixel/sample content
from the utf-8 bytes of the text, cycled). ``decode_media`` sniffs the
magic bytes and DECODES for real: header fields are parsed from the
payload, pixels/samples are materialized, and the feature vector is a
16-bin intensity histogram of the decoded content — corrupt a byte and
the output changes. No media libraries are required; everything is
numpy over Arrow batches inside ``mapInPandas``.

The reference has no multimodal analogue; this implements the
training-data-pipeline brief (opaque binary + typed metadata + decode /
feature-extract / resize / frame-sample as vectorized batch stages).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, n_bytes long, "
    "sha256 string, meta_json string"
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "n_frames int, feature array<float>"
)

RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, n_bytes long, "
    "width int, height int, resized boolean"
)

_Y4M_TAIL = " F25:1 Ip A1:1 C420\n"


# --------------------------------------------------------------- dimensions
# Deterministic synthesis parameters — pure doc_id arithmetic so a SQL
# oracle can recompute every derived quantity in closed form.

def image_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 13 + 4, doc_id % 7 + 3          # (width, height)


def audio_n_samples(doc_id: int) -> int:
    return doc_id % 400 + 50


def video_dims(doc_id: int) -> tuple[int, int, int]:
    # C420 needs even dimensions
    return (doc_id % 6 + 2) * 2, (doc_id % 4 + 2) * 2, doc_id % 12 + 2


def _content_bytes(text: str | None, n: int) -> np.ndarray:
    """n content bytes: the text's utf-8 bytes cycled (empty text → 0s)."""
    raw = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(n, dtype=np.uint8)
    reps = -(-n // raw.size)
    return np.tile(raw, reps)[:n]


# ----------------------------------------------------------------- encoders

def encode_bmp(width: int, height: int, pixels: np.ndarray) -> bytes:
    """24-bit uncompressed BMP. ``pixels``: (height, width, 3) uint8 in
    BGR order, row 0 = TOP row (stored bottom-up per the format)."""
    stride = (3 * width + 3) // 4 * 4
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + img_size, 0, 0, 54,
        40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : 3 * width] = pixels.reshape(height, 3 * width)
    return header + rows[::-1].tobytes()  # bottom-up


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE, PCM 16-bit LE mono. ``samples``: int16 array."""
    data = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
            sample_rate * 2, 2, 16,
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def encode_y4m(width: int, height: int, frames: np.ndarray) -> bytes:
    """YUV4MPEG2, C420 planar. ``frames``: (n, h*w + 2*(h//2)*(w//2))
    uint8 — each row is one frame's Y then U then V plane bytes."""
    header = f"YUV4MPEG2 W{width} H{height}{_Y4M_TAIL}".encode("ascii")
    body = b"".join(b"FRAME\n" + f.tobytes() for f in frames)
    return header + body


def _encode_row(media_id: int, kind: str, text: str | None) -> bytes:
    if kind == "image":
        w, h = image_dims(media_id)
        px = _content_bytes(text, h * w * 3).reshape(h, w, 3)
        return encode_bmp(w, h, px)
    if kind == "audio":
        n = audio_n_samples(media_id)
        s = (_content_bytes(text, n).astype(np.int16) - 128) * 256
        return encode_wav(s)
    w, h, nf = video_dims(media_id)
    fsize = h * w + 2 * (h // 2) * (w // 2)
    fr = _content_bytes(text, nf * fsize).reshape(nf, fsize)
    return encode_y4m(w, h, fr)


# ----------------------------------------------------------------- decoders

def decode_bmp(buf: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, pixels (h, w, 3) uint8 BGR, top-down)."""
    if buf[:2] != b"BM" or len(buf) < 54:
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    width, height = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0 or height <= 0 or width <= 0:
        raise ValueError("unsupported BMP variant")
    stride = (3 * width + 3) // 4 * 4
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)
    return width, height, rows[::-1, : 3 * width].reshape(height, width, 3)


def decode_wav(buf: bytes) -> tuple[int, int, np.ndarray]:
    """→ (n_samples, n_channels, samples int16). Walks RIFF chunks."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, bits, data = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels = struct.unpack_from("<HH", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError("unsupported WAV encoding (need PCM16)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.size // channels, channels, samples


def decode_y4m(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, n_frames, frames (n, h, w) uint8 Y planes)."""
    if not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    nl = buf.index(b"\n")
    width = height = None
    for tok in buf[:nl].decode("ascii").split()[1:]:
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "C" and tok != "C420":
            raise ValueError("unsupported Y4M chroma (need C420)")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    fsize = height * width + 2 * (height // 2) * (width // 2)
    step = 6 + fsize  # b"FRAME\n" + planes
    body = buf[nl + 1 :]
    n_frames = len(body) // step
    ys = np.empty((n_frames, height, width), dtype=np.uint8)
    for i in range(n_frames):
        at = i * step
        if body[at : at + 6] != b"FRAME\n":
            raise ValueError("Y4M frame marker missing")
        ys[i] = np.frombuffer(
            body, dtype=np.uint8, count=height * width, offset=at + 6
        ).reshape(height, width)
    return width, height, n_frames, ys


def _histogram_feature(values: np.ndarray) -> np.ndarray:
    """16-bin density histogram over uint8 intensities → float32[16].
    Content-derived: any decoded byte change moves a bin."""
    if values.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    counts = np.bincount(values.ravel() >> 4, minlength=FEATURE_DIM)
    return (counts / values.size).astype(np.float32)


def _decode_one(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Sniff magic bytes → (kind, width, height, n_frames, feature)."""
    if payload[:2] == b"BM":
        w, h, px = decode_bmp(payload)
        return "image", w, h, 1, _histogram_feature(px)
    if payload[:4] == b"RIFF":
        n, ch, samples = decode_wav(payload)
        # intensity view of int16 samples: high byte + 128
        vals = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
        return "audio", n, ch, 1, _histogram_feature(vals)
    if payload[:9] == b"YUV4MPEG2":
        w, h, nf, ys = decode_y4m(payload)
        return "video", w, h, nf, _histogram_feature(ys)
    raise ValueError("unrecognized media payload")


# -------------------------------------------------------------- spark stages

def synthesize_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic media table from a text table: kind cycles
    by id, payload is a GENUINE encoded blob (BMP/WAV/Y4M) whose
    dimensions come from the id and whose content bytes come from the
    text. ``sha256`` carries the SOURCE text digest (the per-row content
    invariant); payload integrity is covered by decode round-trips."""
    import hashlib

    kinds = ["image", "audio", "video"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one scan-fused pass: encode + digest + meta per Arrow batch —
        # no join, no second scan of the (wide) text column
        for b in batches:
            if not len(b):
                continue
            ids = b[id_col].astype("int64")
            payloads = [
                _encode_row(int(i), kinds[int(i) % 3], t)
                for i, t in zip(ids, b[text_col])
            ]
            shas = [
                None if t is None
                else hashlib.sha256(t.encode("utf-8")).hexdigest()
                for t in b[text_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids.to_numpy(),
                    "kind": [kinds[int(i) % 3] for i in ids],
                    "payload": payloads,
                    "n_bytes": np.fromiter(
                        map(len, payloads), dtype=np.int64, count=len(payloads)
                    ),
                    "sha256": shas,
                    "meta_json": [f'{{"src_doc":{int(i)}}}' for i in ids],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, MEDIA_SCHEMA)


def decode_media(media: DataFrame, strict: bool = True) -> DataFrame:
    """Decode / feature-extract via mapInPandas (Arrow batches of opaque
    payloads — one Python worker per partition, batch-at-a-time, no
    driver involvement). Real parsing: header fields and the histogram
    feature come from the payload bytes.

    ``strict=True`` raises on an undecodable payload; ``strict=False``
    emits the row with kind ``'unknown'`` and NULL dims/feature so one
    poisoned blob can't kill a 100 TB decode job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "width": [],
                "height": [], "n_frames": [], "feature": [],
            }
            for mid, payload in zip(b["media_id"], b["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    kind, w, h, nf, feat = _decode_one(raw)
                except (ValueError, struct.error):
                    # struct.error: a truncated header chunk fails inside
                    # struct.unpack_from before any ValueError guard runs
                    # (e.g. a WAV whose fmt chunk is cut mid-field) — it
                    # must degrade like any other malformed payload
                    if strict:
                        raise
                    kind, w, h, nf, feat = "unknown", None, None, None, None
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, DECODED_SCHEMA
    )


def _nn_grid(n_out: int, n_in: int) -> np.ndarray:
    """Nearest-neighbor source indices for ``n_out`` destination pixels
    over ``n_in`` source pixels — pixel-CENTER mapping
    ``src = floor((dst + 0.5) * n_in / n_out)``, the standard convention
    (dst pixel i samples the source pixel its center lands in), clipped
    for float-edge safety."""
    idx = np.floor((np.arange(n_out) + 0.5) * n_in / n_out).astype(np.int64)
    return np.minimum(idx, n_in - 1)


def resize_image_pixels(
    px: np.ndarray, out_w: int, out_h: int
) -> np.ndarray:
    """(h, w, 3) → (out_h, out_w, 3) by nearest-neighbor resampling —
    two vectorized gather indexings, no Python pixel loop."""
    rows = _nn_grid(out_h, px.shape[0])
    cols = _nn_grid(out_w, px.shape[1])
    return px[rows][:, cols]


def resize_images(
    media: DataFrame, out_w: int, out_h: int, strict: bool = True
) -> DataFrame:
    """Resize every IMAGE payload to ``out_w`` × ``out_h`` (decode BMP →
    nearest-neighbor resample → re-encode BMP); non-image payloads pass
    through BYTE-IDENTICAL with ``resized = false``.  Completes the
    brief's multimodal verb set (decode / feature-extract / RESIZE /
    frame-sample).

    Kinds are sniffed from magic bytes like :func:`decode_media` (the
    payload is the truth, not a kind column), so the stage reads exactly
    two columns — Catalyst prunes the rest of a wide media table out of
    the scan.  Same scale shape as the other media stages: one
    ``mapInPandas`` pass, Arrow batches, per-partition Python workers,
    zero shuffle, no driver involvement; each batch is O(bytes) work.

    ``strict=True`` raises on an image-magic payload that fails to
    decode (truncated/unsupported BMP); ``strict=False`` passes it
    through unresized so one poisoned blob can't kill a corpus-wide
    resize.  Garbage (no known magic) is never an error here — it
    passes through as kind ``'unknown'``, since resizing a mixed table
    legitimately skips non-images.  ``width``/``height`` are the OUTPUT
    dims for resized rows and NULL for pass-through rows (audio/video
    dims are decode_media's job; pass-through stays zero-cost)."""
    if out_w < 1 or out_h < 1:
        raise ValueError("out_w and out_h must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            out = {
                "media_id": [], "kind": [], "payload": [], "n_bytes": [],
                "width": [], "height": [], "resized": [],
            }
            for mid, payload in zip(b["media_id"], b["payload"]):
                raw = bytes(payload) if payload is not None else b""
                buf, w, h, resized = raw, None, None, False
                if raw[:2] == b"BM":
                    kind = "image"
                    try:
                        _, _, px = decode_bmp(raw)
                        buf = encode_bmp(
                            out_w, out_h, resize_image_pixels(px, out_w, out_h)
                        )
                        w, h, resized = out_w, out_h, True
                    except (ValueError, struct.error):
                        # truncated header / unsupported variant — same
                        # degradation contract as decode_media
                        if strict:
                            raise
                elif raw[:4] == b"RIFF":
                    kind = "audio"
                elif raw[:9] == b"YUV4MPEG2":
                    kind = "video"
                else:
                    kind = "unknown"
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["payload"].append(buf)
                out["n_bytes"].append(len(buf))
                out["width"].append(w)
                out["height"].append(h)
                out["resized"].append(resized)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, RESIZED_SCHEMA
    )


def frame_sample(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame index (videos
    only; images/audio pass through with frame_idx 0). Pure expressions."""
    idxs = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    return decoded.select(
        "media_id",
        "kind",
        F.explode(idxs).alias("frame_idx"),
        "width",
        "height",
        "feature",
    )
