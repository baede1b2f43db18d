"""Multimodal codecs: REAL BMP / PCM-WAV / Y4M encode+decode, byte-true
oracles (hand-built blobs with known pixels/samples), corrupt-payload
handling, and the frame-sampling plumbing."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.multimodal import (
    FEATURE_DIM,
    _content_bytes,
    _histogram_feature,
    audio_n_samples,
    decode_bmp,
    decode_media,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
    frame_sample,
    image_dims,
    resize_images,
    synthesize_media,
    video_dims,
)


# ------------------------------------------------------- byte-true codecs

def test_bmp_roundtrip_exact_pixels():
    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (2, 3), (5, 4), (16, 9)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = encode_bmp(w, h, px)
        # format math: 54-byte header + padded bottom-up rows
        stride = (3 * w + 3) // 4 * 4
        assert len(buf) == 54 + h * stride
        assert buf[:2] == b"BM"
        w2, h2, px2 = decode_bmp(buf)
        assert (w2, h2) == (w, h)
        assert np.array_equal(px2, px)


def test_bmp_known_bytes():
    # 1x1 pure-blue pixel (BGR = 255,0,0), hand-checked layout: row is
    # padded to 4 bytes, stored after the 54-byte header
    buf = encode_bmp(1, 1, np.array([[[255, 0, 0]]], dtype=np.uint8))
    assert len(buf) == 58
    assert buf[54:58] == b"\xff\x00\x00\x00"
    assert struct.unpack_from("<ii", buf, 18) == (1, 1)
    assert struct.unpack_from("<H", buf, 28)[0] == 24  # bpp


def test_wav_roundtrip_exact_samples():
    s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    buf = encode_wav(s, sample_rate=8000)
    assert len(buf) == 44 + 2 * s.size
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    n, ch, s2 = decode_wav(buf)
    assert (n, ch) == (s.size, 1)
    assert np.array_equal(s2, s)


def test_wav_chunk_walk_skips_extra_chunks():
    # a LIST chunk between fmt and data must be walked over, not break
    s = np.array([5, -5], dtype=np.int16)
    buf = encode_wav(s)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = buf[:fmt_end] + extra + buf[fmt_end:]
    n, ch, s2 = decode_wav(patched)
    assert np.array_equal(s2, s)


def test_y4m_roundtrip_exact_planes():
    w, h, nf = 4, 2, 3
    fsize = h * w + 2 * (h // 2) * (w // 2)
    frames = np.arange(nf * fsize, dtype=np.uint8).reshape(nf, fsize)
    buf = encode_y4m(w, h, frames)
    assert buf.startswith(b"YUV4MPEG2 W4 H2 F25:1")
    w2, h2, nf2, ys = decode_y4m(buf)
    assert (w2, h2, nf2) == (w, h, nf)
    for i in range(nf):
        assert np.array_equal(ys[i].ravel(), frames[i][: h * w])


def test_decoders_reject_garbage():
    for fn in (decode_bmp, decode_wav, decode_y4m):
        with pytest.raises(ValueError):
            fn(b"\x00" * 64)


def test_histogram_feature_is_density():
    vals = np.array([0, 0, 16, 255], dtype=np.uint8)
    f = _histogram_feature(vals)
    assert len(f) == FEATURE_DIM
    assert f[0] == pytest.approx(0.5) and f[1] == pytest.approx(0.25)
    assert f[15] == pytest.approx(0.25)
    assert float(f.sum()) == pytest.approx(1.0)


# --------------------------------------------------------- spark pipeline

@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} with some payload text") for i in range(30)],
        "doc_id long, text string",
    )
    return synthesize_media(docs).cache()


def test_media_schema_and_kinds(media):
    rows = media.collect()
    assert len(rows) == 30
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert r["n_bytes"] == len(r["payload"]) > 0
        assert len(r["sha256"]) == 64
        # payload is a genuine blob of the declared format
        magic = bytes(r["payload"][:9])
        assert {
            "image": magic[:2] == b"BM",
            "audio": magic[:4] == b"RIFF",
            "video": magic == b"YUV4MPEG2",
        }[r["kind"]]


def test_media_sha256_is_source_digest(media, spark):
    for r in media.limit(5).collect():
        i = r["media_id"]
        text = f"document body number {i} with some payload text"
        assert r["sha256"] == hashlib.sha256(text.encode()).hexdigest()


def test_decode_matches_synthesis_formulas(media):
    dec = {r["media_id"]: r for r in decode_media(media, strict=True).collect()}
    assert len(dec) == 30
    for mid, r in dec.items():
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == image_dims(mid)
            assert r["n_frames"] == 1
        elif r["kind"] == "audio":
            assert r["width"] == audio_n_samples(mid)
            assert r["height"] == 1 and r["n_frames"] == 1
        else:
            w, h, nf = video_dims(mid)
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert len(r["feature"]) == FEATURE_DIM
        assert sum(r["feature"]) == pytest.approx(1.0, abs=1e-5)


def test_decode_feature_is_content_true(media):
    """The image feature must equal the histogram of the text bytes that
    were painted into the pixels — computed independently here."""
    dec = {r["media_id"]: r for r in decode_media(media, strict=True).collect()}
    for mid in (0, 3, 6):  # images
        w, h = image_dims(mid)
        text = f"document body number {mid} with some payload text"
        px = _content_bytes(text, h * w * 3)
        want = _histogram_feature(px)
        got = np.array(dec[mid]["feature"], dtype=np.float32)
        assert np.allclose(got, want)


def test_decode_corrupt_payload(spark, media):
    corrupt = spark.createDataFrame(
        [(999, bytes(b"not a media blob at all"))],
        "media_id long, payload binary",
    )
    both = media.select("media_id", "payload").unionByName(corrupt)
    # strict: the poisoned blob raises
    with pytest.raises(Exception, match="unrecognized media payload"):
        decode_media(both, strict=True).collect()
    # lenient: decoded rows survive, the bad row is marked
    rows = {r["media_id"]: r for r in decode_media(both, strict=False).collect()}
    assert len(rows) == 31
    assert rows[999]["kind"] == "unknown"
    assert rows[999]["width"] is None and rows[999]["feature"] is None
    assert rows[0]["kind"] == "image" and rows[0]["width"] == image_dims(0)[0]


def test_decode_truncated_header_degrades(spark, media):
    """A payload that passes the magic-byte sniff but dies mid-header
    (struct.error from unpack_from, not ValueError) must degrade to an
    'unknown' row under strict=False instead of killing the task."""
    # a RIFF/WAVE container whose fmt chunk claims 16 bytes but is cut
    # after 6 — struct.unpack_from("<H", body, 14) fails with struct.error
    cut_wav = b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"fmt " + (
        16
    ).to_bytes(4, "little") + b"\x01\x00\x02\x00\x44\xac"
    # a BMP whose header is cut before the dimension fields
    cut_bmp = b"BM" + bytes(52)  # 54 bytes total, zeroed header fields
    corrupt = spark.createDataFrame(
        [(901, cut_wav), (902, cut_bmp[:16])],
        "media_id long, payload binary",
    )
    both = media.select("media_id", "payload").unionByName(corrupt)
    rows = {r["media_id"]: r for r in decode_media(both, strict=False).collect()}
    assert rows[901]["kind"] == "unknown" and rows[901]["width"] is None
    assert rows[902]["kind"] == "unknown"
    assert rows[0]["kind"] == "image"  # healthy rows unaffected
    # whichever corrupt row's task dies first surfaces: the cut WAV
    # raises struct.error ("unpack requires..."), the cut BMP a
    # ValueError ("not a BMP payload") — both must count as a strict
    # failure, so the match covers both message families
    with pytest.raises(Exception, match="(struct|media|unpack|BMP|payload)"):
        decode_media(both, strict=True).collect()


def test_decode_deterministic(media):
    a = {r["media_id"]: r for r in decode_media(media).collect()}
    b = {r["media_id"]: r for r in decode_media(media).collect()}
    for mid in a:
        assert a[mid]["feature"] == b[mid]["feature"]


def test_frame_sample(media):
    decoded = decode_media(media)
    frames = frame_sample(decoded, every_n=5)
    rows = frames.collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    dec = {r["media_id"]: r for r in decoded.collect()}
    for mid, idxs in per.items():
        if dec[mid]["kind"] == "video":
            exp = list(range(0, dec[mid]["n_frames"], 5))
            assert sorted(idxs) == exp
        else:
            assert idxs == [0]


# ------------------------------------------------------------------ resize

def _nn_oracle(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Independent per-pixel nearest-neighbor reference: explicit Python
    loop over destination pixels, pixel-center convention."""
    h, w = px.shape[0], px.shape[1]
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for y in range(out_h):
        sy = min(int((y + 0.5) * h / out_h), h - 1)
        for x in range(out_w):
            sx = min(int((x + 0.5) * w / out_w), w - 1)
            out[y, x] = px[sy, sx]
    return out


def test_resize_exact_nearest_neighbor(spark):
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    src = spark.createDataFrame(
        [(1, bytearray(encode_bmp(7, 5, px)))], "media_id long, payload binary"
    )
    for out_w, out_h in [(3, 4), (10, 9), (1, 1), (7, 5)]:
        row = resize_images(src, out_w, out_h).collect()[0]
        assert (row["kind"], row["resized"]) == ("image", True)
        assert (row["width"], row["height"]) == (out_w, out_h)
        w2, h2, px2 = decode_bmp(bytes(row["payload"]))
        assert (w2, h2) == (out_w, out_h)
        assert np.array_equal(px2, _nn_oracle(px, out_w, out_h))
        assert row["n_bytes"] == len(row["payload"])


def test_resize_identity_is_byte_lossless(spark):
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    buf = encode_bmp(6, 4, px)
    src = spark.createDataFrame(
        [(7, bytearray(buf))], "media_id long, payload binary"
    )
    row = resize_images(src, 6, 4).collect()[0]
    # same dims → NN maps i→i → re-encode reproduces the exact bytes
    assert bytes(row["payload"]) == buf and row["resized"]


def test_resize_passthrough_non_images(media):
    out = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        assert r["kind"] == src[mid]["kind"]
        if r["kind"] == "image":
            assert r["resized"] and (r["width"], r["height"]) == (4, 4)
        else:
            # audio/video pass through byte-identical, dims NULL
            assert not r["resized"]
            assert bytes(r["payload"]) == bytes(src[mid]["payload"])
            assert r["width"] is None and r["height"] is None
    # downstream composition: decode_media over the resized table sees
    # the new dimensions and still content-true features
    dec = {
        r["media_id"]: r
        for r in decode_media(resize_images(media, 4, 4)).collect()
    }
    for mid, r in dec.items():
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (4, 4)


def test_resize_corrupt_image_strict_vs_tolerant(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"BM" + b"\x00" * 10)),   # image magic, truncated
         (2, bytearray(b"not media at all"))],   # no known magic
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="(struct|BMP|unpack|payload)"):
        resize_images(bad, 3, 3, strict=True).collect()
    rows = {r["media_id"]: r for r in resize_images(bad, 3, 3, strict=False).collect()}
    assert rows[1]["kind"] == "image" and not rows[1]["resized"]
    assert bytes(rows[1]["payload"]) == b"BM" + b"\x00" * 10  # untouched
    # garbage is never an error — unknown kind, clean pass-through
    assert rows[2]["kind"] == "unknown" and not rows[2]["resized"]


def test_resize_rejects_degenerate_target(media):
    with pytest.raises(ValueError, match=">= 1"):
        resize_images(media, 0, 4)
