"""Multimodal columns: opaque binary payloads with typed metadata.

At 100 TB a training-data pipeline carries image/audio/video as `binary`
columns beside text. This module makes the Spark-side plumbing real —
schema, partition-friendly layout, Arrow batch shape, mapInPandas
signatures — while the actual codec work is stubbed (no image/audio
libraries in this container):

* ``synth_media``     — deterministic payloads derived from document text
                        (UTF-8 bytes), with a media_type and byte length:
                        the test corpus for the plumbing;
* ``media_stats``     — per-payload metadata extraction (JVM-side:
                        length + md5), the "is this blob sane" pass;
* ``frame_sample``    — video-style frame sampling: every STRIDE bytes,
                        emit a FRAME_LEN-byte window as one "frame" row —
                        a 1->N mapInPandas UDTF over binary payloads,
                        exactly the shape a real frame extractor has;
* ``synth_bmp``       — deterministic, VALID 24-bit BMP images derived
                        from doc_id (closed-form pixel values, so a SQL
                        oracle reproduces every byte without a decoder);
* ``decode_image``    — a real pure-numpy decoder for uncompressed
                        24-bit BMP (BITMAPINFOHEADER): parses headers,
                        strips row padding, flips the bottom-up row
                        order, reorders BGR->RGB, and emits the pixel
                        array plus exact integer checksums. Compressed
                        formats (PNG/JPEG) still need a codec library;
                        they would slot into the same mapInPandas kernel.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_LEN = 16
STRIDE = 64

# synth_bmp dimensions: W = 1 + doc_id % BMP_W_MOD, H = 1 + doc_id % BMP_H_MOD.
# Kept small and coprime so padding (rows padded to 4 bytes) and non-square
# shapes are both exercised.
BMP_W_MOD = 7
BMP_H_MOD = 5


def synth_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload binary) — deterministic fake blobs."""
    return docs.select(
        "doc_id",
        F.expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("payload"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """(doc_id, media_type, n_bytes, payload_md5) — JVM-side metadata."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def frame_sample(media: DataFrame, stride: int = STRIDE, frame_len: int = FRAME_LEN) -> DataFrame:
    """1->N frame extraction via mapInPandas over Arrow binary batches.

    (doc_id, frame_idx, frame_md5): every ``stride`` bytes a
    ``frame_len``-byte window is hashed — the exact batch shape a real
    video decoder (decode -> sample -> feature) uses; only the inner
    function body changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n = max(0, (len(raw) - frame_len) // stride + 1) if len(raw) >= frame_len else 0
                for i in range(n):
                    window = raw[i * stride : i * stride + frame_len]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    out = media.where(F.col("media_type") == "video").select("doc_id", "payload")
    return out.mapInPandas(run, "doc_id long, frame_idx long, frame_md5 string")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Pack an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte order,
    rows padded to 4 bytes) — pure numpy/struct, no codec library."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up row order, BGR channel order, per-row zero padding
    body = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    body[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    data = body.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def decode_bmp(raw: bytes) -> np.ndarray:
    """Parse an uncompressed 24-bit BMP into an (H, W, 3) uint8 RGB array
    (top-down row order). Pure numpy; rejects anything but the plain
    BI_RGB 24bpp layout this pipeline writes."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", raw, 10)
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", raw, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    body = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = body.reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def synth_bmp(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary): a deterministic valid BMP per 'image'
    document (doc_id % 3 = 0, matching synth_media's typing). Pixel value
    at (row r, col c, channel ch) is (doc_id*31 + r*7 + c*3 + ch) % 256 —
    closed-form, so the DuckDB oracle reproduces the checksums without a
    decoder. Arrow-batched mapInPandas; numpy-vectorized per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 1 + d % BMP_W_MOD, 1 + d % BMP_H_MOD
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :]
                px = ((d * 31 + r * 7 + c * 3 + ch) % 256).astype(np.uint8)
                ids.append(d)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    imgs = docs.where(F.col("doc_id") % 3 == 0).select("doc_id")
    return imgs.mapInPandas(run, "doc_id long, payload binary")


def _append_checksums(out: dict, doc_id: int, flat: np.ndarray) -> None:
    """THE checksum definition, shared by decode_image and resize_image:
    pixel_sum = Σ v_i and the position-weighted pixel_wsum = Σ (i+1)·v_i
    over an int64-flattened RGB row-major top-down stream. One place to
    change means the two mm_* oracle contracts cannot silently drift."""
    out["doc_id"].append(int(doc_id))
    out["pixel_sum"].append(int(flat.sum()))
    out["pixel_wsum"].append(
        int((flat * (np.arange(flat.size, dtype=np.int64) + 1)).sum())
    )


def decode_image(media: DataFrame) -> DataFrame:
    """Real decode for uncompressed 24-bit BMP payloads, Arrow-batched.

    (doc_id, height, width, channels, pixel_sum, pixel_wsum): the shape
    plus two exact integer checksums over the decoded RGB row-major
    top-down byte stream — pixel_sum = Σ v_i, pixel_wsum = Σ (i+1)·v_i.
    The position-weighted sum catches row-flip / channel-order / padding
    bugs that a plain sum cannot. Compressed formats would lazy-import a
    codec in this same kernel; the plan does not change.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "height", "width", "channels", "pixel_sum", "pixel_wsum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["channels"].append(img.shape[2])
                _append_checksums(out, doc_id, img.reshape(-1).astype(np.int64))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        run,
        "doc_id long, height long, width long, channels long, "
        "pixel_sum long, pixel_wsum long",
    )


# resize target (exercises BOTH directions against the 1..7 x 1..5
# synthetic sizes: upsampling for small sources, downsampling for large)
RESIZE_H = 4
RESIZE_W = 4


def resize_image(media: DataFrame, th: int = RESIZE_H, tw: int = RESIZE_W) -> DataFrame:
    """Nearest-neighbor resize of decoded BMP payloads, Arrow-batched.

    (doc_id, height, width, pixel_sum, pixel_wsum): checksums over the
    RESIZED (th, tw, 3) image. Source index is the floor map
    ``r_src = (r_t * h) DIV th`` (exact integer, no float rounding), so
    the DuckDB oracle reproduces every resized pixel from the synthetic
    closed form without any decoder. Real interpolating resizes plug
    into the same kernel slot; the plan — one mapInPandas over
    (doc_id, payload), no shuffle — does not change.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "height", "width", "pixel_sum", "pixel_wsum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                h, w = img.shape[:2]
                ri = (np.arange(th, dtype=np.int64) * h) // th
                ci = (np.arange(tw, dtype=np.int64) * w) // tw
                out["height"].append(th)
                out["width"].append(tw)
                _append_checksums(
                    out, doc_id, img[ri][:, ci].reshape(-1).astype(np.int64)
                )
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        run,
        "doc_id long, height long, width long, pixel_sum long, pixel_wsum long",
    )


def image_features(media: DataFrame) -> DataFrame:
    """Per-channel feature extraction over decoded payloads: 3 rows per
    image, (doc_id, channel, ch_sum, ch_mean_1e6). The mean uses the
    repo's exact round-half-up idiom ((2*s*1e6 + n) DIV (2*n)) so the
    feature vector is bit-identical across engines — the contract a
    downstream embedding join needs. Deeper extractors (conv stacks,
    CLIP-style towers) replace the numpy body; the Arrow plumbing,
    schema, and no-shuffle plan are what this operator pins."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "channel", "ch_sum", "ch_mean_1e6")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload)).astype(np.int64)
                n = img.shape[0] * img.shape[1]
                for ch in range(img.shape[2]):
                    s = int(img[:, :, ch].sum())
                    out["doc_id"].append(int(doc_id))
                    out["channel"].append(ch)
                    out["ch_sum"].append(s)
                    out["ch_mean_1e6"].append((2 * s * 1_000_000 + n) // (2 * n))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, channel long, ch_sum long, ch_mean_1e6 long"
    )


AHASH_H, AHASH_W = 6, 10  # 60-bit hash == the SimHash banding geometry


def image_ahash(media: DataFrame) -> DataFrame:
    """(doc_id, ahash): 60-bit average hash per image — the classic
    perceptual near-dup signature (resize small, gray, threshold at the
    mean). 60 bits on purpose: the hash drops straight into the existing
    SimHash Hamming band blocking (dedup.py SIMHASH_BANDS 4 x 15-bit,
    radius <= 3 lossless by pigeonhole), so image near-dup detection is
    the TEXT near-dup plan with a different signature column.

    Integer contract (oracle replays it from the synthetic pixel closed
    form, no decoder): nearest-neighbor floor-map resize to (6, 10),
    gray = (r + g + b) DIV 3 per pixel, mean = sum(gray) DIV 60, bit j
    (row-major) = gray_j > mean. One mapInPandas over (doc_id, payload),
    no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.int64(1) << np.arange(AHASH_H * AHASH_W, dtype=np.int64)
        for pdf in batches:
            out = {"doc_id": [], "ahash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = img.shape[:2]
                ri = (np.arange(AHASH_H, dtype=np.int64) * h) // AHASH_H
                ci = (np.arange(AHASH_W, dtype=np.int64) * w) // AHASH_W
                gray = (img[ri][:, ci].sum(axis=2) // 3).reshape(-1)
                mean = int(gray.sum()) // gray.size
                bits = (gray > mean).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["ahash"].append(int((bits * weights).sum()))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, ahash long"
    )


# --- audio: real RIFF/WAVE PCM16 codec (the BMP discipline for sound) -------

WAV_RATES = [8000, 12000, 16000]
WAV_N_BASE = 64
WAV_N_MOD = 129


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Pack a 1-D int16 array as a mono PCM16 RIFF/WAVE file — pure
    numpy/struct, no codec library (the encode_bmp discipline)."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """Parse a mono PCM16 RIFF/WAVE payload into (sample_rate, int16
    samples) by walking the chunk list (fmt may not be the first chunk
    in the wild). Rejects anything but uncompressed 16-bit mono."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAVE: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def synth_wav(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary): a deterministic valid WAV per 'audio'
    document (doc_id % 3 = 1, matching synth_media's typing).
    sample[i] = (doc_id*31 + i*17) % 4096 - 2048; n = 64 + doc_id % 129;
    rate cycles WAV_RATES by doc_id DIV 3 — all closed-form, so the
    DuckDB oracle reproduces every statistic without a decoder."""
    base = docs.where(F.col("doc_id") % 3 == 1).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for doc_id in b["doc_id"]:
                n = WAV_N_BASE + int(doc_id) % WAV_N_MOD
                rate = WAV_RATES[(int(doc_id) // 3) % len(WAV_RATES)]
                i = np.arange(n, dtype=np.int64)
                s = ((int(doc_id) * 31 + i * 17) % 4096 - 2048).astype(np.int16)
                payloads.append(encode_wav(s, rate))
            yield pd.DataFrame({"doc_id": b["doc_id"], "payload": payloads})

    return base.mapInPandas(run, "doc_id long, payload binary")


def audio_stats(media: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, n_samples, duration_ms, peak, rms): decode
    the real WAV payload and report exact-integer signal statistics —
    duration_ms = n*1000 DIV rate, peak = max |s|, rms = isqrt of the
    mean square (floor). The audio twin of decode_image's checksum gate:
    any header/chunk-walk/byte-order bug diverges from the closed-form
    oracle. Arrow-batched mapInPandas, executor-local, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for b in batches:
            out: dict[str, list] = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "peak": [], "rms": [],
            }
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                rate, s = decode_wav(bytes(payload))
                sq = s.astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["duration_ms"].append(len(s) * 1000 // rate)
                out["peak"].append(int(np.max(np.abs(sq))) if len(s) else 0)
                out["rms"].append(
                    math.isqrt(int(np.sum(sq * sq)) // len(s)) if len(s) else 0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        "doc_id long, sample_rate long, n_samples long, duration_ms long, "
        "peak long, rms long",
    )


# --- video: BMP-sequence container + key-frame extraction -------------------
#
# The synthetic video container is a plain concatenation of valid BMP
# frames (each frame self-describes its byte length in the BMP file
# header), so the demuxer below is a REAL container walk — offset
# arithmetic over untrusted lengths — even though the codec inside each
# frame is the uncompressed one the image path already proves out.

VIDEO_W, VIDEO_H = 5, 4
VIDEO_FRAMES_BASE = 2
VIDEO_FRAMES_MOD = 4
KEYFRAME_STRIDE = 2


def _video_frame(doc_id: int, f: int) -> np.ndarray:
    r = np.arange(VIDEO_H).reshape(-1, 1, 1)
    c = np.arange(VIDEO_W).reshape(1, -1, 1)
    ch = np.arange(3).reshape(1, 1, -1)
    return ((doc_id * 31 + f * 11 + r * 7 + c * 3 + ch) % 256).astype(np.uint8)


def synth_video(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary): a deterministic BMP-sequence 'video' per
    video document (doc_id % 3 = 2, matching synth_media's typing) —
    2 + doc_id % 4 frames of 5x4 RGB; pixel value at (frame f, row r,
    col c, ch) is (doc_id*31 + f*11 + r*7 + c*3 + ch) % 256."""
    base = docs.where(F.col("doc_id") % 3 == 2).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for doc_id in b["doc_id"]:
                n = VIDEO_FRAMES_BASE + int(doc_id) % VIDEO_FRAMES_MOD
                payloads.append(
                    b"".join(encode_bmp(_video_frame(int(doc_id), f)) for f in range(n))
                )
            yield pd.DataFrame({"doc_id": b["doc_id"], "payload": payloads})

    return base.mapInPandas(run, "doc_id long, payload binary")


def video_keyframes(media: DataFrame, stride: int = KEYFRAME_STRIDE) -> DataFrame:
    """(doc_id, frame_index, height, width, pixel_sum, pixel_wsum):
    demux the BMP-sequence container (walk frame lengths from each BMP
    file header), decode every ``stride``-th frame with the real BMP
    decoder, and emit exact integer checksums — the decode → sample →
    feature chain a video curation pipeline runs, with the sampling
    BEFORE the expensive decode (only keyframes are decoded; skipped
    frames cost one header read). Arrow-batched mapInPandas, zero
    shuffle; one input row fans out to its keyframes (UDTF shape).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_index": [], "height": [], "width": [],
                "pixel_sum": [], "pixel_wsum": [],
            }
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                raw = bytes(payload)
                pos, f = 0, 0
                while pos + 6 <= len(raw):
                    if raw[pos : pos + 2] != b"BM":
                        raise ValueError(f"bad frame magic at offset {pos}")
                    (size,) = struct.unpack_from("<I", raw, pos + 2)
                    if f % stride == 0:
                        img = decode_bmp(raw[pos : pos + size])
                        flat = img.reshape(-1).astype(np.int64)
                        out["doc_id"].append(int(doc_id))
                        out["frame_index"].append(f)
                        out["height"].append(img.shape[0])
                        out["width"].append(img.shape[1])
                        out["pixel_sum"].append(int(flat.sum()))
                        out["pixel_wsum"].append(
                            int((flat * (np.arange(len(flat)) + 1)).sum())
                        )
                    pos += size
                    f += 1
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        "doc_id long, frame_index long, height long, width long, "
        "pixel_sum long, pixel_wsum long",
    )
