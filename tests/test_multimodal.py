"""Multimodal plumbing tests."""

import hashlib

import pytest

from hebrew_ner_spark.operators import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return multimodal.synth_media(docs).cache()


def test_media_stats_match_python_hash(spark, media):
    row = media.where("doc_id = 0").collect()[0]
    stats = multimodal.media_stats(media).where("doc_id = 0").collect()[0]
    assert stats.n_bytes == len(bytes(row.payload))
    assert stats.payload_md5 == hashlib.md5(bytes(row.payload)).hexdigest()


def test_frame_sample_count_and_content(spark, media):
    rows = media.where("media_type = 'video'").collect()
    expected = 0
    for r in rows:
        n = len(bytes(r.payload))
        if n >= multimodal.FRAME_LEN:
            expected += (n - multimodal.FRAME_LEN) // multimodal.STRIDE + 1
    frames = multimodal.frame_sample(media).collect()
    assert len(frames) == expected
    # spot-check frame 0 of one doc
    r0 = rows[0]
    f0 = [f for f in frames if f.doc_id == r0.doc_id and f.frame_idx == 0][0]
    assert f0.frame_md5 == hashlib.md5(bytes(r0.payload)[: multimodal.FRAME_LEN]).hexdigest()


def test_bmp_roundtrip_literal():
    """Decode a hand-verifiable 2x2 BMP: padding (6-byte rows -> 2 pad),
    bottom-up row order, and BGR->RGB all exercised against a literal."""
    import numpy as np

    px = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    raw = multimodal.encode_bmp(px)
    assert raw[:2] == b"BM" and len(raw) == 54 + 2 * 8  # 2 rows of 6+2 pad
    # pixel data starts at 54 with the BOTTOM row, BGR: (0,0,255)->FF 00 00
    assert raw[54:57] == bytes([255, 0, 0])
    back = multimodal.decode_bmp(raw)
    assert back.shape == (2, 2, 3) and (back == px).all()


def test_bmp_decode_rejects_non_bmp():
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_decode_image_checksums(spark):
    """decode_image over synth_bmp reproduces the closed-form pixel
    checksums for every image doc (the mm_decode gate in miniature)."""
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = {
        r.doc_id: r
        for r in multimodal.decode_image(multimodal.synth_bmp(docs)).collect()
    }
    ids = [r.doc_id for r in docs.select("doc_id").collect() if r.doc_id % 3 == 0]
    assert set(out) == set(ids)
    for d in ids[:10]:
        w, h = 1 + d % multimodal.BMP_W_MOD, 1 + d % multimodal.BMP_H_MOD
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        flat = (((d * 31 + r * 7 + c * 3 + ch) % 256).reshape(-1)).astype(np.int64)
        row = out[d]
        assert (row.height, row.width, row.channels) == (h, w, 3)
        assert row.pixel_sum == int(flat.sum())
        assert row.pixel_wsum == int((flat * (np.arange(flat.size) + 1)).sum())


def test_resize_nearest_hand_checked(spark):
    """2x2 image to 4x4: the floor map (r_t*2)//4 = [0,0,1,1] must
    replicate each source pixel into a 2x2 block; checksums computed by
    hand from the replicated array."""
    import numpy as np

    from hebrew_ner_spark.operators import multimodal

    src = np.array([[[10, 11, 12], [20, 21, 22]],
                    [[30, 31, 32], [40, 41, 42]]], dtype=np.uint8)
    media = spark.createDataFrame(
        [(7, bytearray(multimodal.encode_bmp(src)))], "doc_id long, payload binary"
    )
    row = multimodal.resize_image(media).collect()[0]
    idx = np.array([0, 0, 1, 1])
    expect = src[idx][:, idx].reshape(-1).astype(np.int64)
    assert (row.height, row.width) == (4, 4)
    assert row.pixel_sum == int(expect.sum())
    assert row.pixel_wsum == int((expect * (np.arange(48) + 1)).sum())


def test_image_features_channel_means(spark):
    """Channel sums/means against direct numpy, including the exact
    round-half-up micro-unit mean."""
    import numpy as np

    from hebrew_ner_spark.operators import multimodal

    src = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    media = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_bmp(src)))], "doc_id long, payload binary"
    )
    rows = {r.channel: r for r in multimodal.image_features(media).collect()}
    for ch in range(3):
        s = int(src[:, :, ch].astype(np.int64).sum())
        assert rows[ch].ch_sum == s
        assert rows[ch].ch_mean_1e6 == (2 * s * 1_000_000 + 6) // 12


class TestImageAhash:
    def test_matches_independent_replay_and_known_bits(self, spark):
        import numpy as np

        from hebrew_ner_spark.operators import multimodal as mm

        # image 0: left half dark, right half bright -> bright columns set
        px0 = np.zeros((12, 20, 3), dtype=np.uint8)
        px0[:, 10:, :] = 200
        # image 1: uniform -> gray > mean is false everywhere -> ahash 0
        px1 = np.full((7, 9, 3), 55, dtype=np.uint8)
        rows = [(0, mm.encode_bmp(px0)), (1, mm.encode_bmp(px1))]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r.ahash for r in mm.image_ahash(media).collect()}

        def replay(px):
            img = px.astype(np.int64)
            h, w = img.shape[:2]
            ri = (np.arange(mm.AHASH_H, dtype=np.int64) * h) // mm.AHASH_H
            ci = (np.arange(mm.AHASH_W, dtype=np.int64) * w) // mm.AHASH_W
            gray = (img[ri][:, ci].sum(axis=2) // 3).reshape(-1)
            mean = int(gray.sum()) // gray.size
            return int(((gray > mean).astype(np.int64)
                        * (np.int64(1) << np.arange(60, dtype=np.int64))).sum())

        assert got == {0: replay(px0), 1: replay(px1)}
        assert got[1] == 0
        # half-bright image: exactly the right-half bits (cols 5..9 of
        # each of the 6 rows) are set
        want_bits = {r * 10 + c for r in range(6) for c in range(5, 10)}
        assert {j for j in range(60) if (got[0] >> j) & 1} == want_bits


class TestWavCodec:
    def test_roundtrip_literal(self):
        import numpy as np

        from hebrew_ner_spark.operators.multimodal import decode_wav, encode_wav

        s = np.array([0, 1, -1, 2047, -2048, 123], dtype=np.int16)
        rate, back = decode_wav(encode_wav(s, 16000))
        assert rate == 16000 and (back == s).all()

    def test_decode_walks_chunk_list(self):
        # a LIST chunk inserted before fmt must be skipped, not fatal
        import struct

        import numpy as np

        from hebrew_ner_spark.operators.multimodal import decode_wav, encode_wav

        s = np.array([5, -7, 9], dtype=np.int16)
        raw = encode_wav(s, 8000)
        extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
        doctored = raw[:12] + extra + raw[12:]
        rate, back = decode_wav(doctored)
        assert rate == 8000 and (back == s).all()

    def test_rejects_stereo(self):
        import struct

        import numpy as np
        import pytest

        from hebrew_ner_spark.operators.multimodal import decode_wav, encode_wav

        raw = bytearray(encode_wav(np.array([1], dtype=np.int16), 8000))
        struct.pack_into("<H", raw, 12 + 8 + 2, 2)  # channels = 2
        with pytest.raises(ValueError):
            decode_wav(bytes(raw))

    def test_audio_stats_closed_form(self, spark):
        import math

        from hebrew_ner_spark.operators.multimodal import audio_stats, synth_wav

        docs = spark.createDataFrame([(1, "x"), (4, "y")], ["doc_id", "text"])
        got = {r.doc_id: r for r in audio_stats(synth_wav(docs)).collect()}
        for doc_id in (1, 4):
            n = 64 + doc_id % 129
            rate = [8000, 12000, 16000][(doc_id // 3) % 3]
            samples = [((doc_id * 31 + i * 17) % 4096) - 2048 for i in range(n)]
            r = got[doc_id]
            assert (r.sample_rate, r.n_samples) == (rate, n)
            assert r.duration_ms == n * 1000 // rate
            assert r.peak == max(abs(v) for v in samples)
            assert r.rms == math.isqrt(sum(v * v for v in samples) // n)


class TestVideoKeyframes:
    def test_demux_and_stride_closed_form(self, spark):
        import numpy as np

        from hebrew_ner_spark.operators.multimodal import (
            _video_frame,
            synth_video,
            video_keyframes,
        )

        # doc 5: 2 + 5%4 = 3 frames -> keyframes 0, 2
        docs = spark.createDataFrame([(5, "x")], ["doc_id", "text"])
        rows = {r.frame_index: r for r in
                video_keyframes(synth_video(docs)).collect()}
        assert set(rows) == {0, 2}
        for f, r in rows.items():
            flat = _video_frame(5, f).reshape(-1).astype(np.int64)
            assert (r.height, r.width) == (4, 5)
            assert r.pixel_sum == int(flat.sum())
            assert r.pixel_wsum == int((flat * (np.arange(len(flat)) + 1)).sum())

    def test_corrupt_container_raises(self, spark):
        import pytest

        from hebrew_ner_spark.operators.multimodal import video_keyframes

        media = spark.createDataFrame(
            [(1, bytearray(b"XX not a bmp sequence"))], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="bad frame magic"):
            video_keyframes(media).collect()
