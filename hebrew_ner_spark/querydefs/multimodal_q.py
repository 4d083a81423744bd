"""Multimodal plumbing queries + oracles.

Payloads are UTF-8 bytes of ASCII text, so the DuckDB oracle can mirror
binary operations with string ones (identical bytes -> identical md5)."""

from __future__ import annotations

from hebrew_ner_spark.operators import multimodal
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_TYPE_CASE = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)

# the synth_bmp dimension closed form + image-typing predicate, shared by
# every image oracle so the formula can only ever change in one place
_DIMS_CTE = f"""dims AS (
      SELECT doc_id, 1 + doc_id % {multimodal.BMP_W_MOD} AS w,
             1 + doc_id % {multimodal.BMP_H_MOD} AS h
      FROM documents WHERE doc_id % 3 = 0
    )"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "mm_media_stats",
    oracle=f"""
    SELECT doc_id, {_TYPE_CASE} AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_media_stats(spark, sf_dir):
    return multimodal.media_stats(multimodal.synth_media(_docs(spark, sf_dir)))


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
    f AS (
      SELECT doc_id, text,
             unnest(range(0, CASE WHEN length(text) >= {multimodal.FRAME_LEN}
                                  THEN (length(text) - {multimodal.FRAME_LEN}) // {multimodal.STRIDE} + 1
                                  ELSE 0 END)) AS frame_idx
      FROM v
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           md5(substr(text, frame_idx * {multimodal.STRIDE} + 1, {multimodal.FRAME_LEN})) AS frame_md5
    FROM f
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling through the mapInPandas UDTF shape."""
    return multimodal.frame_sample(multimodal.synth_media(_docs(spark, sf_dir)))


@query(
    "mm_decode",
    oracle=f"""
    WITH {_DIMS_CTE},
    px AS (
      SELECT doc_id, w, h, i,
             (doc_id*31 + (i // (w*3))*7 + ((i % (w*3)) // 3)*3 + (i % 3)) % 256 AS v
      FROM dims, unnest(range(0, w*h*3)) AS u(i)
    )
    SELECT doc_id, CAST(h AS BIGINT) AS height, CAST(w AS BIGINT) AS width,
           CAST(3 AS BIGINT) AS channels,
           CAST(sum(v) AS BIGINT) AS pixel_sum,
           CAST(sum((i+1)*v) AS BIGINT) AS pixel_wsum
    FROM px GROUP BY doc_id, h, w
    """,
)
def mm_decode(spark, sf_dir):
    """End-to-end image column: closed-form pixels -> real BMP encode ->
    real pure-numpy BMP decode -> exact integer checksums. The oracle
    computes the same checksums straight from the pixel formula, so any
    header/padding/row-order/channel-order bug in either codec half
    diverges (the position-weighted sum pins byte order)."""
    return multimodal.decode_image(multimodal.synth_bmp(_docs(spark, sf_dir)))


_RH, _RW = multimodal.RESIZE_H, multimodal.RESIZE_W


@query(
    "mm_resize",
    oracle=f"""
    WITH {_DIMS_CTE},
    px AS (
      SELECT doc_id, i,
             (doc_id*31
              + (((i // ({_RW}*3)) * h) // {_RH})*7
              + ((((i % ({_RW}*3)) // 3) * w) // {_RW})*3
              + (i % 3)) % 256 AS v
      FROM dims, unnest(range(0, {_RH}*{_RW}*3)) AS u(i)
    )
    SELECT doc_id, CAST({_RH} AS BIGINT) AS height, CAST({_RW} AS BIGINT) AS width,
           CAST(sum(v) AS BIGINT) AS pixel_sum,
           CAST(sum((i+1)*v) AS BIGINT) AS pixel_wsum
    FROM px GROUP BY doc_id
    """,
)
def mm_resize(spark, sf_dir):
    """Decode -> nearest-neighbor resize -> checksums, against an oracle
    that reproduces every RESIZED pixel straight from the closed form via
    the same floor index map — any off-by-one in the index arithmetic or
    a row/channel transposition diverges."""
    return multimodal.resize_image(multimodal.synth_bmp(_docs(spark, sf_dir)))


@query(
    "mm_features",
    oracle=f"""
    WITH {_DIMS_CTE},
    px AS (
      SELECT doc_id, w, h, (i % 3) AS channel,
             (doc_id*31 + (i // (w*3))*7 + ((i % (w*3)) // 3)*3 + (i % 3)) % 256 AS v
      FROM dims, unnest(range(0, w*h*3)) AS u(i)
    )
    SELECT doc_id, CAST(channel AS BIGINT) AS channel,
           CAST(sum(v) AS BIGINT) AS ch_sum,
           CAST((2 * CAST(sum(v) AS BIGINT) * 1000000 + (w*h)) // (2 * (w*h))
                AS BIGINT) AS ch_mean_1e6
    FROM px GROUP BY doc_id, channel, w, h
    """,
)
def mm_features(spark, sf_dir):
    """Per-channel feature vectors from decoded images — exact sums and
    round-half-up micro-unit means, 3 rows per image."""
    return multimodal.image_features(multimodal.synth_bmp(_docs(spark, sf_dir)))


_AH, _AW = multimodal.AHASH_H, multimodal.AHASH_W
_GRAY_SQL = " + ".join(
    f"((doc_id*31 + (((j // {_AW}) * h) // {_AH})*7"
    f" + (((j % {_AW}) * w) // {_AW})*3 + {ch}) % 256)"
    for ch in range(3)
)


@query(
    "mm_ahash",
    oracle=f"""
    WITH {_DIMS_CTE},
    g AS (
      SELECT doc_id, j, ({_GRAY_SQL}) // 3 AS gray
      FROM dims, unnest(range(0, {_AH * _AW})) AS u(j)
    ),
    m AS (SELECT doc_id, sum(gray) // {_AH * _AW} AS mean
          FROM g GROUP BY doc_id)
    SELECT g.doc_id,
           CAST(sum(CASE WHEN gray > mean
                         THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                         ELSE 0 END) AS BIGINT) AS ahash
    FROM g JOIN m USING (doc_id) GROUP BY g.doc_id
    """,
)
def mm_ahash(spark, sf_dir):
    """60-bit image average hash (perceptual near-dup signature), real
    BMP decode vs the pixel closed form — bit-for-bit."""
    return multimodal.image_ahash(multimodal.synth_bmp(_docs(spark, sf_dir)))


@query(
    "mm_ahash_pairs",
    oracle=f"""
    WITH {_DIMS_CTE},
    g AS (
      SELECT doc_id, j, ({_GRAY_SQL}) // 3 AS gray
      FROM dims, unnest(range(0, {_AH * _AW})) AS u(j)
    ),
    m AS (SELECT doc_id, sum(gray) // {_AH * _AW} AS mean
          FROM g GROUP BY doc_id),
    ah AS (SELECT g.doc_id,
                  CAST(sum(CASE WHEN gray > mean
                                THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                                ELSE 0 END) AS BIGINT) AS ahash
           FROM g JOIN m USING (doc_id) GROUP BY g.doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
    FROM ah a JOIN ah b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
    """,
)
def mm_ahash_pairs(spark, sf_dir):
    """Image near-dup pairs: aHash through the shared 4x15-bit Hamming
    band blocking (lossless at radius 3 by pigeonhole — the oracle is
    the BRUTE-FORCE all-pairs scan, so losslessness is the gated
    claim, exactly like kg_similar_roles)."""
    from hebrew_ner_spark.operators import dedup

    ah = multimodal.image_ahash(multimodal.synth_bmp(_docs(spark, sf_dir)))
    return dedup.hamming_near_pairs_from_sigs(ah, sig_col="ahash")


_WAV_RATES_SQL = "[" + ", ".join(str(r) for r in multimodal.WAV_RATES) + "]"


@query(
    "mm_audio_stats",
    oracle=f"""
    WITH adims AS (
      SELECT doc_id,
             {multimodal.WAV_N_BASE} + doc_id % {multimodal.WAV_N_MOD} AS n,
             ({_WAV_RATES_SQL})[CAST((doc_id // 3) % {len(multimodal.WAV_RATES)} AS INT) + 1]
               AS rate
      FROM documents WHERE doc_id % 3 = 1),
    sm AS (
      SELECT doc_id, n, rate,
             (doc_id * 31 + i * 17) % 4096 - 2048 AS v
      FROM adims, unnest(range(0, n)) AS u(i)),
    agg AS (
      SELECT doc_id, rate, n,
             max(abs(v)) AS peak,
             sum(v * v) // n AS msq
      FROM sm GROUP BY doc_id, rate, n),
    sq AS (SELECT *, CAST(floor(sqrt(CAST(msq AS DOUBLE))) AS BIGINT) AS s FROM agg)
    SELECT doc_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
           CAST(peak AS BIGINT) AS peak,
           CAST(CASE WHEN (s + 1) * (s + 1) <= msq THEN s + 1
                     WHEN s * s > msq THEN s - 1
                     ELSE s END AS BIGINT) AS rms
    FROM sq
    """,
)
def mm_audio_stats(spark, sf_dir):
    """End-to-end audio column: closed-form samples -> real PCM16 WAV
    encode -> real chunk-walking WAV decode -> exact integer signal
    stats; the oracle computes the same stats straight from the sample
    formula, so any header/chunk/byte-order bug in either codec half
    diverges (operators/multimodal.py synth_wav/audio_stats)."""
    return multimodal.audio_stats(multimodal.synth_wav(_docs(spark, sf_dir)))


@query(
    "mm_video_keyframes",
    oracle=f"""
    WITH vdims AS (
      SELECT doc_id,
             {multimodal.VIDEO_FRAMES_BASE} + doc_id % {multimodal.VIDEO_FRAMES_MOD}
               AS n_frames
      FROM documents WHERE doc_id % 3 = 2),
    kf AS (
      SELECT doc_id, f
      FROM vdims, unnest(range(0, n_frames)) AS u(f)
      WHERE f % {multimodal.KEYFRAME_STRIDE} = 0),
    px AS (
      SELECT doc_id, f, i,
             (doc_id*31 + f*11
              + (i // ({multimodal.VIDEO_W}*3))*7
              + ((i % ({multimodal.VIDEO_W}*3)) // 3)*3
              + (i % 3)) % 256 AS v
      FROM kf, unnest(range(0, {multimodal.VIDEO_H}*{multimodal.VIDEO_W}*3)) AS u(i))
    SELECT doc_id, CAST(f AS BIGINT) AS frame_index,
           CAST({multimodal.VIDEO_H} AS BIGINT) AS height,
           CAST({multimodal.VIDEO_W} AS BIGINT) AS width,
           CAST(sum(v) AS BIGINT) AS pixel_sum,
           CAST(sum((i+1)*v) AS BIGINT) AS pixel_wsum
    FROM px GROUP BY doc_id, f
    """,
)
def mm_video_keyframes(spark, sf_dir):
    """End-to-end video column: closed-form frames -> real BMP-sequence
    container -> header-walk demux -> real decode of every 2nd frame ->
    exact checksums; the oracle reproduces keyframe checksums straight
    from the pixel formula, so container-offset or frame-order bugs
    diverge (operators/multimodal.py synth_video/video_keyframes)."""
    return multimodal.video_keyframes(multimodal.synth_video(_docs(spark, sf_dir)))
