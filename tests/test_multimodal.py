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


def test_decode_image_is_a_documented_stub(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(media)
