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
* ``decode_image``    — the stub: raises NotImplementedError with the
                        integration contract documented, so a real codec
                        drops in without touching any plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_LEN = 16
STRIDE = 64


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


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — image decoding needs a codec library absent from this
    container.

    Integration contract for the real implementation:
      input  : (doc_id, payload binary) Arrow batches via mapInPandas
      output : "doc_id long, height long, width long, channels long,
                pixels_sha256 string"
      kernel : executor-local lazy import of the codec (PIL/libvips),
               decode per payload, never per-row Python UDFs.
    """
    raise NotImplementedError(
        "image decode requires a codec library (PIL/libvips) not present "
        "in this environment; see docstring for the drop-in contract"
    )
