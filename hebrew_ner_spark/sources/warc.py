"""WARC-style segment source: length-framed record parsing.

Common Crawl ships as WARC segment files — concatenated records, each a
header block (``WARC/1.0`` + headers) and a ``Content-Length``-framed
payload. The framing matters: payloads are arbitrary bytes (they can
contain ``WARC/1.0`` verbatim), so a correct reader walks the declared
lengths instead of splitting on delimiters, and lengths count OCTETS —
multi-byte text makes char-counting silently wrong (the round-trip gate
would catch exactly that).

Layout mirrors the real ingestion shape: ONE ROW PER SEGMENT FILE
(segment_id, data binary), parsed into page rows by a 1->N
``mapInPandas`` kernel — record walking is inherently sequential per
segment, the one place Python belongs (the multimodal frame-sample
precedent); parallelism comes from segments, exactly as a 10^12-page
crawl parallelizes over its ~10^8 segment files. Memory bound: each
segment blob crosses Arrow whole, so executor memory must hold
(arrow batch rows) x (segment size) — for CC's ~1 GB segments set
``spark.sql.execution.arrow.maxRecordsPerBatch=1`` (one segment per
batch) or pre-chunk segments at record boundaries during landing. Synthesis is the
inverse, built JVM-side: per-page record strings (codegen concat with
``octet_length`` framing) grouped into segments with an order-pinned
``array_join(array_sort(collect_list(struct)))``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGES_PER_SEGMENT = 50

_PARSED_SCHEMA = "segment_id long, url string, warc_date string, text string"


def synth_warc_segments(docs: DataFrame, per_segment: int = PAGES_PER_SEGMENT) -> DataFrame:
    """(segment_id, data binary): deterministic WARC-style segment files
    over the document corpus (url/date closed-form per doc_id, payload =
    the document text, Content-Length in OCTETS)."""
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.concat(
            F.lit("https://example.org/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ),
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:"),
        F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
        F.lit("Z\r\nContent-Length: "),
        F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
        F.lit("\r\n\r\n"),
    )
    recs = docs.select(
        (F.col("doc_id") % per_segment).alias("_slot"),
        F.expr(f"doc_id DIV {per_segment}").alias("segment_id"),
        rec.alias("_rec"),
    )
    return recs.groupBy("segment_id").agg(
        F.encode(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(_slot, _rec))), x -> x._rec)"),
                "",
            ),
            "UTF-8",
        ).alias("data")
    )


def walk_warc_bytes(seg_id: int, buf: bytes) -> list[tuple[int, str, str, str]]:
    """The length-framed record walk over one segment's raw bytes (never
    a delimiter split); raises on a malformed header rather than
    resynchronizing silently — a corrupt segment must surface, not
    truncate. Shared by the mapInPandas parser AND the custom Python
    DataSource (sources/warc_datasource.py): one framing kernel, two
    ingestion surfaces."""
    out: list[tuple[int, str, str, str]] = []
    pos = 0
    while pos < len(buf):
        hdr_end = buf.index(b"\r\n\r\n", pos)
        header = buf[pos:hdr_end].decode("utf-8")
        fields = dict(
            line.split(": ", 1)
            for line in header.split("\r\n")[1:]  # skip WARC/1.0
        )
        n = int(fields["Content-Length"])
        body_start = hdr_end + 4
        if body_start + n > len(buf):
            raise ValueError(
                f"truncated WARC segment {seg_id}: record at byte "
                f"{pos} declares {n} payload bytes, "
                f"{len(buf) - body_start} remain"
            )
        payload = buf[body_start : body_start + n].decode("utf-8")
        out.append(
            (int(seg_id), fields["WARC-Target-URI"], fields["WARC-Date"], payload)
        )
        pos = body_start + n + 4  # record separator \r\n\r\n
    return out


def parse_warc_segments(segments: DataFrame) -> DataFrame:
    """(segment_id, url, warc_date, text): every record of every segment,
    via the shared framing kernel over segment-blob rows."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, str, str, str]] = []
            for seg_id, blob in zip(pdf["segment_id"], pdf["data"]):
                out.extend(walk_warc_bytes(int(seg_id), bytes(blob)))
            yield pd.DataFrame(
                out, columns=["segment_id", "url", "warc_date", "text"]
            )

    return segments.mapInPandas(walk, _PARSED_SCHEMA)
