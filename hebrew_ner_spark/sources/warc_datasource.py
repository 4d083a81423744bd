"""Custom Python DataSource for WARC segment files (Spark 4
``pyspark.sql.datasource`` connector API).

``sources/warc.py`` parses segments that already arrived as DataFrame
blob rows; this is the other ingestion surface — the one a crawl
archive on disk/object storage actually needs:

    spark.dataSource.register(WarcSegDataSource)
    spark.read.format("warcseg").option("path", dir).load()

Partition planning is the point of a connector: ``partitions()`` emits
ONE InputPartition PER SEGMENT FILE, so Spark schedules the framing
walk where it schedules any scan — a 10^12-page crawl's ~10^8 segment
files become ~10^8 independently retryable tasks with locality hints
left to the cluster manager, and a lost executor re-reads only its
files. The record walk inside each task is the SAME
``walk_warc_bytes`` kernel the mapInPandas path uses (one framing
implementation, gate-verified through the blob path), so the connector
adds scheduling, not new parse semantics.

File naming contract: ``segment_<id>.warc`` — the id is part of the
layout (CC segment names carry their identity), parsed from the name,
never inferred from listing order.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from hebrew_ner_spark.sources.warc import walk_warc_bytes

_SEG_RE = re.compile(r"segment_(\d+)\.warc$")


class WarcSegPartition(InputPartition):
    def __init__(self, path: str, seg_id: int):
        self.path = path
        self.seg_id = seg_id


class _WarcSegReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warcseg requires .option('path', <dir>)")

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self.dir)):
            m = _SEG_RE.search(name)
            if m:
                parts.append(
                    WarcSegPartition(os.path.join(self.dir, name), int(m.group(1)))
                )
        if not parts:
            raise ValueError(f"no segment_<id>.warc files under {self.dir}")
        return parts

    def read(self, partition: WarcSegPartition):
        with open(partition.path, "rb") as f:
            buf = f.read()
        yield from walk_warc_bytes(partition.seg_id, buf)


class WarcSegDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warcseg"

    def schema(self) -> str:
        return "segment_id long, url string, warc_date string, text string"

    def reader(self, schema) -> DataSourceReader:
        return _WarcSegReader(self.options)
