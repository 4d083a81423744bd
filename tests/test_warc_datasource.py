"""Custom warcseg Python DataSource: file-grain partitions, parity with
the blob-path parser, truncation surfacing, option validation."""

import os

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.sources import warc
from hebrew_ner_spark.sources.warc_datasource import WarcSegDataSource

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def seg_dir(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    segs = warc.synth_warc_segments(docs).collect()
    d = tmp_path / "segments"
    d.mkdir()
    for r in segs:
        (d / f"segment_{r.segment_id}.warc").write_bytes(bytes(r.data))
    spark.dataSource.register(WarcSegDataSource)
    return str(d), len(segs), docs


def test_datasource_matches_blob_parser(spark, seg_dir):
    d, n_files, docs = seg_dir
    got = spark.read.format("warcseg").option("path", d).load()
    want = warc.parse_warc_segments(warc.synth_warc_segments(docs))
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b and a  # same rows through both ingestion surfaces


def test_one_partition_per_segment_file(spark, seg_dir):
    d, n_files, _ = seg_dir
    got = spark.read.format("warcseg").option("path", d).load()
    n_parts = got.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == n_files
    # and segment ids come from file NAMES, not listing order
    ids = {r.segment_id for r in got.select("segment_id").distinct().collect()}
    assert ids == set(range(n_files))


def test_truncated_segment_raises(spark, seg_dir):
    d, n_files, _ = seg_dir
    # chop the tail off one segment: the declared Content-Length must
    # surface as an error, not a silent short read
    victim = os.path.join(d, "segment_0.warc")
    data = open(victim, "rb").read()
    open(victim, "wb").write(data[: len(data) - 10])
    with pytest.raises(Exception, match="truncated WARC segment"):
        spark.read.format("warcseg").option("path", d).load().count()


def test_missing_path_option_fails_loudly(spark, seg_dir):
    with pytest.raises(Exception, match="path"):
        spark.read.format("warcseg").load().count()
